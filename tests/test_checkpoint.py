"""Align checkpoint/resume: interrupted run + resume == uninterrupted."""

import os

import numpy as np
import pytest

from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG


@pytest.fixture(scope="module")
def rpgg():
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    return RPGG(os.path.join(golden_dir, "pan"))


def test_checkpoint_resume(golden_dir, tmp_path):
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, okam=False)
    reads = os.path.join(golden_dir, "reads.fa")
    ck = str(tmp_path / "state.ckpt")

    # uninterrupted reference run
    full = DeviceAlignRunner(rpgg_ := RPGG(os.path.join(golden_dir, "pan")),
                             cfg, batch_pairs=512, max_read_len=192)
    full.run_file(reads)
    want = full.flat_counts()

    # run with checkpoints every 1024 pairs, stop after ~2048
    class Stop(Exception):
        pass

    r1 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=512, max_read_len=192)
    n = {"c": 0}
    orig = r1._run_chunk

    def bomb(chunk):
        if n["c"] >= 4:
            raise Stop()
        n["c"] += 1
        orig(chunk)

    r1._run_chunk = bomb
    with pytest.raises(Stop):
        r1.run_file(reads, checkpoint=ck, checkpoint_every=1024)
    assert os.path.exists(ck)

    # resume in a fresh runner
    r2 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=512, max_read_len=192)
    r2.run_file(reads, checkpoint=ck, checkpoint_every=1024)
    np.testing.assert_array_equal(r2.flat_counts(), want)
    nm = np.asarray(r2.state["nmapread"])[:-1] + r2.host.nmapread
    nm_w = np.asarray(full.state["nmapread"])[:-1] + full.host.nmapread
    np.testing.assert_array_equal(nm, nm_w)


def test_prefilter_checkpoint_resume(golden_dir, tmp_path):
    """Prefilter path (the production WGS configuration) can checkpoint:
    the survivor repack buffer is persisted with the cursor, so an
    interrupted prefilter run resumes to identical counts."""
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, okam=False)
    reads = os.path.join(golden_dir, "reads.fa")
    ck = str(tmp_path / "pf.ckpt")

    full = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                             batch_pairs=256, max_read_len=192)
    full.run_file_native(reads, prefilter=True)
    want = full.flat_counts()

    class Stop(Exception):
        pass

    r1 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=256, max_read_len=192)
    n = {"c": 0}
    orig = r1.step

    def bomb(*a, **kw):
        if n["c"] >= 6:
            raise Stop()
        n["c"] += 1
        return orig(*a, **kw)

    r1.step = bomb
    with pytest.raises(Stop):
        r1.run_file_native(reads, prefilter=True, checkpoint=ck,
                           checkpoint_every=512)
    assert os.path.exists(ck)

    r2 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=256, max_read_len=192)
    r2.run_file_native(reads, prefilter=True, checkpoint=ck,
                       checkpoint_every=512)
    np.testing.assert_array_equal(r2.flat_counts(), want)
    nm = np.asarray(r2.state["nmapread"])[:-1] + r2.host.nmapread
    nm_w = np.asarray(full.state["nmapread"])[:-1] + full.host.nmapread
    np.testing.assert_array_equal(nm, nm_w)


def test_checkpoint_config_mismatch_refused(golden_dir, tmp_path):
    """Resuming under a different configuration than the checkpointing
    run must refuse loudly (silently dropping the saved repack/retry
    buffers would skip pairs)."""
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, okam=False)
    reads = os.path.join(golden_dir, "reads.fa")
    ck = str(tmp_path / "mm.ckpt")

    r1 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=256, max_read_len=192)
    r1.run_file_native(reads, prefilter=True, checkpoint=ck,
                       checkpoint_every=512)
    assert os.path.exists(ck)

    # same config, file already complete: resume is a no-op, no error
    r_ok = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                             batch_pairs=256, max_read_len=192)
    r_ok.run_file_native(reads, prefilter=True, checkpoint=ck,
                         checkpoint_every=512)

    # prefilter flag flipped
    r2 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=256, max_read_len=192)
    with pytest.raises(ValueError, match="prefilter"):
        r2.run_file_native(reads, prefilter=False, checkpoint=ck)

    # different batch_pairs
    r3 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=512, max_read_len=192)
    with pytest.raises(ValueError, match="batch_pairs"):
        r3.run_file_native(reads, prefilter=True, checkpoint=ck)

    # different prefilter dispatch size
    old = os.environ.get("DTK_PREFILTER_MULT")
    os.environ["DTK_PREFILTER_MULT"] = "2"
    try:
        r4 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                               batch_pairs=256, max_read_len=192)
        with pytest.raises(ValueError, match="dispatch size"):
            r4.run_file_native(reads, prefilter=True, checkpoint=ck)
    finally:
        if old is None:
            os.environ.pop("DTK_PREFILTER_MULT", None)
        else:
            os.environ["DTK_PREFILTER_MULT"] = old
