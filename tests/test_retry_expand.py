"""Two-phase expansion (small-E primary step + big-E device retry of
overflowing pairs) must produce identical counts to a single big-E run,
with the overflow pairs resolved on device rather than the host referee."""

import os

import numpy as np

from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG


def test_retry_expand_counts_identical(golden_dir):
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      okam=False)
    reads = os.path.join(golden_dir, "reads.fa")

    ref = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                            batch_pairs=512, max_read_len=192)
    ref.run_file_native(reads)

    # E=48 overflows nearly every pair (a 150bp pair probes ~260 kmers),
    # so the retry path and its re-batching buffer get real traffic
    two = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                            batch_pairs=512, max_read_len=192,
                            expand_cap=48, retry_expand=512)
    two.run_file_native(reads)

    assert two.n_retried > 0
    # retried pairs resolve on device: host referee count must match the
    # big-E run's (same tie/test2 pairs), not inflate with overflow
    assert two.n_referee == ref.n_referee, (two.n_referee, ref.n_referee)
    np.testing.assert_array_equal(two.flat_counts(), ref.flat_counts())
    nm = np.asarray(two.state["nmapread"])[:-1] + two.host.nmapread
    nm_ref = np.asarray(ref.state["nmapread"])[:-1] + ref.host.nmapread
    np.testing.assert_array_equal(nm, nm_ref)


def test_retry_ladder_counts_identical(golden_dir):
    """Multi-tier ladder (E=48 -> 96 -> 512): overflow pairs climb tiers
    on device; counts byte-equal to a single big-E run and no overflow
    reaches the host referee."""
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      okam=False)
    reads = os.path.join(golden_dir, "reads.fa")

    ref = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                            batch_pairs=512, max_read_len=192)
    ref.run_file_native(reads)

    lad = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                            batch_pairs=512, max_read_len=192,
                            expand_cap=48, retry_expand=[96, 512])
    lad.run_file_native(reads, prefilter=True)
    assert lad.n_retried > 0
    assert lad.retry_steps[1] is not None, "tier 2 never exercised"
    assert lad.n_referee == ref.n_referee
    np.testing.assert_array_equal(lad.flat_counts(), ref.flat_counts())


def test_retry_ladder_checkpoint_resume(golden_dir, tmp_path, monkeypatch):
    """Interrupt a laddered prefilter run with pairs pending in BOTH
    retry tiers; resume must finish with identical counts."""
    import pytest

    monkeypatch.setenv("DTK_PREFILTER_WINDOW", "1")
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      okam=False)
    reads = os.path.join(golden_dir, "reads.fa")
    ck = str(tmp_path / "ladder.ckpt")

    full = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                             batch_pairs=64, max_read_len=192,
                             expand_cap=48, retry_expand=[96, 512])
    full.run_file_native(reads, prefilter=True)
    want = full.flat_counts()

    class Stop(Exception):
        pass

    r1 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=64, max_read_len=192,
                           expand_cap=48, retry_expand=[96, 512])
    orig = r1._build_prefilter

    def wrap(Pp):
        inner = orig(Pp)
        n = {"c": 0}

        def bomb(codes, rlen, live):
            if n["c"] >= 3:
                raise Stop()
            n["c"] += 1
            return inner(codes, rlen, live)

        return bomb

    r1._build_prefilter = wrap
    with pytest.raises(Stop):
        r1.run_file_native(reads, checkpoint=ck, checkpoint_every=64,
                           prefilter=True)
    assert os.path.exists(ck)

    r2 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=64, max_read_len=192,
                           expand_cap=48, retry_expand=[96, 512])
    r2.run_file_native(reads, checkpoint=ck, checkpoint_every=64,
                       prefilter=True)
    np.testing.assert_array_equal(r2.flat_counts(), want)
