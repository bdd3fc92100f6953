"""Device-mode bait filter: bit-exact vs the reference align -b golden."""

import os

import pytest

from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG


def _gold(golden_dir, name):
    return open(os.path.join(golden_dir, name), "rb").read()


def test_device_align_bait(golden_dir, tmp_path):
    rpgg = RPGG(os.path.join(golden_dir, "pan"), bait=True)
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2,
                      bait=True)
    run = DeviceAlignRunner(rpgg, cfg, batch_pairs=1024, max_read_len=192)
    run.run_file(os.path.join(golden_dir, "reads.sim.fa"))
    run.write_kam(tmp_path / "out.kam")
    run.write_trkmc_ar(tmp_path / "out.trkmc.ar")
    run.write_summary(tmp_path / "out.sum")
    assert (tmp_path / "out.trkmc.ar").read_bytes() == _gold(
        golden_dir, "out.bait.trkmc.ar")
    assert (tmp_path / "out.sum").read_bytes() == _gold(
        golden_dir, "out.bait.tr.summary.txt")
    assert (tmp_path / "out.kam").read_bytes() == _gold(
        golden_dir, "out.bait.kam")


def test_device_align_fastq_bait(golden_dir, tmp_path):
    """Device runner on fastq input with quality-masked bait (the
    reference's qString2qMask path, aQueryFasta_thread.h:1038-1078);
    byte-exact vs the reference -fq -b golden."""
    rpgg = RPGG(os.path.join(golden_dir, "pan"), bait=True)
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2,
                      bait=True, is_fastq=True)
    run = DeviceAlignRunner(rpgg, cfg, batch_pairs=1024, max_read_len=192)
    assert run.with_qual
    run.run_file(os.path.join(golden_dir, "reads.sim.fq"))
    run.write_kam(tmp_path / "out.kam")
    run.write_trkmc_ar(tmp_path / "out.trkmc.ar")
    run.write_summary(tmp_path / "out.sum")
    assert (tmp_path / "out.trkmc.ar").read_bytes() == _gold(
        golden_dir, "out.fq.trkmc.ar")
    assert (tmp_path / "out.sum").read_bytes() == _gold(
        golden_dir, "out.fq.tr.summary.txt")
    assert (tmp_path / "out.kam").read_bytes() == _gold(
        golden_dir, "out.fq.kam")


def test_qmask_batch_matches_exact_port():
    """Vectorized qmask_batch == the exact two-pointer port on random
    quality strings (incl. the reference's tail-window quirk)."""
    import numpy as np

    from danbing_tk_tpu.engine import device_align as da
    from danbing_tk_tpu.engine.host_align import qstring_to_qmask

    rng = np.random.default_rng(7)
    k, qth, L = 21, 20, 64
    R = 256
    quals = np.zeros((R, L), dtype=np.uint8)
    rlen = rng.integers(1, L + 1, size=R).astype(np.int32)
    for i in range(R):
        quals[i, : rlen[i]] = rng.integers(33, 33 + 42, size=rlen[i])
    got = da.qmask_batch(quals, rlen, qth, k)
    for i in range(R):
        qs = quals[i, : rlen[i]].tobytes().decode()
        want = qstring_to_qmask(qs, qth, k)
        nk = max(rlen[i] - k + 1, 0)
        assert got[i, :nk].tolist() == [bool(x) for x in want]
        assert not got[i, nk:].any()
