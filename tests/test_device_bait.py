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
