"""okam/simmode on the native production path: .kam byte-identical to
the reference goldens (rows assembled from device outputs per pair,
titles streamed through the repack buffers)."""

import os

import numpy as np
import pytest

from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG


def _golden(golden_dir, name):
    return open(os.path.join(golden_dir, name), "rb").read()


@pytest.mark.parametrize("prefilter", [False, True])
def test_native_kam_bit_exact(golden_dir, tmp_path, prefilter):
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      output_bubbles=True)
    al = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=1024, max_read_len=192)
    al.run_file_native(os.path.join(golden_dir, "reads.fa"),
                       prefilter=prefilter)
    al.write_kam(str(tmp_path / "n.kam"))
    al.write_trkmc_ar(str(tmp_path / "n.trkmc.ar"))
    al.write_bubbles(str(tmp_path / "n.bub.kmdb"))
    assert (tmp_path / "n.kam").read_bytes() == _golden(golden_dir,
                                                        "out.kam")
    assert (tmp_path / "n.trkmc.ar").read_bytes() == _golden(
        golden_dir, "out.trkmc.ar")
    assert (tmp_path / "n.bub.kmdb").read_bytes() == _golden(
        golden_dir, "out.bub.kmdb")


def test_native_kam_simmode2(golden_dir, tmp_path):
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2)
    al = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=256, max_read_len=192)
    al.run_file_native(os.path.join(golden_dir, "reads.sim.fa"),
                       prefilter=True)
    al.write_kam(str(tmp_path / "s.kam"))
    assert (tmp_path / "s.kam").read_bytes() == _golden(golden_dir,
                                                        "out.sim.kam")


def test_native_kam_fastq_bait(golden_dir, tmp_path):
    """The QC-harness combination: fastq + bait + simmode on the native
    path (quality strings ride into the .kam rows)."""
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      simmode=2, is_fastq=True, bait=True)
    al = DeviceAlignRunner(
        RPGG(os.path.join(golden_dir, "pan"), bait=True), cfg,
        batch_pairs=256, max_read_len=192)
    al.run_file_native(os.path.join(golden_dir, "reads.sim.fq"),
                       prefilter=True)
    al.write_kam(str(tmp_path / "q.kam"))
    al.write_trkmc_ar(str(tmp_path / "q.trkmc.ar"))
    assert (tmp_path / "q.kam").read_bytes() == _golden(golden_dir,
                                                        "out.fq.kam")
    assert (tmp_path / "q.trkmc.ar").read_bytes() == _golden(
        golden_dir, "out.fq.trkmc.ar")
