"""End-to-end bit-exactness of the host aligner vs reference golden outputs."""

import os

import pytest

from danbing_tk_tpu.engine.host_align import AlignConfig, HostAligner, RPGG


@pytest.fixture(scope="module")
def rpgg(golden_dir=None):
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    return RPGG(os.path.join(golden_dir, "pan"))


def _golden(golden_dir, name):
    return open(os.path.join(golden_dir, name), "rb").read()


def test_align_bit_exact(rpgg, golden_dir, tmp_path):
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      output_bubbles=True)
    al = HostAligner(rpgg, cfg)
    al.run_file(os.path.join(golden_dir, "reads.fa"))

    al.write_kam(tmp_path / "out.kam")
    al.write_tr_kmers(tmp_path / "out.tr.kmers")
    al.write_trkmc_ar(tmp_path / "out.trkmc.ar")
    al.write_summary(tmp_path / "out.tr.summary.txt")
    al.write_bubbles(tmp_path / "out.bub.kmdb")

    assert (tmp_path / "out.kam").read_bytes() == _golden(golden_dir,
                                                          "out.kam")
    assert (tmp_path / "out.tr.kmers").read_bytes() == _golden(
        golden_dir, "out.on.tr.kmers")
    assert (tmp_path / "out.trkmc.ar").read_bytes() == _golden(
        golden_dir, "out.trkmc.ar")
    assert (tmp_path / "out.tr.summary.txt").read_bytes() == _golden(
        golden_dir, "out.tr.summary.txt")
    assert (tmp_path / "out.bub.kmdb").read_bytes() == _golden(
        golden_dir, "out.bub.kmdb")


def test_align_simmode2_bit_exact(rpgg, golden_dir, tmp_path):
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2)
    al = HostAligner(rpgg, cfg)
    al.run_file(os.path.join(golden_dir, "reads.sim.fa"))
    al.write_kam(tmp_path / "out.sim.kam")
    assert (tmp_path / "out.sim.kam").read_bytes() == _golden(
        golden_dir, "out.sim.kam")
