"""ktools raava/extract/extract-bt/ksi/sum + align -qc: byte-exact."""

import os

import numpy as np

from danbing_tk_tpu.apps.ktools import (extract, extract_bt, ksi, kms_sum,
                                        raava)
from danbing_tk_tpu.engine.host_align import AlignConfig, HostAligner, RPGG

NLOCI = 24


def _gold(golden_dir, name):
    return open(os.path.join(golden_dir, name), "rb").read()


def test_raava_byte_exact(golden_dir, tmp_path):
    import shutil

    for fn in ("pan.tr.kmers", "pan.fl.kmers", "pan.reindex.tr.kmers"):
        shutil.copy(os.path.join(golden_dir, fn), tmp_path / fn)
    raava(str(tmp_path / "pan"), 21)
    for fn in ("pan.bi_tr.kdb", "pan.bi_fl.kdb", "pan.reindex.tr.kdb"):
        assert (tmp_path / fn).read_bytes() == _gold(golden_dir, fn), fn


def test_extract_byte_exact(golden_dir, tmp_path):
    extract(os.path.join(golden_dir, "pan"), 3, str(tmp_path / "e3"))
    for ft in ("tr", "ntr", "graph"):
        assert (tmp_path / f"e3.{ft}.kmers").read_bytes() == _gold(
            golden_dir, f"extract3.{ft}.kmers"), ft


def test_extract_bt_byte_exact(golden_dir, tmp_path):
    import shutil

    shutil.copy(os.path.join(golden_dir, "pan.bt.kmdb"),
                tmp_path / "pan.bt.kmdb")
    extract_bt(str(tmp_path / "pan"), os.path.join(golden_dir, "qc.txt"))
    assert (tmp_path / "pan.qc.bt.kmdb").read_bytes() == _gold(
        golden_dir, "pan.qc.bt.kmdb")


def test_ksi_sum_byte_exact(golden_dir, tmp_path):
    ks = ksi(os.path.join(golden_dir, "pan.tr.kmers"))
    gold_ksi = [int(x) for x in
                open(os.path.join(golden_dir, "pan.tr.ksi"))]
    assert ks == gold_ksi
    sums = kms_sum(ks, os.path.join(golden_dir, "counts.txt"))
    gold = [int(x) for x in
            open(os.path.join(golden_dir, "sum.golden.kms"))]
    assert sums == gold


def test_align_qc_bit_exact(golden_dir, tmp_path):
    rpgg = RPGG(os.path.join(golden_dir, "pan"),
                qc_file=os.path.join(golden_dir, "qc.txt"))
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2,
                      qc=True)
    al = HostAligner(rpgg, cfg)
    al.run_file(os.path.join(golden_dir, "reads.sim.fa"))
    al.write_kam(tmp_path / "out.kam")
    al.write_trkmc_ar(tmp_path / "out.trkmc.ar")
    assert (tmp_path / "out.trkmc.ar").read_bytes() == _gold(
        golden_dir, "out.qc.trkmc.ar")
    assert (tmp_path / "out.kam").read_bytes() == _gold(
        golden_dir, "out.qc.kam")


def test_device_align_qc_bit_exact(golden_dir, tmp_path):
    from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner

    rpgg = RPGG(os.path.join(golden_dir, "pan"),
                qc_file=os.path.join(golden_dir, "qc.txt"))
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2,
                      qc=True)
    run = DeviceAlignRunner(rpgg, cfg, batch_pairs=1024, max_read_len=192)
    run.run_file(os.path.join(golden_dir, "reads.sim.fa"))
    run.write_kam(tmp_path / "out.kam")
    run.write_trkmc_ar(tmp_path / "out.trkmc.ar")
    assert (tmp_path / "out.trkmc.ar").read_bytes() == _gold(
        golden_dir, "out.qc.trkmc.ar")
    assert (tmp_path / "out.kam").read_bytes() == _gold(
        golden_dir, "out.qc.kam")


def test_kms_sum_matrix(golden_dir, tmp_path):
    """ktools sum -f sample x locus matrix == row-per-sample of the
    single-file sums (validated once against the reference binary)."""
    import io

    from danbing_tk_tpu.apps.ktools import ksi, kms_sum, kms_sum_matrix

    ks = list(ksi(os.path.join(golden_dir, "pan.tr.kmers")))
    counts = os.path.join(golden_dir, "counts.txt")
    single = kms_sum(ks, counts)
    buf = io.StringIO()
    kms_sum_matrix(ks, [counts, counts], buf)
    row = "\t".join(str(v) for v in single)
    assert buf.getvalue() == f"{row}\n{row}\n"
