"""MBE byte-exactness vs the reference script's golden outputs."""

import os
import shutil

from danbing_tk_tpu.apps.mbe import run_mbe

GOLD = os.path.join(os.path.dirname(__file__), "golden_mbe")


import pytest


@pytest.mark.parametrize("nproc", [1, 2])
def test_mbe_byte_exact(tmp_path, nproc):
    for g in ("g0", "g1"):
        os.makedirs(tmp_path / g)
        for h in (0, 1):
            shutil.copy(os.path.join(GOLD, g, f"tmp1.{h}.bed"),
                        tmp_path / g / f"tmp1.{h}.bed")
    shutil.copy(os.path.join(GOLD, "pan.tr.mbe.v0.bed"),
                tmp_path / "pan.tr.mbe.v0.bed")
    run_mbe(str(tmp_path), os.path.join(GOLD, "input"), ["g0", "g1"],
            ksize=21, FS=50, TRWINDOW=500, nproc=nproc)
    for fn in ["pan.tr.mbe.v1.bed", "locusMap.v1.to.v0.txt",
               "g0/tmp2.0.mbe.bed", "g0/tmp2.1.mbe.bed",
               "g1/tmp2.0.mbe.bed", "g1/tmp2.1.mbe.bed"]:
        ours = (tmp_path / fn).read_bytes()
        gold = open(os.path.join(GOLD, fn), "rb").read()
        assert ours == gold, fn


def test_merge_mbe_byte_exact(tmp_path):
    import shutil as sh

    from danbing_tk_tpu.apps.merge_mbe import write_bed_merge_mbe
    from danbing_tk_tpu.utils.bedops import collision_scan, write_m0_loci

    sh.copy(os.path.join(GOLD, "pan.tr.mbe.v1.bed"),
            tmp_path / "pan.tr.mbe.v1.bed")
    panbed_rows = [line.split("\t") for line in
                   open(os.path.join(GOLD, "pan.tr.mbe.v1.bed"))
                   .read().splitlines()]
    groups = collision_scan(panbed_rows, 4, dist=50)
    write_m0_loci(str(tmp_path / "mbe.m0.loci"), ["g0", "g1"], groups)
    assert (tmp_path / "mbe.m0.loci").read_bytes() == open(
        os.path.join(GOLD, "mbe.m0.loci"), "rb").read()
    write_bed_merge_mbe(str(tmp_path), ng=2, thresh=0.8)
    for fn in ["pan.tr.mbe.v2.bed", "OrthoMap.v2.tsv",
               "locusMap.v2.to.v1.txt"]:
        assert (tmp_path / fn).read_bytes() == open(
            os.path.join(GOLD, fn), "rb").read(), fn
