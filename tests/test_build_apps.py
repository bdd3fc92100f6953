"""genPanKmers / baitBuilder / ktools serialize-bt: byte-exact vs golden;
bait-enabled host align vs reference outputs."""

import os

import pytest

from danbing_tk_tpu.apps.baitbuilder import build_profiles, enrichment_filter
from danbing_tk_tpu.apps.genpankmers import gen_pan_kmers
from danbing_tk_tpu.apps.ktools import ksi, kms_sum, serialize_bt
from danbing_tk_tpu.engine.host_align import AlignConfig, HostAligner, RPGG

NLOCI, KSIZE = 24, 21


def _gold(golden_dir, name):
    return open(os.path.join(golden_dir, name), "rb").read()


def test_genpankmers_byte_exact(golden_dir, tmp_path):
    gen_pan_kmers(str(tmp_path / "pan2"),
                  [os.path.join(golden_dir, "g0"),
                   os.path.join(golden_dir, "g1")])
    for fn in ["pan2.tr.kmers", "pan2.fl.kmers", "pan2.graph.kmers"]:
        assert (tmp_path / fn).read_bytes() == _gold(golden_dir, fn), fn
    # tre: reference merge is bit-rotted on count-less inputs (see
    # genpankmers.py DEVIATION note); check the intended set-union instead
    from danbing_tk_tpu.io.text import read_kmer_sets

    ours = read_kmer_sets(str(tmp_path / "pan2.tre.kmers"))
    g0 = read_kmer_sets(os.path.join(golden_dir, "g0.tre.kmers"))
    g1 = read_kmer_sets(os.path.join(golden_dir, "g1.tre.kmers"))
    assert all(o == a | b for o, a, b in zip(ours, g0, g1))


def test_baitbuilder_profiles_byte_exact(golden_dir, tmp_path):
    build_profiles(os.path.join(golden_dir, "out.sim.kam"), NLOCI, KSIZE,
                   str(tmp_path / "bait"))
    assert (tmp_path / "bait.TP_pf.txt").read_bytes() == _gold(
        golden_dir, "bait.TP_pf.txt")
    assert (tmp_path / "bait.FP_pf.txt").read_bytes() == _gold(
        golden_dir, "bait.FP_pf.txt")


def test_baitbuilder_v2_byte_exact(golden_dir, tmp_path):
    enrichment_filter(NLOCI, KSIZE, str(tmp_path / "FPSkmer.tsv"),
                      os.path.join(golden_dir, "bait.FP_pf.txt"),
                      [os.path.join(golden_dir, "bait.TP_pf.txt")])
    assert (tmp_path / "FPSkmer.tsv").read_bytes() == _gold(
        golden_dir, "bait.FPSkmer.tsv")


def test_serialize_bt_byte_exact(golden_dir, tmp_path):
    serialize_bt(os.path.join(golden_dir, "bait.FPSkmer.tsv"), NLOCI,
                 str(tmp_path / "pan"))
    assert (tmp_path / "pan.bt.kmdb").read_bytes() == _gold(
        golden_dir, "pan.bt.kmdb")


def test_host_align_bait_bit_exact(golden_dir, tmp_path):
    rpgg = RPGG(os.path.join(golden_dir, "pan"), bait=True)
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2,
                      bait=True)
    al = HostAligner(rpgg, cfg)
    al.run_file(os.path.join(golden_dir, "reads.sim.fa"))
    al.write_kam(tmp_path / "out.bait.kam")
    al.write_trkmc_ar(tmp_path / "out.bait.trkmc.ar")
    al.write_summary(tmp_path / "out.bait.tr.summary.txt")
    assert (tmp_path / "out.bait.trkmc.ar").read_bytes() == _gold(
        golden_dir, "out.bait.trkmc.ar")
    assert (tmp_path / "out.bait.tr.summary.txt").read_bytes() == _gold(
        golden_dir, "out.bait.tr.summary.txt")
    assert (tmp_path / "out.bait.kam").read_bytes() == _gold(
        golden_dir, "out.bait.kam")


def test_ksi_sum(golden_dir, tmp_path):
    ks = ksi(os.path.join(golden_dir, "pan.tr.kmers"))
    assert len(ks) == NLOCI
    # readable align output: counts only, in map order -> sums per locus
    # equal the trkmc.ar per-locus sums
    import numpy as np

    from danbing_tk_tpu.io.binary import read_karray

    flat = read_karray(os.path.join(golden_dir, "out.trkmc.ar"))
    bounds = [0] + ks
    with open(tmp_path / "counts.txt", "w") as f:
        for v in flat:
            f.write(f"{v}\n")
    sums = kms_sum(ks, str(tmp_path / "counts.txt"))
    expect = [int(flat[bounds[i]:bounds[i + 1]].sum())
              for i in range(NLOCI)]
    assert sums == expect
