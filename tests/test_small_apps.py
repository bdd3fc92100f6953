"""sim_reads / bam2pe byte-exact vs reference; mapkmers spec test."""

import io
import os

from danbing_tk_tpu.apps.bam2pe import bam2pe
from danbing_tk_tpu.apps.mapkmers import mapkmers
from danbing_tk_tpu.apps.sim_reads import sim_reads


def test_sim_reads_byte_exact(golden_dir):
    out = io.StringIO()
    sim_reads(os.path.join(golden_dir, "hap0.fa"), out, cov=10,
              min_ctg_len=1000)
    gold = open(os.path.join(golden_dir, "sim_reads.golden.fa")).read()
    assert out.getvalue() == gold


def test_bam2pe_byte_exact(golden_dir):
    out = io.StringIO()
    with open(os.path.join(golden_dir, "reads.fa")) as f:
        bam2pe(f, out)
    gold = open(os.path.join(golden_dir, "bam2pe.golden.fa")).read()
    assert out.getvalue() == gold


def test_mapkmers(golden_dir, tmp_path):
    # map pan counts onto a "genome" that is the same locus set (identity)
    bed = tmp_path / "pan.bed"
    with open(os.path.join(golden_dir, "pan.tr.kmers")) as f:
        nloci = sum(1 for line in f if line.startswith(">"))
    bed.write_text("".join(f"c\t0\t1\t{i}\n" for i in range(nloci)))
    mapkmers(str(bed), 3, os.path.join(golden_dir, "pan.tr.kmers"),
             os.path.join(golden_dir, "pan.tr.kmers"), str(tmp_path / "o"))
    # every kmer keeps its own count -> sums match
    import numpy as np

    out = np.loadtxt(tmp_path / "o.kmers", dtype=np.uint64)
    total = 0
    with open(os.path.join(golden_dir, "pan.tr.kmers")) as f:
        for line in f:
            if not line.startswith(">"):
                total += int(line.split()[1])
    assert out.sum() == total


def test_mapkmers_byte_exact(golden_dir, tmp_path):
    # vs the reference binary on a permuting/dropping panbed
    # (tools/make_golden_mapkmers.py), incl. umap output order
    mapkmers(os.path.join(golden_dir, "mapkmers.panbed"), 3,
             os.path.join(golden_dir, "pan.tr.kmers"),
             os.path.join(golden_dir, "g0.tr.kmers"), str(tmp_path / "o"))
    gold = open(os.path.join(golden_dir, "mapkmers.golden.kmers"),
                "rb").read()
    assert (tmp_path / "o.kmers").read_bytes() == gold
