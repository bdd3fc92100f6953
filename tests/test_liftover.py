"""Native LiftTR (pipeline/liftover.py): PAF cigar-walk liftover +
liftbed.clean + singleton-merge + refTR join, against hand-computed
coordinates (spec tests; paftools.js is not present in this image)."""

import os

from danbing_tk_tpu.pipeline.liftover import (cigar_blocks, lift_tr,
                                              paf_liftover)


def _paf_line(qname, qlen, qs, qe, strand, tname, tlen, ts, te, cg,
              mapq=60, div=0.001):
    blen = max(qe - qs, te - ts)
    return "\t".join(map(str, [
        qname, qlen, qs, qe, strand, tname, tlen, ts, te,
        blen - 5, blen, mapq, f"de:f:{div}", f"cg:Z:{cg}"]))


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_cigar_blocks_minus_strand():
    rec = dict(qs=0, qe=500, strand="-", ts=0, te=500, cg="500M")
    assert cigar_blocks(rec) == [(0, 500, 0)]


def test_paf_liftover_indels_and_strand(tmp_path):
    paf = str(tmp_path / "a.paf")
    _write(paf, [
        # ctg0 = chr1 minus ref[300:310] (10I: query-only) plus 5bp
        # insertion at ref 600 (5D: target-only)
        _paf_line("chr1", 1000, 0, 1000, "+", "ctg0", 995, 0, 995,
                  "300M10I290M5D400M"),
        # ctg1 = revcomp(chr2[0:500])
        _paf_line("chr2", 500, 0, 500, "-", "ctg1", 500, 0, 500, "500M"),
        # below the min_len gate -> ignored
        _paf_line("chr1", 1000, 0, 50, "+", "ctgX", 50, 0, 50, "50M"),
        # mapq gate -> ignored
        _paf_line("chr2", 500, 0, 500, "+", "ctgY", 500, 0, 500, "500M",
                  mapq=0),
    ])
    bed = [("chr1", 100, 200), ("chr1", 295, 320), ("chr1", 550, 650),
           ("chr2", 100, 150)]
    rows = paf_liftover(paf, bed, min_len=100)
    got = {r[3]: (r[0], r[1], r[2], r[5]) for r in rows}
    assert got["chr1_100_200"] == ("ctg0", 100, 200, "+")
    # [295,300) maps directly; [300,310) is deleted in ctg0 (clamped);
    # [310,320) lands after the deletion at t=300
    assert got["chr1_295_320"] == ("ctg0", 295, 310, "+")
    # deletion shifts -10, insertion +5 across the region
    assert got["chr1_550_650"] == ("ctg0", 540, 645, "+")
    # minus strand: t = 500 - q reversed
    assert got["chr2_100_150"] == ("ctg1", 350, 400, "-")
    assert len(rows) == 4


def test_lift_tr_split_and_missing(tmp_path):
    # hap0: chr3 region split over two PAF records on one contig ->
    # stitched by liftbed.clean; hap1: no alignment for chr3 -> '.'-row
    paf0 = str(tmp_path / "h0.paf")
    _write(paf0, [
        _paf_line("chr3", 400, 0, 200, "+", "ctg2", 400, 0, 200, "200M"),
        _paf_line("chr3", 400, 200, 400, "+", "ctg2", 400, 200, 400,
                  "200M"),
    ])
    paf1 = str(tmp_path / "h1.paf")
    _write(paf1, [
        _paf_line("chr4", 100, 0, 100, "+", "ctg3", 100, 0, 100, "100M"),
    ])
    bed = str(tmp_path / "ref.bed")
    _write(bed, ["chr3\t100\t300", "chr9\t0\t50"])
    out = str(tmp_path / "lift")
    p0, p1 = lift_tr([paf0, paf1], bed, out, min_len=100)
    rows0 = [l.split("\t") for l in open(p0).read().splitlines()]
    rows1 = [l.split("\t") for l in open(p1).read().splitlines()]
    # chr9 lifted nowhere -> dropped from both haps
    assert len(rows0) == 1 and len(rows1) == 1
    assert rows0[0] == ["ctg2", "100", "300", "chr3", "100", "300", "1"]
    assert rows1[0] == [".", ".", ".", "chr3", "100", "300", "."]
