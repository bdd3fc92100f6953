"""RefGraph pipeline (reference-genome RPGG build) end-to-end."""

import os

import pytest

from danbing_tk_tpu.pipeline.ref_graph import build_ref_rpgg

GOLD = os.path.join(os.path.dirname(__file__), "golden_mbe")


def test_build_ref_rpgg(tmp_path):
    # use the MBE golden's g0 hap-0 assembly as the "reference genome";
    # its tmp1 bed rows are TR coordinates in that fasta
    ref_fa = os.path.join(GOLD, "input", "g0.0.fa")
    refTR = tmp_path / "refTR.bed"
    with open(os.path.join(GOLD, "g0", "tmp1.0.bed")) as f:
        rows = [line.split("\t")[:3] for line in f.read().splitlines()
                if not line.startswith(".")]
    refTR.write_text("".join("\t".join(r) + "\n" for r in rows))

    pref = build_ref_rpgg(str(tmp_path / "wd"), ref_fa, str(refTR),
                          g="ref", ksize=21, FS=50, TRWINDOW=500,
                          dist_merge=50)
    for suf in (".tr.kmers", ".fl.kmers", ".graph.kmers", ".kmers.dbi",
                ".fl.kdb"):
        assert os.path.exists(pref + suf), suf

    # locus spaces line up: kmer files live in v0 space
    from danbing_tk_tpu.io.text import count_loci

    nloci_v0 = len(rows)
    assert count_loci(pref + ".tr.kmers") == nloci_v0
    m02 = [line.strip() for line in
           open(os.path.join(tmp_path / "wd", "locusMap.v0.to.v2.txt"))]
    assert len(m02) == nloci_v0
    present = [i for i, x in enumerate(m02) if x != "."]
    assert present, "every locus dropped?"

    # the built graph is consumable by the align engine
    from danbing_tk_tpu.engine.host_align import RPGG

    rpgg = RPGG(pref)
    assert rpgg.nloci == nloci_v0
    assert len(rpgg.dbi) > 0
    rpgg.load_graphs()
    for i in present:
        assert rpgg.graphs[i], f"empty graph at present locus {i}"
    for i, x in enumerate(m02):
        if x == ".":
            assert not rpgg.tr_counts[i]

    # idempotent resume: second call is all-cached, same outputs
    mtime = os.path.getmtime(pref + ".tr.kmers")
    pref2 = build_ref_rpgg(str(tmp_path / "wd"), ref_fa, str(refTR),
                           g="ref", ksize=21, FS=50, TRWINDOW=500,
                           dist_merge=50)
    assert pref2 == pref
    assert os.path.getmtime(pref + ".tr.kmers") == mtime
