"""fa2kmers equivalent: byte-exact vs reference golden pan.*.kmers."""

import os

from danbing_tk_tpu.apps.fa2kmers import fa2kmers, make_tre_kmers


def test_fa2kmers_byte_exact(golden_dir, tmp_path):
    haps = [os.path.join(golden_dir, f"hap{h}.fa") for h in range(4)]
    fa2kmers(str(tmp_path / "pan"), haps, k=21, fsi=700, fso=700)
    for fn in ["pan.tr.kmers", "pan.fl.kmers", "pan.graph.kmers"]:
        ours = (tmp_path / fn).read_bytes()
        gold = open(os.path.join(golden_dir, fn), "rb").read()
        assert ours == gold, fn


def test_fa2kmers_binary_byte_exact(golden_dir, tmp_path):
    haps = [os.path.join(golden_dir, f"hap{h}.fa") for h in range(4)]
    fa2kmers(str(tmp_path / "panbin"), haps, k=21, fsi=700, fso=700,
             binary=True)
    for fn in ["panbin.tr.kmdb", "panbin.fl.kmdb", "panbin.graph.kmdb"]:
        ours = (tmp_path / fn).read_bytes()
        gold = open(os.path.join(golden_dir, fn), "rb").read()
        assert ours == gold, fn


def test_genpankmers_reindex_byte_exact(golden_dir, tmp_path):
    from danbing_tk_tpu.apps.genpankmers import gen_pan_kmers

    gen_pan_kmers(str(tmp_path / "pan.reindex"),
                  [os.path.join(golden_dir, "pan")], tr_only=True)
    assert (tmp_path / "pan.reindex.tr.kmers").read_bytes() == open(
        os.path.join(golden_dir, "pan.reindex.tr.kmers"), "rb").read()


def test_make_tre_matches_golden(golden_dir, tmp_path):
    haps = [os.path.join(golden_dir, f"hap{h}.fa") for h in range(4)]
    make_tre_kmers(str(tmp_path / "pan"), haps, k=21, fsi=700)
    assert (tmp_path / "pan.tre.kmers").read_bytes() == open(
        os.path.join(golden_dir, "pan.tre.kmers"), "rb").read()


def test_fa2kmers_prune(golden_dir, tmp_path):
    """-p prune: TR kmers erased + fwd/RC graph node removal, byte-exact."""
    from danbing_tk_tpu.apps.fa2kmers import fa2kmers

    pref = str(tmp_path / "pan.pruned")
    fa2kmers(pref, [os.path.join(golden_dir, f"hap{i}.fa")
                    for i in range(4)], k=21, fsi=700, fso=700,
             prune_file=os.path.join(golden_dir, "prune.kmers"))
    for suf in (".tr.kmers", ".fl.kmers", ".graph.kmers"):
        assert open(pref + suf, "rb").read() == open(
            os.path.join(golden_dir, "pan.pruned" + suf), "rb").read(), suf
