"""Rare-variant caller end-to-end on a synthetic single-locus bubble."""

import numpy as np
import pytest

from danbing_tk_tpu.analysis import bubblecalling as bc
from danbing_tk_tpu.analysis import rarevariant as rv
from danbing_tk_tpu.models.svm import constant_model, save_model
from danbing_tk_tpu.ops import kmers_np as K


def _kmers(seq, k, canonical):
    return [int(x) for x in
            K.seq_to_kmers(K.encode_bases(seq), k, canonical=canonical)
            if x != K.NAN64]


def test_call_rare_variants(tmp_path):
    rng = np.random.default_rng(3)
    S = "".join("ACGT"[i] for i in rng.integers(0, 4, 120))
    # variant: substitution at position 60
    alt = "ACGT"[("ACGT".index(S[60]) + 1) % 4]
    S2 = S[:60] + alt + S[61:]

    trks = set(_kmers(S, 21, False)) | {
        int(bc.rc(km, 21)) for km in _kmers(S, 21, False)}
    tre = set(_kmers(S, 22, True))
    novel = [e for e in _kmers(S2, 22, True) if e not in tre]
    assert novel

    # write inputs: pan.tr index + count-only tr.kmers + .bub
    ca_tr = sorted({bc.k2ck(km) for km in trks})
    with open(tmp_path / "index.kmers", "w") as f0, \
            open(tmp_path / "gt.kmers", "w") as f1:
        f0.write(">0\n")
        for km in ca_tr:
            f0.write(f"{km}\n")
            f1.write("30\n")
    with open(tmp_path / "gt.bub", "w") as f:
        f.write(">0\n")
        for e in novel:
            f.write(f"{e}\t20\n")

    save_model(constant_model(True), tmp_path / "br.svm")
    save_model(constant_model(True), tmp_path / "bp.svm")

    tri2vbes = rv.call_rare_variants(
        qcfilter=np.ones(1, dtype=int),
        locus_trks={0: trks},
        locus_ntrks={0: set()},
        tr_kmers_fn=str(tmp_path / "gt.kmers"),
        tr_index_fn=str(tmp_path / "index.kmers"),
        bub_fn=str(tmp_path / "gt.bub"),
        br_svm_fn=str(tmp_path / "br.svm"),
        bp_svm_fn=str(tmp_path / "bp.svm"),
        nloci=1, th=10, th1=5, th2=2, th3=8)
    assert 0 in tri2vbes
    called = tri2vbes[0][0]
    # every novel edge (or its RC) should be in the callset
    ncov = sum(1 for e in novel
               if e in called or bc.rc(e, 22) in called)
    assert ncov >= len(novel) - 2, (ncov, len(novel))


def test_entropy():
    assert rv.seq_entropy("AAAA", 1) == 0
    assert abs(rv.seq_entropy("ACGTACGTACGTACGTACGTAC", 1) - 2.0) < 0.01
