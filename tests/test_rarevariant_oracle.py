"""Rare-variant caller vs the reference danbing.call.py run as an oracle.

The reference script (script/danbing.call.py) is runnable in this
environment (numpy/pandas/sklearn present), so unlike most analysis
components P10 gets a true executed-reference golden: both sides load
the same synthetic inputs and the same trained sklearn SVMs, and the
final call sets must match exactly.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from danbing_tk_tpu.analysis import bubblecalling as bc
from danbing_tk_tpu.analysis import rarevariant as rv
from danbing_tk_tpu.ops import kmers_np as K

REF_SCRIPT = "/root/reference/script/danbing.call.py"


def _kmers(seq, k, canonical):
    return [int(x) for x in
            K.seq_to_kmers(K.encode_bases(seq), k, canonical=canonical)
            if x != K.NAN64]


def _locus(rng, n=140, nvar=1, cov=30, varcov=20):
    """Random TR sequence + nvar substitution variants; returns
    (trks bidirectional, novel (k+1)-mer edge counts)."""
    S = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    trks = set(_kmers(S, 21, False)) | {
        int(bc.rc(km, 21)) for km in _kmers(S, 21, False)}
    tre = set(_kmers(S, 22, True))
    novel = {}
    for _ in range(nvar):
        p = int(rng.integers(30, n - 30))
        alt = "ACGT"[("ACGT".index(S[p]) + 1) % 4]
        S2 = S[:p] + alt + S[p + 1:]
        for e in _kmers(S2, 22, True):
            if e not in tre:
                novel[e] = varcov + int(rng.integers(-2, 3))
    return S, trks, novel


@pytest.mark.skipif(not os.path.exists(REF_SCRIPT),
                    reason="reference checkout absent")
def test_rarevariant_vs_reference_script(tmp_path):
    rng = np.random.default_rng(11)
    NLOCI = 5
    loci = []
    for li in range(NLOCI):
        # locus 2: no variant (novel edges empty); locus 3: weak coverage
        # (heuristic-filter fodder); locus 4: two variants
        nvar = 0 if li == 2 else (2 if li == 4 else 1)
        varcov = 4 if li == 3 else 20
        loci.append(_locus(rng, nvar=nvar, varcov=varcov))
    # locus 1 gets low-coverage noise edges on top of its variant
    noise = {}
    for e in list(loci[1][2])[:2]:
        noise[(e + 12345) | 1] = 2
    loci[1][2].update(noise)

    # reference-format inputs
    idx_fn = tmp_path / "pan.tr.kmers"
    with open(idx_fn, "w") as f0, open(tmp_path / "gt.tr.kmers", "w") as f1:
        for li, (S, trks, _) in enumerate(loci):
            f0.write(f">{li}\n")
            for km in sorted({int(bc.k2ck(k)) for k in trks}):
                f0.write(f"{km}\n")
                f1.write(f"{30 + (li % 3)}\n")
    with open(tmp_path / "gt.bub", "w") as f:
        for li, (_, _, novel) in enumerate(loci):
            f.write(f">{li}\n")
            for e, c in novel.items():
                f.write(f"{e}\t{c}\n")

    qcfilter = np.ones(NLOCI, dtype=int)
    locus_trks = {li: loci[li][1] for li in range(NLOCI)}
    locus_ntrks = {li: set() for li in range(NLOCI)}
    with open(tmp_path / "meta.pickle", "wb") as f:
        pickle.dump((qcfilter, locus_trks, locus_ntrks), f)

    # real sklearn SVMs trained on synthetic data (the reference ships
    # opaque release-asset pickles); both sides load the same files
    from sklearn import svm

    r2 = np.random.default_rng(7)
    # linear boundaries on one feature, placed inside the real rows'
    # spread (c_nv_e 19-22, mcov ~20) so the models accept SOME rows
    # and reject others — a non-trivial prediction to reproduce
    Xbr = r2.uniform(0, 40, (300, 12))
    br_clf = svm.LinearSVC().fit(Xbr, Xbr[:, 1] > 20.5)
    Xbp = r2.uniform(0, 40, (300, 8))
    bp_clf = svm.LinearSVC().fit(Xbp, Xbp[:, 1] > 15)
    with open(tmp_path / "br.svm", "wb") as f:
        pickle.dump(br_clf, f)
    with open(tmp_path / "bp.svm", "wb") as f:
        pickle.dump(bp_clf, f)

    th, th1, th2, th3, lim = 10, 5, 2, 8, 10000
    out_ref = tmp_path / "refout"
    out_ref.mkdir()
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(REF_SCRIPT))
    r = subprocess.run(
        [sys.executable, REF_SCRIPT, str(tmp_path / "meta.pickle"),
         str(tmp_path), "gt", str(idx_fn), str(out_ref),
         str(tmp_path / "br.svm"), str(tmp_path / "bp.svm"),
         str(NLOCI), str(NLOCI), "2", str(th), str(th1), str(th2),
         str(th3), str(lim)],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr + r.stdout
    with open(out_ref / "gt.rarevar.pickle", "rb") as f:
        want = pickle.load(f)

    got = rv.call_rare_variants(
        qcfilter, locus_trks, locus_ntrks,
        str(tmp_path / "gt.tr.kmers"), str(idx_fn),
        str(tmp_path / "gt.bub"), str(tmp_path / "br.svm"),
        str(tmp_path / "bp.svm"), NLOCI,
        th=th, th1=th1, th2=th2, th3=th3, graph_size_limit=lim)

    assert set(got) == set(want), (sorted(got), sorted(want))
    assert want, "oracle produced an empty callset — test has no teeth"
    for tri in want:
        # the callset (the union edge set, what the reference reports as
        # "Final callset") must match exactly
        assert got[tri][0] == {int(e) for e in want[tri][0]}
        # the per-bubble grouping in [1] is a first-come artifact of the
        # shared alive/dead DFS memoization (which root edge visits an
        # edge first depends on dict insertion order), so only its union
        # is semantically stable — assert that
        got_u = set().union(*got[tri][1])
        want_u = {int(e) for s in want[tri][1] for e in s}
        assert got_u == want_u
