"""Rare-variant (novel bubble) caller: danbing.call.py equivalent
(reference script/danbing.call.py).

Two-stage filtering of novel (k+1)-mer bubbles from align's .bub output:
  1. snarl finding from TR-anchored roots (analysis/bubblecalling) +
     bubble-root SVM on coverage/entropy features
  2. heuristic per-locus coverage filter + bubble-path SVM on path
     features (size, cov stats, gap counts, bidirectionality)

SVM models are sklearn classifiers (pickles, as in the reference);
models/svm.py provides training helpers since the reference ships only
pretrained release assets.
"""

from __future__ import annotations

import pickle

import numpy as np

from ..ops.kmers_np import decode_kmer
from . import bubblecalling as bc


def load_tr_kmc(kmers_fn: str, index_fn: str, ntr_autosome: int | None =
                None, sex: int = 2):
    """canonical TR kmer -> count per locus, counts from the count-only
    align output, kmer names from the index file."""
    tr2trk2c = {}
    with open(index_fn) as f0, open(kmers_fn) as f1:
        tri = -1
        for line in f0:
            if line[0] == ">":
                tri += 1
                if ntr_autosome is not None and sex == 1 and \
                        tri >= ntr_autosome:
                    break
                tr2trk2c[tri] = {}
            else:
                km = int(line.split()[0])
                tr2trk2c[tri][km] = int(f1.readline())
    return tr2trk2c


def load_bubbles(fn: str, ntr_autosome: int | None = None, sex: int = 2):
    """locus -> {canonical (k+1)-mer: count} from the .bub text output."""
    bub = {}
    k2c = {}
    tri = -1
    with open(fn) as f:
        for line in f:
            if line[0] == ">":
                if tri >= 0 and k2c:
                    bub[tri] = k2c
                tri += 1
                if ntr_autosome is not None and sex == 1 and \
                        tri >= ntr_autosome:
                    k2c = {}
                    break
                k2c = {}
            else:
                km, ct = (int(v) for v in line.split())
                ce = bc.e2ce(km)
                k2c[ce] = k2c.get(ce, 0) + ct
    if k2c:
        bub[tri] = k2c
    return bub


def seq_entropy(seq: str, k: int = 1) -> float:
    n = 4 ** k
    counts = np.zeros(n)
    for i in range(len(seq) - k + 1):
        v = 0
        for c in seq[i : i + k]:
            v = v * 4 + "ACGT".index(c)
        counts[v] += 1
    p = counts / len(seq)
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())


class BubbleRoots:
    def __init__(self, ntr: int):
        self.crt = []
        self.cne = []
        self.cee = []
        self.cte = []
        self.rnr = []
        self.rne = []
        self.ncb = []
        self.ntm = []
        self.nbe = []
        self.h1 = []
        self.h2 = []
        self.h3 = []
        self.es = []
        self.cts = []
        self.bi2ei = []
        self.tri2bei = np.zeros(ntr, dtype=int)

    def feature_matrix(self):
        import pandas as pd

        df = pd.DataFrame()
        df["c_root"] = self.crt
        df["c_nv_e"] = self.cne
        df["c_ex_e"] = self.cee
        df["c_tm_e"] = self.cte
        df["r_nve_r"] = self.rnr
        df["r_nve_exe"] = self.rne
        df["n_snrl"] = self.ncb
        df["n_tm_e"] = self.ntm
        df["n_bb_e"] = self.nbe
        df["h1"] = self.h1
        df["h2"] = self.h2
        df["h3"] = self.h3
        return df


def find_tr_snarls(qcfilter, tri2trks, tri2ntrks, bub_kmc, tr_kmc, ntr: int,
                   th_cne: int = 10, graph_size_limit: int = 10000):
    br = BubbleRoots(ntr)
    for tri in bub_kmc:
        if not qcfilter[tri] or len(bub_kmc[tri]) > graph_size_limit:
            br.tri2bei[tri] = len(br.cne)
            continue
        trks = tri2trks[tri]
        ntrks = tri2ntrks[tri]
        bk2c = bub_kmc[tri]
        tk2c = tr_kmc[tri]
        gf = bc.es2bigf(bk2c.keys())
        alive, dead = set(), set()
        naes = []
        for pa in gf:
            if pa not in trks:
                continue
            crt = tk2c[bc.k2ck(pa)]
            cee = crt
            cte = 0
            ncb = 0
            ntm = 0
            rt = bc.Edge(None, None, pa)
            _, edges = bc.decode_edges(gf, pa)
            for edge in edges:
                cne = bk2c[bc.e2ce(edge.e)]
                if cne < th_cne:
                    cee -= cne
                    cte += cne
                    ntm += 1
                    continue
                alive_e = bc.check_bubble_root_edge(
                    rt, edge, gf, trks, ntrks, alive, dead)
                naes.append(len(alive_e))
                e_ = edge.e
                if edge.a:
                    cee -= cne
                    seq = decode_kmer(e_, bc.ESIZE)
                    ncb += 1
                    br.crt.append(crt)
                    br.cne.append(cne)
                    br.rnr.append(cne / crt)
                    br.nbe.append(naes[-1])
                    br.h1.append(seq_entropy(seq, 1))
                    br.h2.append(seq_entropy(seq, 2))
                    br.h3.append(seq_entropy(seq, 3))
                    es = [e_] + [e for e in alive_e if e != e_]
                    br.es += es
                    br.cts += [bk2c[bc.e2ce(e)] for e in es]
                    br.bi2ei.append(len(br.es))
                else:
                    cte_ = bk2c[bc.e2ce(e_)]
                    cee -= cte_
                    cte += cte_
                    ntm += 1
            if ncb:
                for i in range(ncb):
                    br.cee.append(cee)
                    br.cte.append(cte)
                    br.rne.append(br.cne[-ncb + i] / (cee + 1))
                    br.ncb.append(ncb)
                    br.ntm.append(ntm)
        br.tri2bei[tri] = len(br.cne)
    return br


def br_svm_filter(br: BubbleRoots, model_fn: str, th: int):
    df = br.feature_matrix()
    br.cts = np.array(br.cts)
    m0 = (df["c_nv_e"] > th).to_numpy()
    if not m0.any():
        return df, np.array([], dtype=int)
    with open(model_fn, "rb") as f:
        clf = pickle.load(f)
    yh = clf.predict(df[m0])
    return df, np.nonzero(m0)[0][yh.astype(bool)]


def filter_bubble_edges(vbis, br: BubbleRoots, ntr: int, th1: int, th2: int,
                        th3: int):
    vbis_s = set(vbis.tolist())
    tri2ves = {}
    for tri in range(ntr):
        es_ar = np.array([], dtype=np.int64)
        ct_ar = np.array([], dtype=np.int64)
        tcmin, fcmax = 99999, 0
        valid = False
        bsi = br.tri2bei[tri - 1] if tri else 0
        bei = br.tri2bei[tri]
        for bi in range(bsi, bei):
            esi = br.bi2ei[bi - 1] if bi else 0
            eei = br.bi2ei[bi]
            c = br.cts[esi]
            if bi in vbis_s:
                valid = True
                tcmin = min(tcmin, c)
                es_ar = np.concatenate((es_ar, br.es[esi:eei]))
                ct_ar = np.concatenate((ct_ar, br.cts[esi:eei]))
            else:
                fcmax = max(fcmax, c)
        if not valid:
            continue
        th = max(th2, fcmax) if tcmin - fcmax > th3 else max(th2,
                                                            tcmin - th1)
        mask = ct_ar > th
        if not mask.any():
            continue
        es_ar, ct_ar = es_ar[mask], ct_ar[mask]
        e2c = {}
        for e_f, c in zip(es_ar.tolist(), ct_ar.tolist()):
            for e in (e_f, bc.rc(e_f, bc.ESIZE)):
                e2c.setdefault(e, c)
        tri2ves[tri] = (es_ar, e2c, fcmax)
    return tri2ves


def bubble_path_features(tri2ves, tri2trks, tri2ntrks):
    import pandas as pd

    def count_ngap(cs):
        n3, n4 = 0, 0
        c_ = None
        for c in cs:
            if c_ is not None:
                gp = abs(c - c_)
                if gp >= 3:
                    n3 += 1
                    if gp >= 4:
                        n4 += 1
            c_ = c
        return n3, n4

    tribes = []
    rows = []
    for tri in sorted(tri2ves):
        es_ar, e2c, fcmax = tri2ves[tri]
        trks, ntrks = tri2trks[tri], tri2ntrks[tri]
        gf = bc.es2bigf(es_ar, bi=False)
        alive, dead = set(), set()
        alive_es = set()
        bres = []
        start = len(rows)
        for pa in gf:
            if pa not in trks:
                continue
            rt = bc.Edge(None, None, pa)
            _, edges = bc.decode_edges(gf, pa)
            for edge in edges:
                alive_e = bc.check_bubble_root_edge(
                    rt, edge, gf, trks, ntrks, alive, dead)
                if alive_e:
                    cs = [e2c[e] for e in alive_e]
                    n3, n4 = count_ngap(cs)
                    rows.append([len(alive_e), np.mean(cs), np.std(cs),
                                 fcmax, np.mean(cs) - fcmax, n3, n4, None])
                    bres.append(edge.e)
                    tribes.append([tri, alive_e])
                    alive_es |= alive_e
        for i, e in enumerate(bres):
            rows[start + i][7] = bc.rc(e, bc.ESIZE) in alive_es
    bdf = pd.DataFrame(rows, columns=["bbs", "mcov", "scov", "fcmax",
                                      "cdiff", "n3gp", "n4gp", "bdir"])
    return tribes, bdf


def bp_svm_filter(tribes, bdf, model_fn: str):
    with open(model_fn, "rb") as f:
        clf = pickle.load(f)
    yh = clf.predict(bdf).astype(bool)
    tri2vbes = {}
    for keep, (tri, bes) in zip(yh, tribes):
        if not keep:
            continue
        if tri not in tri2vbes:
            tri2vbes[tri] = [set(bes), [bes]]
        else:
            tri2vbes[tri][0] |= bes
            tri2vbes[tri][1].append(bes)
    for tri in tri2vbes:
        tri2vbes[tri][0] |= {bc.rc(e, bc.ESIZE) for e in tri2vbes[tri][0]}
    return tri2vbes


def build_metadata(pref: str, qcfilter=None):
    """Builds (qcfilter, tri2trks, tri2ntrks) from an RPGG's bidirectional
    kset DBs (`ktools raava` outputs <pref>.bi_tr.kdb / .bi_fl.kdb) --
    the reference ships this as an opaque pickle."""
    from ..io import binary as bio

    def load(path):
        index, ks = bio.read_kset_db(path)
        out = {}
        p = 0
        for tri, n in enumerate(index.tolist()):
            out[tri] = set(ks[p : p + n].tolist())
            p += n
        return out

    tri2trks = load(pref + ".bi_tr.kdb")
    tri2ntrks = load(pref + ".bi_fl.kdb")
    if qcfilter is None:
        qcfilter = np.ones(len(tri2trks), dtype=int)
    return qcfilter, tri2trks, tri2ntrks


def call_rare_variants(qcfilter, tri2trks, tri2ntrks, tr_kmers_fn,
                       tr_index_fn, bub_fn, br_svm_fn, bp_svm_fn, ntr,
                       th=10, th1=5, th2=2, th3=8,
                       graph_size_limit=10000):
    """Full flow; returns tri2vbes (locus -> [edge set, per-bubble sets])."""
    tr_kmc = load_tr_kmc(tr_kmers_fn, tr_index_fn)
    bub_kmc = load_bubbles(bub_fn)
    if not bub_kmc:
        return {}
    br = find_tr_snarls(qcfilter, tri2trks, tri2ntrks, bub_kmc, tr_kmc,
                        ntr, th_cne=th, graph_size_limit=graph_size_limit)
    _, vbis = br_svm_filter(br, br_svm_fn, th)
    if vbis.size == 0:
        return {}
    tri2ves = filter_bubble_edges(vbis, br, ntr, th1, th2, th3)
    if not tri2ves:
        return {}
    tribes, bdf = bubble_path_features(tri2ves, tri2trks, tri2ntrks)
    return bp_svm_filter(tribes, bdf, bp_svm_fn)
