"""Snarl (bubble) traversal over novel-edge graphs (bubblecalling.py
equivalent, reference script/bubblecalling.py).

Cyclic DFS from a TR root edge through the (k+1)-mer edge graph built from
a sample's novel edges (.bub): a branch survives if it reaches an alive
branch or a TR k-mer; dies at tips, dead branches, or NTR k-mers; cycles
and reconvergences are tracked via supernode merging.

Fuzz-tested against the reference module on random graphs
(tests/test_bubblecalling.py).
"""

from __future__ import annotations

import numpy as np

from ..ops.kmers_np import revcomp_kmers

KSIZE = 21
ESIZE = 22


def rc(km: int, k: int) -> int:
    return int(revcomp_kmers(np.array([km], dtype=np.uint64), k)[0])


def e2ce(e: int) -> int:
    return min(e, rc(e, ESIZE))


def k2ck(k: int) -> int:
    return min(k, rc(k, KSIZE))


class Edge:
    __slots__ = ("e", "p", "c", "a", "ue", "de")

    def __init__(self, edge, parent, child):
        self.e = edge
        self.p = parent
        self.c = child
        self.a = False
        self.ue = None
        self.de = []


def decode_edges(gf: dict, pa: int):
    out = gf[pa]
    es = []
    mask = (1 << (2 * KSIZE)) - 1
    pa_km1 = (pa << 2) & mask
    for i in range(4):
        if out % 2:
            es.append(Edge((pa << 2) + i, pa, pa_km1 + i))
        out >>= 1
    return len(es), es


def es2bigf(es, k: int = ESIZE, bi: bool = True) -> dict:
    gf: dict[int, int] = {}
    for e in es:
        e = int(e)
        pa, nt = e >> 2, e % 4
        gf[pa] = gf.get(pa, 0) | (1 << nt)
        if bi:
            er = rc(e, k)
            par, ntr = er >> 2, er % 4
            gf[par] = gf.get(par, 0) | (1 << ntr)
    return gf


class CyclicDFS:
    def __init__(self):
        self.q = []
        self.g = set()
        self.sni2nx = []
        self.sni2n = []
        self.sni2e = []
        self.n2sni = {}

    def add(self, e0, e1s):
        for e1 in e1s:
            e0.de.append(e1)
            e1.ue = e0

    def prune(self, dead, e):
        pruned = set()
        e_ = None
        while len(e.de) < 2 and e.e is not None:
            pruned.add(e.c)
            e_ = e
            e = e.ue
        if e.e is not None:
            e.de.remove(e_)
            e_.ue = None
        dead |= pruned
        self.g -= pruned
        return e

    def remove_supernode(self, sni):
        for n in self.sni2n[sni]:
            self.n2sni.pop(n)
        self.sni2nx.pop(sni)
        self.sni2n.pop(sni)
        self.sni2e.pop(sni)

    def make_alive(self, alive, alive_e, e):
        survived = set()
        while True:
            if e.e is None:
                break
            if e.a:
                break
            if e.p in self.n2sni:
                sni = self.n2sni[e.p]
                nodex, edgex = self.sni2nx[sni]
                survived |= self.sni2n[sni]
                for e_ in self.sni2e[sni]:
                    alive_e.add(e_.e)
                    e.a = True
                self.remove_supernode(sni)
                e = edgex
            else:
                survived.add(e.p)
                alive_e.add(e.e)
                e.a = True
                e = e.ue
        alive |= survived
        self.g -= survived
        return self.q[-1].ue if self.q else None

    def merge(self, e):
        if e.c in self.n2sni:
            nodex, _ = self.sni2nx[self.n2sni[e.c]]
        else:
            nodex = e.c
        sn = {e.p, e.c}
        se = [e]
        usni = {self.n2sni[e.p]} if e.p in self.n2sni else set()
        npa = self.q[-1].p if self.q else None
        found = e if e.c == npa else False
        while e.p != nodex:
            e = e.ue
            assert e.e is not None
            if e.c == npa:
                found = e
            if e.p in self.n2sni:
                usni.add(self.n2sni[e.p])
            else:
                sn.add(e.p)
                se.append(e)
        if usni:
            for sni in usni:
                sn |= self.sni2n[sni]
                se += self.sni2e[sni]
                self.sni2nx[sni] = None
                self.sni2n[sni] = None
                self.sni2e[sni] = None
        self.sni2nx.append((nodex, e.ue))
        self.sni2n.append(sn)
        self.sni2e.append(se)
        sni = len(self.sni2nx) - 1
        for n in sn:
            self.n2sni[n] = sni
        return found if found else e

    def check_survival(self, dead, e0):
        ch = e0.c
        if ch not in self.n2sni:
            return None
        sni = self.n2sni[ch]
        nodex, _ = self.sni2nx[sni]
        if ch != nodex:
            return None
        e1s = e0.de
        e0.de = []
        for e1 in e1s:
            e1.ue = None
        ns = self.sni2n[sni]
        dead |= ns
        self.g -= ns
        self.remove_supernode(sni)
        return self.prune(dead, e0)


def check_edge_v1(gf, trks, ntrks, e, dfs, alive, alive_e, dead):
    if e.p == e.c:
        return 0, dfs.prune(dead, e)
    if e.c in alive:
        return 3, dfs.make_alive(alive, alive_e, e)
    if e.c in trks:
        return 3, dfs.make_alive(alive, alive_e, e)
    if e.c not in gf:
        dead.add(e.c)
        return 0, dfs.prune(dead, e)
    if e.c in dead:
        return 0, dfs.prune(dead, e)
    if e.c in ntrks:
        return 0, dfs.prune(dead, e)
    if e.c in dfs.g:
        return 2, dfs.merge(e)
    dfs.g.add(e.c)
    return 1, 0


def check_bubble_root_edge(rt, edge, gf, trks, ntrks, alive, dead):
    alive_e = set()
    dfs = CyclicDFS()
    dfs.q = [edge]
    dfs.add(rt, [edge])
    while True:
        e0 = dfs.q.pop()
        isalive, bte = check_edge_v1(gf, trks, ntrks, e0, dfs, alive,
                                     alive_e, dead)
        while bte == 0:
            ne, e1s = decode_edges(gf, e0.c)
            dfs.add(e0, e1s)
            if ne > 1:
                for i in range(len(e1s) - 1):
                    dfs.q.append(e1s[i])
            e0 = e1s[-1]
            isalive, bte = check_edge_v1(gf, trks, ntrks, e0, dfs, alive,
                                         alive_e, dead)
        if not dfs.q:
            break
        npa = dfs.q[-1].p
        while bte.c != npa:
            out = dfs.check_survival(dead, bte)
            bte = bte.ue if out is None else out
    return alive_e
