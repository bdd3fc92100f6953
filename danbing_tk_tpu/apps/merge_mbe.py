"""Merge colliding MBE loci: mergeMBEbed.py equivalent (reference
script/mergeMBEbed.py).

Consumes mbe.m0.loci (per-hap groups of v1 loci whose expanded regions
merge -- produced by utils.bedops.collision_scan, replacing the
snakefile's bedtools merge) and pan.tr.mbe.v1.bed; emits pan.tr.mbe.v2.bed
(merged boundaries), OrthoMap.v2.tsv (locus <-> hap ordinal map consumed
by fa2kmers -m / genPanKmers) and locusMap.v2.to.v1.txt.

QC drops: non-contiguous merge groups, cross-contig merges (hap removed),
SV > MAXSVLEN, hap support below THRESH (writeBed_MergeMBE
mergeMBEbed.py:87-156).
"""

from __future__ import annotations

import os

import numpy as np


def parse_merge_set(path: str):
    ms: list = []
    bs: set = set()
    v2si: dict = {}
    si = 0
    with open(path) as f:
        for line in f:
            if line[0] == ">":
                continue
            seq = sorted(int(v) for v in line.rstrip().split(","))
            skip = seq[0] in bs
            bad = False
            for i in range(1, len(seq)):
                skip |= seq[i] in bs
                if seq[i] != seq[i - 1] + 1:
                    bad = True
                    for v in seq:
                        if v in v2si:
                            si_ = v2si[v]
                            if ms[si_] is not None:
                                for v_ in ms[si_]:
                                    bs.add(v_)
                                ms[si_] = None
                            v2si.pop(v)
                        bs.add(v)
                    break
            if bad:
                continue
            if skip:
                for v in seq:
                    bs.add(v)
                    if v in v2si:
                        ms[v2si[v]] = None
                        v2si.pop(v)
                continue
            sis = {v2si[v] for v in seq if v in v2si}
            if not sis:
                ms.append(set(seq))
                for v in seq:
                    v2si[v] = si
                si += 1
            else:
                si_s = None
                for si_i in sorted(sis):
                    if si_s is None:
                        si_s = si_i
                    else:
                        ms[si_s] |= ms[si_i]
                        for v in ms[si_i]:
                            v2si[v] = si_s
                        ms[si_i] = None
                ms[si_s] |= set(seq)
                for v in seq:
                    v2si[v] = si_s
    ms = [m for m in ms if m is not None]
    for m in ms:
        assert not (m & bs)
    return ms, bs


def _getdist(bed):
    out = []
    if int(bed[0, 2]) == 1:  # no inversion marker in strand col? (ref uses
        # panbed[...,6+hi*4] ordering columns [s,e,strandflag])
        for i in range(bed.shape[0] - 1):
            out.append(int(bed[i + 1, 0]) - int(bed[i, 1]))
    else:
        for i in range(bed.shape[0] - 1):
            out.append(int(bed[i, 0]) - int(bed[i + 1, 1]))
    return out


def write_bed_merge_mbe(workdir: str, ng: int, thresh: float,
                        maxsvlen: int = 10000):
    ms, bs = parse_merge_set(os.path.join(workdir, "mbe.m0.loci"))
    panbed = np.loadtxt(os.path.join(workdir, "pan.tr.mbe.v1.bed"),
                        dtype=object, ndmin=2, comments=None)
    i1togood = {}
    qcb = []
    for i1s_ in ms:
        i1s = sorted(i1s_)
        nm = len(i1s) - 1
        dist = np.full([nm, 2 * ng], np.nan)
        for hi in range(2 * ng):
            if np.all(panbed[i1s, 3 + hi * 4] != "None"):
                if np.any(panbed[i1s, 3 + hi * 4]
                          != panbed[i1s[0], 3 + hi * 4]):
                    pass  # hap removed: merging across contigs
                else:
                    dist[:, hi] = _getdist(
                        panbed[i1s, 4 + hi * 4 : 7 + hi * 4])
        good = np.all(np.isfinite(dist), axis=0)
        with np.errstate(all="ignore"):
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                mx = np.nanmax(dist) if dist.size else np.nan
        if mx > maxsvlen:
            qcb.append(i1s_)
        elif good.sum() / (2 * ng) < thresh:
            qcb.append(i1s_)
        else:
            i1togood[i1s[0]] = good
    for i1s_ in qcb:
        ms.remove(i1s_)
        for i1 in i1s_:
            bs.add(i1)
    nmi = 0
    mis = set()
    for i1s_ in ms:
        nmi += len(i1s_)
        mis |= i1s_

    nloci1 = panbed.shape[0]
    i2toi1 = (set(range(nloci1)) - mis - bs) | {
        sorted(i1s_)[0] for i1s_ in ms}
    i2toi1 = sorted(i2toi1)
    nloci2 = len(i2toi1)
    assert nloci2 == nloci1 - nmi + len(ms) - len(bs)
    i1toi2 = np.full(nloci1, None, dtype=object)
    i1toi2[i2toi1] = np.arange(nloci2)
    pv2bed = panbed[i2toi1]
    for i1s_ in ms:
        i1s = sorted(i1s_)
        i2 = i1toi2[i1s[0]]
        ids, ide = i1s[0], i1s[-1] + 1
        refs = min(int(s) for s in panbed[ids:ide, 1])
        refe = max(int(e) for e in panbed[ids:ide, 2])
        pv2bed[i2, [1, 2]] = [refs, refe]
        for hi in range(2 * ng):
            if not i1togood[i1s[0]][hi]:
                pv2bed[i2, 3 + hi * 4 : 7 + hi * 4] = ["None"] * 4
                continue
            asms = min(int(s) for s in panbed[ids:ide, 4 + hi * 4])
            asme = max(int(e) for e in panbed[ids:ide, 5 + hi * 4])
            pv2bed[i2, 4 + hi * 4 : 6 + hi * 4] = [asms, asme]
    np.savetxt(os.path.join(workdir, "pan.tr.mbe.v2.bed"), pv2bed,
               delimiter="\t", fmt="%s")

    lmap = np.full([nloci2, 2 * ng], ".", dtype=object)
    for hi in range(2 * ng):
        m = pv2bed[:, 3 + 4 * hi] != "None"
        lmap[m, hi] = np.arange(m.sum())
    np.savetxt(os.path.join(workdir, "OrthoMap.v2.tsv"), lmap,
               delimiter="\t", fmt="%s")
    np.savetxt(os.path.join(workdir, "locusMap.v2.to.v1.txt"), i2toi1,
               fmt="%s")
