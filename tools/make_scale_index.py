#!/usr/bin/env python
"""Synthetic production-scale RPGG built directly into device tables.

The reference's production index is ~80k loci / ~1.2e9 k-mers
(/root/reference/README.md:22).  Building that through the text formats
and Python dicts is build-pipeline territory; for ENGINE benchmarking we
need the same table shapes and hit statistics without the dict detour, so
this constructs a DeviceRPGG straight from numpy:

  * per-locus random TR sequences (2-bit codes), with locus FAMILIES
    sharing identical sequences (=> shared k-mers => vv lists, the vote's
    expansion load, like real motif sharing)
  * canonical k-mers extracted with the same kernels the engine uses
  * kmerDBi (keys/vals/vv) and the composite trfl slot table assembled
    with sorts/uniques only — no per-key Python

Read batches are sampled from the same sequence pool (PE fragments), so
probes hit and the full vote/annotate/count path runs realistically.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from danbing_tk_tpu.engine.device_align import ANN_TR, DeviceRPGG  # noqa
from danbing_tk_tpu.index import device_table as dt  # noqa
from danbing_tk_tpu.ops import kmers_np as K  # noqa


def build_scale_rpgg(nloci: int = 80_000, kmers_per_locus: int = 1500,
                     family_frac: float = 0.2, k: int = 21, seed: int = 9,
                     with_trfl: bool = True, verbose: bool = True):
    """Returns (drp: DeviceRPGG, seqs: (nloci, Ltr) u8 codes)."""
    def log(msg):
        if verbose:
            print(f"[scale-index] {msg}", file=sys.stderr)

    rng = np.random.default_rng(seed)
    Ltr = kmers_per_locus + k - 1
    t0 = time.time()
    seqs = rng.integers(0, 4, size=(nloci, Ltr), dtype=np.uint8)
    # families: runs of 2-8 consecutive loci share a ~25% SEGMENT (motif-
    # level sharing; fully duplicated loci would make every family read a
    # cap-overflowing all-locus tie, which real RPGGs don't have — MBE
    # merges true duplicates)
    li = 0
    fam_target = int(nloci * family_frac)
    seg = max(Ltr // 4, k)
    famed = 0
    while famed < fam_target and li < nloci - 8:
        size = int(rng.integers(2, 9))
        beg = int(rng.integers(0, Ltr - seg))
        seqs[li + 1 : li + size, beg : beg + seg] = seqs[li, beg : beg + seg]
        famed += size
        li += size + int(rng.integers(1, 20))
    log(f"sequences {seqs.nbytes/1e6:.0f} MB in {time.time()-t0:.1f}s")

    # canonical k-mers, all loci in one shot (interior windows only)
    t0 = time.time()
    kms = np.empty((nloci, kmers_per_locus), dtype=np.uint64)
    chunk = max(1, int(2e8 // Ltr))
    for s in range(0, nloci, chunk):
        e = min(s + chunk, nloci)
        block = seqs[s:e]
        pad = np.full((e - s, k - 1), 255, dtype=np.uint8)
        flat = np.concatenate([block, pad], axis=1).reshape(-1)
        flat = np.concatenate([flat, np.full(k - 1, 255, np.uint8)])
        allk = K.seq_to_kmers(flat, k, canonical=True)
        allk = allk.reshape(e - s, Ltr + k - 1)[:, :kmers_per_locus]
        kms[s:e] = allk
    log(f"kmers extracted in {time.time()-t0:.1f}s")

    # per-locus dedupe: sort within row, drop repeats (ragged flat form)
    t0 = time.time()
    kms.sort(axis=1)
    keep = np.ones(kms.shape, dtype=bool)
    keep[:, 1:] = kms[:, 1:] != kms[:, :-1]
    loc_of = np.broadcast_to(
        np.arange(nloci, dtype=np.uint32)[:, None], kms.shape)
    flat_k = kms[keep]
    flat_l = loc_of[keep].astype(np.uint32)
    per_locus = keep.sum(axis=1).astype(np.int64)
    offsets = np.zeros(nloci + 1, dtype=np.int64)
    np.cumsum(per_locus, out=offsets[1:])
    nslots = int(offsets[-1])
    del kms, keep, loc_of
    log(f"{nslots/1e6:.1f}M (kmer,locus) slots in {time.time()-t0:.1f}s")

    # kmerDBi: unique kmers; shared ones get vv lists
    t0 = time.time()
    order = np.argsort(flat_k, kind="stable")
    sk = flat_k[order]
    sl = flat_l[order]
    first = np.ones(len(sk), dtype=bool)
    first[1:] = sk[1:] != sk[:-1]
    grp = np.cumsum(first) - 1                     # group id per entry
    counts = np.bincount(grp)
    keys = sk[first]
    nkeys = len(keys)
    shared = counts > 1                            # per group
    # vv layout: [n, loci...] per shared group, concatenated
    vv_sizes = np.where(shared, counts + 1, 0)
    vv_off = np.zeros(nkeys + 1, dtype=np.int64)
    np.cumsum(vv_sizes, out=vv_off[1:])
    vv = np.zeros(int(vv_off[-1]), dtype=np.uint32)
    vv[vv_off[:-1][shared]] = counts[shared].astype(np.uint32)
    # scatter loci: entry positions within group = rank since group start
    grp_start = np.flatnonzero(first)
    rank = np.arange(len(sk)) - grp_start[grp]
    ent_shared = shared[grp]
    dst = vv_off[:-1][grp] + 1 + rank
    vv[dst[ent_shared]] = sl[ent_shared]
    vals = np.where(
        shared, (vv_off[:-1] << 1) | 1,
        sl[grp_start].astype(np.int64) << 1).astype(np.uint32)
    log(f"dbi {nkeys/1e6:.1f}M keys, vv {len(vv)/1e6:.1f}M "
        f"in {time.time()-t0:.1f}s")

    # single-locus k-mers carry their annotation value in the dbi row's
    # second plane; values hold the RANK within the locus (slot =
    # locus_offsets[dst] + rank on device — u32-safe at 1e9+ slots);
    # only shared (vv) k-mers keep composite trfl entries — see
    # DeviceRPGG.build for the probe-fusion rationale
    slot_of = order[grp_start].astype(np.int64)
    rank_of = slot_of - offsets[flat_l[slot_of]]
    ann = np.where(shared, 0, (rank_of << 3) | ANN_TR).astype(np.uint32)

    t0 = time.time()
    dbi_tab = dt.build_bucket_table(keys, vals, vals2=ann)
    member_tab = dt.build_bucket_table(keys, None)
    log(f"dbi table {dbi_tab.nbytes/1e9:.2f} GB "
        f"({len(dbi_tab.levels)} levels) + member "
        f"{member_tab.nbytes/1e9:.2f} GB in {time.time()-t0:.1f}s")
    ent_shared_flat = np.empty(len(flat_k), dtype=bool)
    ent_shared_flat[order] = ent_shared
    del keys, vals, order, sk, sl, first, grp, counts

    trfl_tab = None
    if with_trfl:
        # slot ids in trkmc flatten order (per-locus, sorted-kmer order)
        t0 = time.time()
        slots = np.flatnonzero(ent_shared_flat).astype(np.int64)
        ranks = (slots - offsets[flat_l[ent_shared_flat]]).astype(np.uint64)
        tv = ((ranks << np.uint64(3)) | np.uint64(ANN_TR)).astype(np.uint32)
        trfl_tab = dt.build_bucket_table(
            flat_k[ent_shared_flat], tv, flat_l[ent_shared_flat])
        log(f"trfl table {trfl_tab.nbytes/1e9:.2f} GB "
            f"({len(trfl_tab.levels)} levels, "
            f"{int(ent_shared_flat.sum())/1e6:.1f}M shared entries) "
            f"in {time.time()-t0:.1f}s")
    drp = DeviceRPGG(nloci, dbi_tab, vv, trfl_tab, None,
                     offsets, nslots, member_tab=member_tab)
    return drp, seqs


def _tab_to_arrs(prefix: str, tab, arrs: dict):
    arrs[f"{prefix}_nlev"] = np.int64(len(tab.levels))
    arrs[f"{prefix}_composite"] = np.int64(tab.composite)
    arrs[f"{prefix}_nval"] = np.int64(getattr(tab, "nval", 1))
    for i, (t, s) in enumerate(tab.levels):
        arrs[f"{prefix}_t{i}"] = t
        arrs[f"{prefix}_s{i}"] = np.int64(s)


def _tab_from_arrs(prefix: str, z):
    levels = [(z[f"{prefix}_t{i}"], int(z[f"{prefix}_s{i}"]))
              for i in range(int(z[f"{prefix}_nlev"]))]
    return dt.BucketTable(
        levels, composite=bool(int(z[f"{prefix}_composite"])),
        nval=int(z[f"{prefix}_nval"]) if f"{prefix}_nval" in z else 1)


def build_scale_rpgg_cached(nloci, kmers_per_locus, with_trfl=True,
                            cache_dir="build", **kw):
    """Disk-cached build_scale_rpgg: the 100M-key host build takes ~20min,
    so reruns load the flat tables from an npz instead."""
    os.makedirs(cache_dir, exist_ok=True)
    seed = kw.get("seed", 9)
    # v4: rank-encoded annotation values (u32-safe at 1e9+ slots)
    path = os.path.join(
        cache_dir,
        f"scale_{nloci}_{kmers_per_locus}_{seed}_{int(with_trfl)}_v4.npz")
    if os.path.exists(path):
        t0 = time.time()
        z = np.load(path)
        trfl = _tab_from_arrs("trfl", z) if int(z["with_trfl"]) else None
        drp = DeviceRPGG(int(z["nloci"]), _tab_from_arrs("dbi", z),
                         z["vv"], trfl, None, z["locus_offsets"],
                         int(z["nslots"]),
                         member_tab=_tab_from_arrs("member", z))
        print(f"[scale-index] cache hit {path} "
              f"({time.time()-t0:.0f}s)", file=sys.stderr)
        return drp, z["seqs"]
    drp, seqs = build_scale_rpgg(nloci, kmers_per_locus,
                                 with_trfl=with_trfl, **kw)
    arrs = {"seqs": seqs, "nloci": np.int64(drp.nloci), "vv": drp.vv,
            "locus_offsets": drp.locus_offsets,
            "nslots": np.int64(drp.nslots),
            "with_trfl": np.int64(drp.trfl_tab is not None)}
    _tab_to_arrs("dbi", drp.dbi_tab, arrs)
    _tab_to_arrs("member", drp.member_tab, arrs)
    if drp.trfl_tab is not None:
        _tab_to_arrs("trfl", drp.trfl_tab, arrs)
    np.savez(path, **arrs)
    print(f"[scale-index] cached -> {path}", file=sys.stderr)
    return drp, seqs


def sample_read_batch(seqs, P: int, L: int, rng, frac_tr: float = 1.0,
                      flen: int = 400):
    """PE pairs from the locus pool (+ random background)."""
    nloci, Ltr = seqs.shape
    codes = np.full((2 * P, L), 255, dtype=np.uint8)
    rlen = np.full(2 * P, L, dtype=np.int32)
    is_tr = rng.random(P) < frac_tr
    li = rng.integers(0, nloci, P)
    beg = rng.integers(0, max(Ltr - flen, 1), P)
    for i in range(P):
        if is_tr[i]:
            frag = seqs[li[i], beg[i] : beg[i] + flen]
            r1 = frag[:L]
            r2 = (3 - frag[-L:])[::-1]              # reverse complement
        else:
            r1 = rng.integers(0, 4, L, dtype=np.uint8)
            r2 = rng.integers(0, 4, L, dtype=np.uint8)
        codes[2 * i, : len(r1)] = r1
        codes[2 * i + 1, : len(r2)] = r2
        rlen[2 * i] = len(r1)
        rlen[2 * i + 1] = len(r2)
    return codes, rlen


# ---------------------------------------------------------------------------
# FULL production scale (1.2e9 slots): memory-lean chunked builder
# ---------------------------------------------------------------------------

def build_full_tables(outdir: str, nloci: int = 80_000,
                      kmers_per_locus: int = 15_000, k: int = 21,
                      seed: int = 9, family_frac: float = 0.2,
                      verbose: bool = True) -> dict:
    """Builds the reference-production-scale index (~1.2e9 (kmer,locus)
    slots, /root/reference/README.md:22) within this host's RAM:

      * entries ride as ONE packed u64 plane ((kmer<<17)|locus — k=21
        kmers are 42 bits, loci 17) radix-sorted in place of the
        (argsort + 3 gathered copies) of the plain builder
      * per-locus ranks ride as u16 (the rank-encoded annotation values
        need no global-slot array)
      * group stats stream in bounded chunks; every finished table level
        spills to <outdir>/*.npy immediately and frees

    Returns the manifest (also written to <outdir>/manifest.npz).
    load_full_tables() mmaps the levels back as a DeviceRPGG.
    """
    import gc
    import json

    os.makedirs(outdir, exist_ok=True)

    def log(msg):
        if verbose:
            print(f"[full-index] {msg}", file=sys.stderr)

    assert nloci <= (1 << 17), nloci
    rng = np.random.default_rng(seed)
    Ltr = kmers_per_locus + k - 1
    t_all = time.time()
    t0 = time.time()
    seqs = rng.integers(0, 4, size=(nloci, Ltr), dtype=np.uint8)
    li = 0
    fam_target = int(nloci * family_frac)
    seg = max(Ltr // 4, k)
    famed = 0
    while famed < fam_target and li < nloci - 8:
        size = int(rng.integers(2, 9))
        beg = int(rng.integers(0, Ltr - seg))
        seqs[li + 1: li + size, beg: beg + seg] = seqs[li, beg: beg + seg]
        famed += size
        li += size + int(rng.integers(1, 20))
    np.save(os.path.join(outdir, "seqs.npy"), seqs)
    log(f"sequences {seqs.nbytes/1e9:.1f} GB in {time.time()-t0:.0f}s")

    t0 = time.time()
    kms = np.empty((nloci, kmers_per_locus), dtype=np.uint64)
    chunk = max(1, int(2e8 // Ltr))
    for s in range(0, nloci, chunk):
        e = min(s + chunk, nloci)
        block = seqs[s:e]
        pad = np.full((e - s, k - 1), 255, dtype=np.uint8)
        flat = np.concatenate([block, pad], axis=1).reshape(-1)
        flat = np.concatenate([flat, np.full(k - 1, 255, np.uint8)])
        allk = K.seq_to_kmers(flat, k, canonical=True)
        kms[s:e] = allk.reshape(e - s, Ltr + k - 1)[:, :kmers_per_locus]
    del seqs, flat, allk
    gc.collect()
    log(f"kmers extracted in {time.time()-t0:.0f}s")

    # per-locus dedupe -> packed entries + in-locus ranks
    t0 = time.time()
    kms.sort(axis=1)
    per_locus = np.empty(nloci, dtype=np.int64)
    offsets = np.zeros(nloci + 1, dtype=np.int64)
    # first pass: counts
    for s in range(0, nloci, chunk):
        e = min(s + chunk, nloci)
        kb = kms[s:e]
        keep = np.ones(kb.shape, dtype=bool)
        keep[:, 1:] = kb[:, 1:] != kb[:, :-1]
        per_locus[s:e] = keep.sum(axis=1)
    np.cumsum(per_locus, out=offsets[1:])
    nslots = int(offsets[-1])
    packed = np.empty(nslots, dtype=np.uint64)
    rank16 = np.empty(nslots, dtype=np.uint16)
    for s in range(0, nloci, chunk):
        e = min(s + chunk, nloci)
        kb = kms[s:e]
        keep = np.ones(kb.shape, dtype=bool)
        keep[:, 1:] = kb[:, 1:] != kb[:, :-1]
        loc = np.broadcast_to(
            np.arange(s, e, dtype=np.uint64)[:, None], kb.shape)
        dst = slice(int(offsets[s]), int(offsets[e]))
        packed[dst] = (kb[keep] << np.uint64(17)) | loc[keep]
        rk = (keep.cumsum(axis=1) - 1).astype(np.uint16)
        rank16[dst] = rk[keep]
    del kms, kb, keep, loc, rk
    gc.collect()
    log(f"{nslots/1e9:.3f}e9 slots packed in {time.time()-t0:.0f}s")

    # sort by (kmer, locus): radix argsort + apply (rank16 must follow)
    t0 = time.time()
    order = np.argsort(packed, kind="stable")
    packed = packed[order]
    rank16 = rank16[order]
    del order
    gc.collect()
    log(f"entry sort in {time.time()-t0:.0f}s")

    # group scan (chunked compares keep transients ~100 MB)
    t0 = time.time()
    first = np.empty(nslots, dtype=bool)
    first[0] = True
    CH = 100_000_000
    for s in range(1, nslots, CH):
        e = min(s + CH, nslots)
        first[s:e] = (packed[s:e] >> np.uint64(17)) != \
            (packed[s - 1:e - 1] >> np.uint64(17))
    gstart = np.flatnonzero(first)
    nkeys = len(gstart)
    counts = np.diff(gstart, append=nslots).astype(np.int32)
    shared = counts > 1
    nsg = int(shared.sum())
    log(f"{nkeys/1e6:.1f}M keys ({nsg/1e6:.1f}M shared groups) "
        f"in {time.time()-t0:.0f}s")

    # vv plane: [n, loci...] per shared group.  Entries of a group are
    # contiguous and locus-ascending after the packed sort, so loci fill
    # sequentially; destinations skip one size slot per group.
    t0 = time.time()
    ent_shared = np.repeat(shared, counts)
    loci_sh = (packed[ent_shared] & np.uint64((1 << 17) - 1)).astype(
        np.uint32)
    nse = len(loci_sh)
    g_of = (np.cumsum(first[ent_shared], dtype=np.int64) - 1)
    vv = np.empty(nse + nsg, dtype=np.uint32)
    dst = np.arange(nse, dtype=np.int64) + g_of + 1
    vv[dst] = loci_sh
    size_pos = dst[first[ent_shared]] - 1
    vv[size_pos] = counts[shared].astype(np.uint32)
    vv_off_shared = size_pos                      # per shared group
    assert len(vv) < (1 << 31), "vv exceeds the u32 odd-val encoding"
    del dst, g_of, loci_sh
    gc.collect()
    log(f"vv {len(vv)/1e6:.0f}M in {time.time()-t0:.0f}s")

    # dbi planes
    t0 = time.time()
    keys = (packed[gstart] >> np.uint64(17))
    loc_first = (packed[gstart] & np.uint64((1 << 17) - 1)).astype(
        np.uint32)
    vals = np.empty(nkeys, dtype=np.uint32)
    vals[~shared] = loc_first[~shared] << 1
    vals[shared] = (vv_off_shared.astype(np.uint32) << 1) | 1
    ann = np.zeros(nkeys, dtype=np.uint32)
    ann[~shared] = (rank16[gstart[~shared]].astype(np.uint32) << 3) \
        | ANN_TR
    del loc_first
    gc.collect()
    log(f"dbi planes in {time.time()-t0:.0f}s")

    manifest = dict(nloci=nloci, nslots=nslots, nkeys=nkeys,
                    kmers_per_locus=kmers_per_locus)

    def spill(prefix, tab):
        meta = []
        for i, (t, s) in enumerate(tab.levels):
            np.save(os.path.join(outdir, f"{prefix}_t{i}.npy"), t)
            meta.append((list(t.shape), int(s)))
        manifest[prefix] = dict(levels=meta, composite=tab.composite,
                                nval=tab.nval,
                                nbytes=int(tab.nbytes))
        log(f"{prefix} table {tab.nbytes/1e9:.2f} GB "
            f"({len(tab.levels)} levels) spilled")

    t0 = time.time()
    dbi_tab = dt.build_bucket_table(keys, vals, vals2=ann)
    log(f"dbi table build in {time.time()-t0:.0f}s")
    spill("dbi", dbi_tab)
    del dbi_tab, keys, vals, ann, gstart, counts, first
    gc.collect()

    # trfl composite entries (shared kmers only)
    t0 = time.time()
    tk = (packed[ent_shared] >> np.uint64(17))
    tl = (packed[ent_shared] & np.uint64((1 << 17) - 1)).astype(np.uint32)
    tv = (rank16[ent_shared].astype(np.uint32) << 3) | ANN_TR
    del packed, rank16, ent_shared
    gc.collect()
    trfl_tab = dt.build_bucket_table(tk, tv, tl)
    log(f"trfl table build in {time.time()-t0:.0f}s")
    spill("trfl", trfl_tab)
    del trfl_tab, tk, tl, tv
    gc.collect()

    np.save(os.path.join(outdir, "vv.npy"), vv)
    np.save(os.path.join(outdir, "offsets.npy"), offsets)
    manifest["wall_s"] = int(time.time() - t_all)
    with open(os.path.join(outdir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    log(f"TOTAL build wall {manifest['wall_s']}s")
    return manifest


def load_full_tables(outdir: str, mmap: bool = True):
    """Reassembles build_full_tables() output as (DeviceRPGG, seqs).
    With mmap=True the multi-GB levels stay disk-backed until sliced."""
    import json

    with open(os.path.join(outdir, "manifest.json")) as f:
        manifest = json.load(f)
    mode = "r" if mmap else None

    def tab(prefix):
        m = manifest[prefix]
        levels = [
            (np.load(os.path.join(outdir, f"{prefix}_t{i}.npy"),
                     mmap_mode=mode), salt)
            for i, (_, salt) in enumerate(m["levels"])]
        return dt.BucketTable(levels, composite=m["composite"],
                              nval=m["nval"])

    drp = DeviceRPGG(
        int(manifest["nloci"]), tab("dbi"),
        np.load(os.path.join(outdir, "vv.npy"), mmap_mode=mode),
        tab("trfl"), None,
        np.load(os.path.join(outdir, "offsets.npy")),
        int(manifest["nslots"]), member_tab=None)
    seqs = np.load(os.path.join(outdir, "seqs.npy"), mmap_mode=mode)
    return drp, seqs, manifest
