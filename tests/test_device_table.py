"""Open-addressing table: build + host/device probes vs dict oracle."""

import os

import numpy as np

from danbing_tk_tpu.index import device_table as dt
from danbing_tk_tpu.io import binary as bio


def test_table_roundtrip_random():
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 42, 5000).astype(np.uint64))
    vals = rng.integers(0, 1 << 31, len(keys)).astype(np.uint32)
    tab = dt.build_table(keys, vals)
    f, v = dt.lookup_np(tab, keys)
    assert f.all() and np.array_equal(v, vals)
    miss = rng.integers(0, 1 << 42, 3000).astype(np.uint64)
    miss = miss[~np.isin(miss, keys)]
    f, _ = dt.lookup_np(tab, miss)
    assert not f.any()


def test_table_composite_keys():
    rng = np.random.default_rng(4)
    n = 4000
    keys = rng.integers(0, 1 << 42, n).astype(np.uint64)
    loci = rng.integers(0, 100, n).astype(np.uint32)
    # dedupe composite
    comp = {}
    for k, l in zip(keys.tolist(), loci.tolist()):
        comp[(k, l)] = (k * 7 + l) & 0x7FFFFFFF
    keys = np.array([k for k, _ in comp], dtype=np.uint64)
    loci = np.array([l for _, l in comp], dtype=np.uint32)
    vals = np.array(list(comp.values()), dtype=np.uint32)
    tab = dt.build_table(keys, vals, loci)
    f, v = dt.lookup_np(tab, keys, loci)
    assert f.all() and np.array_equal(v, vals)
    # same kmer, wrong locus -> miss (unless that pair exists)
    f2, _ = dt.lookup_np(tab, keys, (loci + 1) % 100)
    for i in np.where(f2)[0]:
        assert (int(keys[i]), int((loci[i] + 1) % 100)) in comp


def test_jax_probe_matches_np(golden_dir):
    import jax.numpy as jnp

    keys, vals, vv = bio.read_index_dbi(
        os.path.join(golden_dir, "pan.kmers.dbi"))
    tab = dt.build_table(keys, vals)
    rng = np.random.default_rng(5)
    qs = np.concatenate([
        keys[rng.integers(0, len(keys), 2000)],
        rng.integers(0, 1 << 42, 2000).astype(np.uint64),
    ])
    f_np, v_np = dt.lookup_np(tab, qs)
    q_lo = jnp.asarray((qs & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    q_hi = jnp.asarray((qs >> np.uint64(32)).astype(np.uint32))
    f_j, v_j = dt.lookup_jax(
        jnp.asarray(tab.key_lo), jnp.asarray(tab.key_hi),
        jnp.asarray(tab.val), q_lo, q_hi, tab.max_probes)
    assert np.array_equal(np.asarray(f_j), f_np)
    assert np.array_equal(np.asarray(v_j)[f_np], v_np[f_np])
    # cross-check vs dict
    d = dict(zip(keys.tolist(), vals.tolist()))
    for i in range(0, len(qs), 37):
        assert f_np[i] == (int(qs[i]) in d)
