#!/usr/bin/env python
"""Stage-by-stage timing of the device align pipeline on the current
JAX backend (run without args on the TPU; DTK_PROF_CPU=1 for CPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("DTK_PROF_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from danbing_tk_tpu.engine import device_align as da
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG
from danbing_tk_tpu.index import device_table as dt
from danbing_tk_tpu.ops.kmers_jax import extract_kmers_edges

P = int(os.environ.get("DTK_BENCH_PAIRS", 4096))
L = 160
K = 21
NKW = L - K + 1

golden = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
rpgg = RPGG(os.path.join(golden, "pan"))
cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1)
drp = da.DeviceRPGG.build(rpgg, with_tre=False)
codes, rlen, live = _example_batch(P, L, seed=1)
codes = jnp.asarray(codes)
rlen = jnp.asarray(rlen)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    compile_t = time.time() - t0
    t0 = time.time()
    n = 5
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    run_t = (time.time() - t0) / n
    print(f"{name:28s} compile {compile_t:6.1f}s   run {run_t*1e3:8.2f} ms",
          flush=True)
    return out


# stage 1: extraction
ex = timeit("extract", lambda c, r: extract_kmers_edges(c, r, K), codes,
            rlen)

t_lo = jnp.asarray(drp.dbi_tab.key_lo)
t_hi = jnp.asarray(drp.dbi_tab.key_hi)
t_val = jnp.asarray(drp.dbi_tab.val)
klo = np.asarray(ex["klo"]).reshape(-1)
khi = np.asarray(ex["khi"]).reshape(-1)
print("max_probes:", drp.dbi_tab.max_probes, "table size:",
      drp.dbi_tab.size, flush=True)


def probe(klo, khi):
    return dt.lookup_jax(t_lo, t_hi, t_val, klo, khi, drp.dbi_tab.max_probes)

timeit("dbi probe (fori)", probe, jnp.asarray(klo), jnp.asarray(khi))


# sort-based voting surrogate: the 5-operand in-row sort
mlo = jnp.asarray(np.random.default_rng(0).integers(
    0, 1 << 32, (P, 2 * NKW)).astype(np.uint32))
mhi = jnp.asarray(np.random.default_rng(1).integers(
    0, 1 << 10, (P, 2 * NKW)).astype(np.uint32))
mv = jnp.asarray(np.zeros((P, 2 * NKW), np.uint32))
mm = jnp.asarray(np.zeros((P, 2 * NKW), np.int32))


def sort5(mhi, mlo, mv, mm):
    return jax.lax.sort((mhi, mlo, mv, mm, mm), dimension=-1, num_keys=2)

timeit("vote sort (5-operand)", sort5, mhi, mlo, mv, mm)


# scatter surrogate
rid = jnp.asarray(np.random.default_rng(2).integers(
    0, 2 * NKW, (P, 2 * NKW)).astype(np.int32))
rows = jnp.arange(P, dtype=jnp.int32)[:, None].repeat(2 * NKW, 1)


def scat(rid, rows):
    x = jnp.zeros((P, 2 * NKW), jnp.int32).at[rows, rid].add(1)
    return x

timeit("run scatter-add 2D", scat, rid, rows)

E = 512
csum = jnp.asarray(np.sort(np.random.default_rng(3).integers(
    0, 3, (P, 2 * NKW))).cumsum(axis=1).astype(np.int32))
eidx = jnp.asarray(np.tile(np.arange(E, dtype=np.int32), (P, 1)))


def ssort(csum, eidx):
    return jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
        csum, eidx)

timeit("CSR searchsorted", ssort, csum, eidx)

# full step for reference
step = da.make_step(drp, cfg, P, L, with_annot=False)
state = da.init_state(drp)
t0 = time.time()
state, out = step(state, codes, rlen, jnp.asarray(live))
jax.block_until_ready(out["vote_pass"])
print(f"full step first: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(3):
    state, out = step(state, codes, rlen, jnp.asarray(live))
jax.block_until_ready(out["vote_pass"])
print(f"full step steady: {(time.time()-t0)/3*1e3:.1f} ms", flush=True)
