#!/usr/bin/env python
"""Second-round profiling: where do the 308ms/step go at P=4096?"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_batch
from danbing_tk_tpu.engine import device_align as da
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG
from danbing_tk_tpu.index import device_table as dt
from danbing_tk_tpu.ops.kmers_jax import extract_kmers_edges

P, L, K = 4096, 160, 21
NKW = L - K + 1
golden = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
rpgg = RPGG(os.path.join(golden, "pan"))
cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1)
drp = da.DeviceRPGG.build(rpgg, with_tre=False)
codes, rlen, live = _example_batch(P, L, seed=1)
codes, rlen = jnp.asarray(codes), jnp.asarray(rlen)


def timeit(name, f, *args):
    jf = jax.jit(f)
    t0 = time.time()
    out = jf(*args)
    jax.block_until_ready(out)
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = jf(*args)
    jax.block_until_ready(out)
    rt = (time.time() - t0) / 5
    print(f"{name:30s} compile {ct:6.1f}s run {rt*1e3:8.2f} ms", flush=True)


# extract + dbi probe + filters only
def upto_filters(codes, rlen):
    ex = extract_kmers_edges(codes, rlen, K)
    found, val = dt.lookup_bucket_jax(drp.dbi_tab, ex["klo"], ex["khi"])
    return found.sum(), val.sum()

timeit("extract+probe", upto_filters, codes, rlen)


# the vote sort + dedupe + expansion + segsum (isolated w/ real inputs)
ex = extract_kmers_edges(codes, rlen, K)
found_, val_ = dt.lookup_bucket_jax(drp.dbi_tab, ex["klo"], ex["khi"])
klo = ex["klo"]
khi = ex["khi"]


def vote_only(klo, khi, found, val):
    from danbing_tk_tpu.ops.kmers_jax import EMPTY

    use = found
    m_lo = jnp.where(use, klo, EMPTY).reshape(P, 2 * NKW)
    m_hi = jnp.where(use, khi, EMPTY).reshape(P, 2 * NKW)
    m_val = val.reshape(P, 2 * NKW)
    mate = jnp.tile(jnp.repeat(jnp.arange(2, dtype=jnp.int32), NKW)[None, :],
                    (P, 1))
    s_hi, s_lo, s_val, s_mate, s_use = jax.lax.sort(
        (m_hi, m_lo, m_val, mate, use.reshape(P, 2 * NKW).astype(jnp.int32)),
        dimension=-1, num_keys=2)
    return s_hi.sum(), s_val.sum()

timeit("vote sort", vote_only, klo, khi, found_, val_)

# the annotation probe (trfl)
dst0 = jnp.zeros((2 * P, NKW), jnp.uint32)


def annot_probe(klo, khi, dst0):
    af, av = dt.lookup_bucket_jax(drp.trfl_tab, klo, khi, q_loc=dst0)
    return af.sum(), av.sum()

timeit("trfl probe", annot_probe, klo, khi, dst0)


# the state machine scans
ann = jnp.asarray(np.random.default_rng(0).integers(
    0, 3, (2 * P, NKW)).astype(np.int32))


def state_machine(ann):
    lk = da._seg_last_nonzero_excl(ann)
    known = ann > 0
    trans = known & (lk > 0) & (ann != lk)
    cumtrans = jnp.cumsum(trans.astype(jnp.int32), axis=-1)
    idx_known = jnp.where(known, jnp.arange(NKW, dtype=jnp.int32), -1)
    lki = da._cummax(idx_known)
    return cumtrans[:, -1].sum(), lki.sum(), trans.sum()

timeit("state machine scans", state_machine, ann)

# full step
step = da.make_step(drp, cfg, P, L, with_annot=False)
state = da.init_state(drp)
t0 = time.time()
state, out = step(state, codes, rlen, jnp.asarray(live))
jax.block_until_ready(out["vote_pass"])
print(f"full first {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(5):
    state, out = step(state, codes, rlen, jnp.asarray(live))
jax.block_until_ready(out["vote_pass"])
print(f"full steady {(time.time()-t0)/5*1e3:.1f} ms", flush=True)
