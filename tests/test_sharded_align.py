"""Data-parallel shard_map step == single-device step (8-device CPU mesh)."""

import os

import numpy as np
import pytest

from danbing_tk_tpu.engine import device_align as da
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG, \
    iter_fasta_pairs
from danbing_tk_tpu.ops import kmers_np as K
from danbing_tk_tpu.parallel import mesh as pm


@pytest.fixture(scope="module")
def setup():
    import jax
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    rpgg = RPGG(os.path.join(golden_dir, "pan"))
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1)
    drp = da.DeviceRPGG.build(rpgg, with_tre=False)
    batches = list(iter_fasta_pairs(
        os.path.join(golden_dir, "reads.fa"), 40, rpgg.nloci, 0, 150000))
    return rpgg, cfg, drp, batches[0]


def _pack(pairs, P, L):
    codes = np.full((2 * P, L), 255, dtype=np.uint8)
    rlen = np.zeros(2 * P, dtype=np.int32)
    live = np.zeros(P, dtype=bool)
    for i, (t, s1, s2, src) in enumerate(pairs):
        c1, c2 = K.encode_bases(s1)[:L], K.encode_bases(s2)[:L]
        codes[2 * i, : len(c1)] = c1
        codes[2 * i + 1, : len(c2)] = c2
        rlen[2 * i], rlen[2 * i + 1] = len(c1), len(c2)
        live[i] = True
    return codes, rlen, live


def test_sharded_matches_single(setup):
    import jax
    rpgg, cfg, drp, pairs = setup
    P, L = 512, 192
    pairs = pairs[:P]
    codes, rlen, live = _pack(pairs, P, L)

    step1 = da.make_step(drp, cfg, P, L, with_annot=False)
    s1 = da.init_state(drp)
    s1, out1 = step1(s1, codes, rlen, live)

    mesh = pm.make_mesh()
    assert mesh.devices.size == 8
    stepN, P_local = pm.make_sharded_step(
        drp, cfg, mesh, P, L, with_annot=False)
    sN = pm.init_sharded_state(drp, mesh)
    sN, outN = stepN(sN, codes, rlen, live)
    merged = pm.finalize_counts(sN)

    np.testing.assert_array_equal(
        np.asarray(s1["counts"]), merged["counts"])
    np.testing.assert_array_equal(
        np.asarray(s1["nmapread"]), merged["nmapread"])
    np.testing.assert_array_equal(np.asarray(s1["kmc"]), merged["kmc"])
    for k in ("referee", "vote_pass", "dst0", "counted"):
        np.testing.assert_array_equal(np.asarray(out1[k]),
                                      np.asarray(outN[k]), err_msg=k)


def test_sharded_index_full_step_matches(setup):
    """Full align step with dbi+trfl sharded over the mesh == replicated."""
    rpgg, cfg, drp, pairs = setup
    P, L = 256, 192
    codes, rlen, live = _pack(pairs[:P], P, L)

    step1 = da.make_step(drp, cfg, P, L, with_annot=False)
    s1 = da.init_state(drp)
    s1, out1 = step1(s1, codes, rlen, live)

    mesh = pm.make_mesh()
    stepN, _ = pm.make_sharded_step(drp, cfg, mesh, P, L,
                                    with_annot=False, shard_index=True)
    sN = pm.init_sharded_state(drp, mesh)
    sN, outN = stepN(sN, codes, rlen, live)
    merged = pm.finalize_counts(sN)

    np.testing.assert_array_equal(np.asarray(s1["counts"]),
                                  merged["counts"])
    for k in ("referee", "vote_pass", "dst0", "counted"):
        np.testing.assert_array_equal(np.asarray(out1[k]),
                                      np.asarray(outN[k]), err_msg=k)


def test_sharded_index_prefilter_matches(setup):
    """Index-sharded collective prefilter == replicated prefilter."""
    import jax

    from danbing_tk_tpu.parallel.sharded_index import make_sharded_prefilter

    rpgg, cfg, drp, batch = setup
    P, L = 64, 160
    codes, rlen, live = _pack(batch[:P], P, L)

    ref_step = da.make_prefilter_step(drp, cfg, P, L)
    ref = np.asarray(ref_step(codes, rlen, live))

    mesh = pm.make_mesh()
    assert mesh.devices.size == 8
    step, P_local = make_sharded_prefilter(drp, cfg, mesh, P, L)
    got = np.asarray(step(codes, rlen, live))
    assert np.array_equal(ref, got)
    assert ref.any(), "degenerate batch: nothing survives"
