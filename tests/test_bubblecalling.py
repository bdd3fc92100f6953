"""Fuzz our snarl traversal against the reference bubblecalling module."""

import os
import sys

import numpy as np
import pytest

from danbing_tk_tpu.analysis import bubblecalling as bc

REF = "/root/reference/script"


@pytest.fixture(scope="module")
def ref_bc():
    os.makedirs("/tmp/pyshims/statsmodels", exist_ok=True)
    for fn in ("__init__.py", "api.py"):
        with open(f"/tmp/pyshims/statsmodels/{fn}", "w") as f:
            f.write("# stub\n")
    sys.path.insert(0, "/tmp/pyshims")
    sys.path.insert(0, REF)
    import bubblecalling as refmod
    return refmod


def _random_case(rng):
    """Random small novel-edge graph + TR/NTR annotations."""
    nseed = int(rng.integers(1, 4))
    edges = set()
    nodes = [int(rng.integers(0, 1 << 42)) for _ in range(nseed)]
    for _ in range(int(rng.integers(3, 40))):
        pa = nodes[int(rng.integers(0, len(nodes)))]
        nt = int(rng.integers(0, 4))
        e = (pa << 2) + nt
        edges.add(e)
        ch = ((pa << 2) & ((1 << 42) - 1)) + nt
        nodes.append(ch)
    trks = set(int(x) for x in
               rng.choice(nodes, size=max(1, len(nodes) // 3),
                          replace=False))
    ntrks = set(int(x) for x in
                rng.choice(nodes, size=max(1, len(nodes) // 4),
                           replace=False))
    return list(edges), trks, ntrks


def test_fuzz_vs_reference(ref_bc):
    rng = np.random.default_rng(17)
    ntested = 0
    for trial in range(60):
        edges, trks, ntrks = _random_case(rng)
        gf_m = bc.build_edge_graph(edges)
        gf_r = ref_bc.es2bigf(list(edges))
        assert gf_m == gf_r
        alive_m, dead_m = set(), set()
        alive_r, dead_r = set(), set()
        for pa in gf_m:
            if pa not in trks:
                continue
            rt_m = bc.Arc(None, None, pa)
            rt_r = ref_bc.Edge(None, None, pa)
            ne_m, es_m = bc.arcs_from_node(gf_m, pa)
            ne_r, es_r = ref_bc.decode_edges(gf_r, pa)
            assert [a.edge for a in es_m] == [e.e for e in es_r]
            for em, er in zip(es_m, es_r):
                out_m = bc.check_bubble_root_edge(
                    rt_m, em, gf_m, trks, ntrks, alive_m, dead_m)
                out_r = ref_bc.check_bubble_root_edge(
                    rt_r, er, gf_r, trks, ntrks, alive_r, dead_r)
                assert out_m == out_r, (trial, pa)
                assert em.alive == er.a
                ntested += 1
        assert alive_m == alive_r and dead_m == dead_r, trial
    assert ntested > 100
