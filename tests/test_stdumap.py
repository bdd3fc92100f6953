"""Fuzz the libstdc++ iteration-order emulator against a real container."""

import os
import subprocess

import numpy as np
import pytest

from danbing_tk_tpu.utils.stdumap import umap_iteration_order

ROOT = os.path.join(os.path.dirname(__file__), "..")
PROBE = os.path.join(ROOT, "build", "probe_umap_order")
SRC = os.path.join(ROOT, "native", "probe_umap_order.cpp")


@pytest.fixture(scope="module")
def probe():
    if not os.path.exists(PROBE) or (
        os.path.getmtime(PROBE) < os.path.getmtime(SRC)
    ):
        os.makedirs(os.path.dirname(PROBE), exist_ok=True)
        subprocess.run(["g++", "-O2", "-o", PROBE, SRC], check=True)
    return PROBE


def run_probe(probe, keys):
    inp = "\n".join(str(int(k)) for k in keys).encode()
    p = subprocess.run([probe, "order"], input=inp, capture_output=True,
                       check=True)
    return [int(x) for x in p.stdout.split()]


CASES = []
rng = np.random.default_rng(123)
CASES.append(("empty", []))
CASES.append(("single", [42]))
CASES.append(("seq100", list(range(100))))
CASES.append(("seq_rev", list(range(500, 0, -1))))
CASES.append(("same_bucket", [13 * i for i in range(200)]))
CASES.append(("dups", [7, 7, 7, 1, 2, 1, 3, 2, 9, 9]))
for i, n in enumerate([10, 100, 1000, 5000, 20000]):
    CASES.append((f"rand{n}", rng.integers(0, 1 << 63, n).tolist()))
for i, n in enumerate([100, 3000]):
    ks = rng.integers(0, 1 << 42, n).tolist()
    CASES.append((f"randdup{n}", ks + rng.permutation(ks).tolist()))


@pytest.mark.parametrize("name,keys", CASES, ids=[c[0] for c in CASES])
def test_iteration_order_matches_libstdcxx(probe, name, keys):
    assert umap_iteration_order(keys) == run_probe(probe, keys)


def _run_probe_ops(probe, ops):
    inp = "\n".join(f"{op} {int(k)}" for op, k in ops).encode()
    p = subprocess.run([probe, "ops"], input=inp, capture_output=True,
                       check=True)
    return [int(x) for x in p.stdout.split()]


def test_erase_matches_libstdcxx(probe):
    from danbing_tk_tpu.utils.stdumap import StdUmapOrder

    rng2 = np.random.default_rng(77)
    for trial in range(8):
        n = int(rng2.integers(10, 3000))
        keys = rng2.integers(0, 1 << 40, n)
        ops = []
        live = []
        m = StdUmapOrder()
        for k in keys:
            k = int(k)
            if live and rng2.random() < 0.35:
                victim = int(live[rng2.integers(0, len(live))])
                ops.append(("e", victim))
                m.erase(victim)
                live = [x for x in live if x != victim]
            ops.append(("i", k))
            if m.insert(k):
                live.append(k)
        assert list(m) == _run_probe_ops(probe, ops), trial
