"""danbing-tk-pred vs the reference binary compiled against eigen_lite.

The reference vendors Eigen as an empty submodule, so the real library is
unavailable — tools/eigen_lite/Eigen/Core is a minimal documented
Eigen-compatible subset that compiles src/pred.cpp UNMODIFIED.  The
oracle validates the reference's loaders (endian-explicit ikmer.meta,
col-major .trkmc.ar stacking), normalization pipeline, skipped-locus
handling, and all three output files against analysis/pred.py.

eigen_lite zero-initializes (real Eigen leaves Bias columns of skipped
loci uninitialized — pred.h:213-233), pinning that case to the 0
convention analysis/pred.py documents.
"""

import os
import subprocess

import numpy as np
import pytest

from danbing_tk_tpu.io import binary as bio

REF_SRC = "/root/reference/src/pred.cpp"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_ref_pred():
    out = os.path.join(ROOT, "build", "ref_pred")
    if not os.path.exists(out) or \
            os.path.getmtime(out) < os.path.getmtime(
                os.path.join(ROOT, "tools", "eigen_lite", "Eigen", "Core")):
        subprocess.run(
            ["g++", "-O2", "-std=c++14",
             "-I", os.path.join(ROOT, "tools", "eigen_lite"),
             "-o", out, REF_SRC], check=True)
    return out


@pytest.mark.skipif(not os.path.exists(REF_SRC),
                    reason="reference checkout absent")
def test_pred_vs_reference_binary(tmp_path):
    ref_pred = _build_ref_pred()
    rng = np.random.default_rng(41)
    # >= 10 loci/samples/kmers: pred.cpp prints seqN(0,10) slices
    n_tr, ns = 12, 12
    nk_per = rng.integers(2, 8, n_tr)
    nk_cum = np.cumsum(nk_per).astype(np.uint32)
    nk = int(nk_cum[-1])
    iki, ikc, nik = [], [], []
    for tri in range(n_tr):
        si = int(nk_cum[tri - 1]) if tri else 0
        n_ik = 0 if tri in (1, 7) else int(rng.integers(1, 3))
        for j in range(n_ik):
            iki.append(si + j)
            ikc.append(int(rng.integers(1, 4)))
        nik.append(n_ik)
    nik_cum = np.cumsum(nik).astype(np.uint32)
    bio.write_ikmer_meta(tmp_path / "ikmer.meta", nk_cum, nik_cum,
                         np.array(iki, np.uint32), np.array(ikc, np.uint8))

    fns, rds = [], []
    for s in range(ns):
        counts = rng.integers(0, 300, nk).astype(np.uint64)
        p = tmp_path / f"s{s}.trkmc.ar"
        bio.write_karray(str(p), counts)
        fns.append(str(p))
        rds.append(round(20 + 15 * rng.random(), 2))
    with open(tmp_path / "gt.meta", "w") as f:
        for p, rd in zip(fns, rds):
            f.write(f"{p}\t{rd}\n")

    r = subprocess.run(
        [ref_pred, str(tmp_path / "gt.meta"), str(tmp_path / "ikmer.meta"),
         str(tmp_path / "ref.raw"), str(tmp_path / "ref.cor"),
         str(tmp_path / "ref.bias")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr + r.stdout

    from danbing_tk_tpu.analysis.pred import run_pred

    run_pred(str(tmp_path / "gt.meta"), str(tmp_path / "ikmer.meta"),
             str(tmp_path / "our.raw"), str(tmp_path / "our.cor"),
             str(tmp_path / "our.bias"))

    for name in ("raw", "cor"):
        want = (tmp_path / f"ref.{name}").read_bytes()
        got = (tmp_path / f"our.{name}").read_bytes()
        assert got == want, f"{name} GT matrix differs"

    want = (tmp_path / "ref.bias").read_text()
    got = (tmp_path / "our.bias").read_text()
    assert got.rstrip("\n") == want.rstrip("\n"), "bias TSV differs"

    # and the jax path agrees with itself
    run_pred(str(tmp_path / "gt.meta"), str(tmp_path / "ikmer.meta"),
             str(tmp_path / "jx.raw"), str(tmp_path / "jx.cor"),
             str(tmp_path / "jx.bias"), use_jax=True)
    a = bio.read_gt_matrix(str(tmp_path / "jx.cor"))
    b = bio.read_gt_matrix(str(tmp_path / "our.cor"))
    np.testing.assert_allclose(a, b, rtol=1e-6)
