"""kmers.linreg vs the reference script executed as an oracle.

statsmodels is absent here, so the reference runs with a documented
numpy-backed shim (tests/stubs/statsmodels) that implements the three
attributes vntrutils touches via np.linalg.lstsq — an implementation
independent of the repo's closed-form OLS, making the comparison
non-circular.  The formatted .pred tables must be byte-identical.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF_SCRIPT = "/root/reference/script/kmers.linreg.py"
STUBS = os.path.join(os.path.dirname(__file__), "stubs")


def _write_kmers(path, loci_counts):
    with open(path, "w") as f:
        for li, counts in enumerate(loci_counts):
            f.write(f">{li}\n")
            for i, c in enumerate(counts):
                f.write(f"{1000 + 7 * i}\t{c}\n")


@pytest.mark.skipif(not os.path.exists(REF_SCRIPT),
                    reason="reference checkout absent")
@pytest.mark.parametrize("mode", ["invalid", "invalid|bad",
                                  "invalid|bad|zero"])
def test_linreg_vs_reference_script(tmp_path, mode):
    rng = np.random.default_rng(5)
    pb, il = [], []
    for li in range(10):
        n = int(rng.integers(3, 40))
        x = rng.integers(0, 60, n)
        noise = rng.normal(0, 2, n)
        y = np.maximum(0, (2.1 * x + noise)).astype(int)
        if li == 3:
            y[0] = 100000          # gross outlier -> 'bad' rejection
        if li == 5:
            x = np.zeros(n, dtype=int)   # zero-only locus
        if li == 7:
            x, y = x[:0], y[:0]          # empty locus
        pb.append(x)
        il.append(y)
    _write_kmers(tmp_path / "pb.kmers", pb)
    _write_kmers(tmp_path / "il.kmers", il)

    env = dict(os.environ,
               PYTHONPATH=f"{STUBS}:{os.path.dirname(REF_SCRIPT)}")
    r = subprocess.run(
        [sys.executable, REF_SCRIPT, str(tmp_path / "pb.kmers"),
         str(tmp_path / "il.kmers"), str(tmp_path / "ref_out"),
         "--mode", mode],
        env=env, capture_output=True, text=True, timeout=300)

    from danbing_tk_tpu.analysis.linreg import linreg

    if mode == "invalid|bad|zero":
        # reference bug: RejectOutlier's `return rule == 1 and (...)`
        # returns False for rule 2, crashing its own documented mode
        # (vntrutils.py:289-290).  We implement the intended semantics;
        # pin the reference's failure so drift is visible.
        assert r.returncode != 0
        assert "cannot unpack non-iterable bool" in r.stderr
        linreg(str(tmp_path / "pb.kmers"), str(tmp_path / "il.kmers"),
               str(tmp_path / "our.pred"), outlier=mode)
        assert (tmp_path / "our.pred").exists()
        return

    assert r.returncode == 0, r.stderr + r.stdout
    linreg(str(tmp_path / "pb.kmers"), str(tmp_path / "il.kmers"),
           str(tmp_path / "our.pred"), outlier=mode)

    want = (tmp_path / "ref_out.pred").read_bytes()
    got = (tmp_path / "our.pred").read_bytes()
    assert got == want
