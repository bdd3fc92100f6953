"""Cross-contamination QC vs the reference vntrutils run as an oracle.

plotCrossContamination(ax=None, reportbad=True) is a pure numeric path
(no matplotlib draw), so the reference module executes directly with
the statsmodels shim; the badkmc 4-vector (0L/0R/1L/1R contaminated
k-mer counts) must match analysis/dotplot.cross_contamination exactly.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/script/vntrutils.py"
STUBS = os.path.join(os.path.dirname(__file__), "stubs")


def _load_ref():
    sys.path.insert(0, STUBS)
    sys.path.insert(0, os.path.dirname(REF))
    try:
        import matplotlib
        matplotlib.use("Agg")
        spec = importlib.util.spec_from_file_location("ref_vntrutils", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(STUBS)
        sys.path.remove(os.path.dirname(REF))


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference checkout absent")
def test_cross_contamination_vs_reference(tmp_path):
    ref = _load_ref()
    rng = np.random.default_rng(23)
    FS, K = 120, 21

    def synth(tr_core, trlen):
        tr = (tr_core * (trlen // len(tr_core) + 1))[:trlen]
        lf = "".join("ACGT"[i] for i in rng.integers(0, 4, FS))
        rf = "".join("ACGT"[i] for i in rng.integers(0, 4, FS))
        return lf + tr + rf

    core = "".join("ACGT"[i] for i in rng.integers(0, 4, 37))
    ctg0 = synth(core, 400)
    # ctg1 shares the motif AND leaks TR sequence into its left flank
    # (planted contamination)
    ctg1 = synth(core, 300)
    ctg1 = ctg1[:40] + core + ctg1[40 + len(core):]

    from danbing_tk_tpu.analysis.dotplot import cross_contamination

    for a, b in [(ctg0, ctg1), (ctg0, ctg0), (ctg1, ctg1)]:
        want = ref.plotCrossContamination(a, b, ksize=K, FS=FS, ax=None,
                                          silent=True, reportbad=True)
        got, _ = cross_contamination(a, b, ksize=K, fs=FS)
        np.testing.assert_array_equal(got, np.asarray(want))
    # the planted leak must actually register
    badkmc, _ = cross_contamination(ctg0, ctg1, ksize=K, fs=FS)
    assert badkmc.sum() > 0
