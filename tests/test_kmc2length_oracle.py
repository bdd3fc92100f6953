"""kmc2length numeric cores vs the reference functions executed directly.

Both reference scripts are import-guarded, so their functions run here
(vntrutils satisfied by the statsmodels shim); module-level globals the
functions read (ctrlsize, args.ksize, nloci, config, badg) are injected.
The reference's *main* is not runnable as an oracle because its
loadvntrmat passes the output row as readKms' ki_tr argument (documented
in analysis/kmc2length.py) — the functions below are upstream of that.
"""

import importlib.util
import os
import sys
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

REF_DIR = "/root/reference/script"
STUBS = os.path.join(os.path.dirname(__file__), "stubs")


def _load(path, name):
    sys.path.insert(0, STUBS)
    sys.path.insert(0, REF_DIR)
    try:
        import matplotlib
        matplotlib.use("Agg")
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(STUBS)
        sys.path.remove(REF_DIR)


needs_ref = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, "kmc2length.py")),
    reason="reference checkout absent")


@needs_ref
def test_ctrl_cov_row_distance_len_pred_vs_reference():
    ref = _load(os.path.join(REF_DIR, "kmc2length.py"), "ref_kmc2length")
    from danbing_tk_tpu.analysis import kmc2length as ours

    rng = np.random.default_rng(31)
    nsamples, nregions, nloci = 6, 40, 25
    ctrlsize = rng.integers(500, 5000, nregions).astype(int)
    covmat = rng.normal(30, 4, (nsamples, nregions))
    covmat[:, 3] *= 5          # biased-mean region
    covmat[:, 7] = rng.normal(30, 40, nsamples)   # high-variance region

    ref.ctrlsize = ctrlsize
    want = ref.processCtrlBamCov(covmat)
    got = ours.process_ctrl_cov(covmat, ctrlsize)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    m1 = rng.normal(1, 0.2, (4, nloci))
    m2 = rng.normal(1, 0.2, (5, nloci))
    m1[0, 3] = 0
    m2[1, 5] = np.nan
    m1[2, 8] = 30          # IQR outlier
    for reject in (True, False):
        np.testing.assert_array_equal(
            ours.row_distance(m1, m2, reject=reject),
            ref.rowDistance(m1, m2, reject=reject))

    ref.nloci = nloci
    ref.args = SimpleNamespace(ksize=21)
    ilkms = rng.integers(0, 4000, nloci).astype(float)
    bias = rng.normal(1, 0.3, nloci)
    bias[4] = 0
    bias[9] = np.nan
    np.testing.assert_array_equal(
        ours.len_pred(ilkms, bias, 31.7, 21),
        ref.lenPred(ilkms, bias, 31.7))


@needs_ref
def test_seqrun_prior_donor_vs_reference():
    ref = _load(os.path.join(REF_DIR, "kmc2length.LOO.py"), "ref_loo")
    from danbing_tk_tpu.analysis.kmc2length import (row_distance,
                                                    seqrun_prior_donor)

    rng = np.random.default_rng(37)
    gs = np.array([f"g{i}" for i in range(8)])
    runs = np.array(["runA", "runA", "runB", "runB", "individual",
                     "runA", "runB", "runA"])
    ref.config = pd.DataFrame({"genome": gs, "sequencing_run": runs})
    ref.badg = np.array(["g5"])

    mat = rng.normal(1, 0.3, (8, 30))
    dis = row_distance(mat, mat, reject=False)
    srt = np.argsort(dis, axis=1)

    want = ref.getBestUsingSeqrunPrior(srt, gs)
    got = seqrun_prior_donor(dis, runs, bad_donors=[5])
    np.testing.assert_array_equal(got, want)
