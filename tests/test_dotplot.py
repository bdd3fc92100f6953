"""Dot-plot contamination core: planted leak detected in the right quadrant."""

import numpy as np

from danbing_tk_tpu.analysis.dotplot import cross_contamination, \
    shared_kmer_points


def test_contamination_detection():
    rng = np.random.default_rng(4)
    motif = "".join("ACGT"[i] for i in rng.integers(0, 4, 9))
    fs = 60
    tr = motif * 30

    def rand(n):
        return "".join("ACGT"[i] for i in rng.integers(0, 4, n))

    # clean pair: no shared TR kmers in flanks
    lf0, rf0, lf1, rf1 = rand(fs), rand(fs), rand(fs), rand(fs)
    c0 = lf0 + tr + rf0
    c1 = lf1 + tr + rf1
    # baseline: only boundary-straddling kmers may register (a real
    # property of the reference definition)
    bad, _ = cross_contamination(c0, c1, ksize=21, fs=fs)
    assert bad[0] == 0  # no left-flank leak yet
    # plant a motif copy in ctg0's left flank -> 0L contamination
    lf0b = lf0[: fs - 3 * len(motif)] + motif * 3
    c0b = lf0b + tr + rf0
    bad2, pts = cross_contamination(c0b, c1, ksize=21, fs=fs)
    assert bad2[0] > 0
    assert len(pts[0]) == bad2.sum()
    # dot plot diagonal exists for identical TRs
    xs, ys = shared_kmer_points(c0, c1, 21)
    assert len(xs) > len(tr)


def test_contamination_report_and_self_repeat():
    """plotCrossContamination's summary stat + visSelfRepeat
    (vntrutils.py:452-519) numeric cores."""
    import numpy as np

    from danbing_tk_tpu.analysis.dotplot import (contamination_report,
                                                 self_repeat)

    rng = np.random.default_rng(5)
    fs = 60
    motif = "ACGGTCAGT"
    tr = motif * 30

    def rand(n):
        return "".join("ACGT"[i] for i in rng.integers(0, 4, n))

    clean = rand(fs) + tr + rand(fs)
    leaky_lf = rand(fs - 3 * len(motif)) + motif * 3
    leaky = leaky_lf + tr + rand(fs)

    rep = contamination_report(leaky, clean, ksize=21, fs=fs)
    assert rep["badkmc"][0] > 0
    assert rep["rate_pct"] == 100.0 * rep["badkmc"].sum() / (2 * len(tr))
    assert len(rep["points"][0]) >= len(rep["bad_points"][0])

    # a pure-random sequence has no self-repeat beyond the main diagonal
    srep = self_repeat(rand(fs) + rand(200) + rand(fs), ksize=13, fs=fs)
    assert srep["badkmc"].sum() == 0
    # a tandem repeat contaminates its own flank windows when the motif
    # recurs there
    srep2 = self_repeat(leaky, ksize=13, fs=fs)
    assert srep2["badkmc"].sum() > 0
