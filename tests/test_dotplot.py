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
