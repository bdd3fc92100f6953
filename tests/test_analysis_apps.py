"""SelectRegions / liftbed.clean byte-exact; linreg + kmc2length spec."""

import io
import os

import numpy as np

GOLD = os.path.join(os.path.dirname(__file__), "golden_misc")


def test_select_regions_byte_exact(tmp_path):
    from danbing_tk_tpu.apps.select_regions import select_regions

    select_regions(os.path.join(GOLD, "regions.bed"),
                   os.path.join(GOLD, "ref.fa"), str(tmp_path / "out.fa"))
    assert (tmp_path / "out.fa").read_bytes() == open(
        os.path.join(GOLD, "regions.golden.fa"), "rb").read()


def test_liftbed_clean_byte_exact(tmp_path):
    from danbing_tk_tpu.apps.liftbed_clean import liftbed_clean

    rows = [line.split("\t") for line in
            open(os.path.join(GOLD, "lift.bed")).read().splitlines()]
    out = io.StringIO()
    liftbed_clean(rows, out)
    assert out.getvalue() == open(
        os.path.join(GOLD, "lift.clean.golden.bed")).read()


def test_linreg_spec(tmp_path):
    from danbing_tk_tpu.analysis.linreg import (linreg, ols_no_intercept,
                                                regress_locus)

    rng = np.random.default_rng(0)
    x = rng.integers(1, 30, 500).astype(float)
    y = 2.0 * x
    a, _, r2 = ols_no_intercept(x, y)
    assert abs(a - 2.0) < 1e-12 and abs(r2 - 1.0) < 1e-12
    # outlier rejection removes a wild point under invalid|bad (noise needed:
    # on a perfect fit the reference's 10-sigma rule degenerates to
    # rejecting everything and falling back to the unfiltered regression)
    y2 = y + rng.normal(0, 0.5, len(y))
    y2[0] = 1e6
    a2, r2_, pred = regress_locus(x, y2, "invalid|bad")
    assert abs(a2 - 2.0) < 0.05
    # file flow
    with open(tmp_path / "pb.kmers", "w") as f, \
            open(tmp_path / "il.kmers", "w") as g:
        for li in range(3):
            f.write(f">{li}\n")
            g.write(f">{li}\n")
            for i, v in enumerate(x):
                f.write(f"{i}\t{int(v)}\n")
                g.write(f"{i}\t{int(2 * v)}\n")
    res = linreg(str(tmp_path / "pb.kmers"), str(tmp_path / "il.kmers"),
                 str(tmp_path / "out.pred"))
    assert res.shape == (3, 4)
    assert np.allclose(res[:, 2], 2.0)           # slope
    assert np.allclose(res[:, 1], res[:, 0])     # pred == truth at slope 2
    assert os.path.getsize(tmp_path / "out.pred")


def test_kmc2length_spec():
    from danbing_tk_tpu.analysis.kmc2length import (iqr_mask, kmc2length,
                                                    len_pred, row_distance)

    # len_pred: kmc / (cov * bias) with k-1 correction
    est = len_pred(np.array([600.0, 0.5, 0.0]), np.array([1.0, 1.0, 0.0]),
                   30.0, 21)
    assert est[0] == 600 / 30 + 20
    assert est[1] == 0.5 / 30 * 21
    assert np.isnan(est[2])
    # row_distance: identical rows -> 0 distance
    m = np.abs(np.random.default_rng(1).normal(1, 0.05, (3, 40)))
    d = row_distance(m, m, reject=False)
    assert np.allclose(np.diag(d), 0)
    assert (np.argmin(d, axis=1) == np.arange(3)).all()
    # end-to-end: sample 0 should pick donor 0 and recover length
    trbias_db = np.ones((3, 5))
    ests = kmc2length(np.full((3, 5), 3000.0), m, trbias_db, m,
                      np.full(3, 30.0), 21)
    assert np.allclose(ests, 3000 / 30 + 20)
    assert iqr_mask(np.array([1, 1, 1, 1, 100.0]))[-1]


def test_seqrun_prior_donor():
    """getBestUsingSeqrunPrior (kmc2length.LOO.py:107-120): nearest donor
    sharing the sample's sequencing run; 'individual' accepts any run;
    bad donors are skipped."""
    import numpy as np

    from danbing_tk_tpu.analysis.kmc2length import seqrun_prior_donor

    dis = np.array([
        [0.0, 0.1, 0.2, 0.3],   # sample 0: nearest donor 1 (run B) skipped
        [0.4, 0.0, 0.1, 0.2],   # sample 1 ('individual'): any run ok
        [0.3, 0.1, 0.0, 0.2],   # sample 2: nearest valid is bad -> next
    ])
    runs = ["A", "individual", "B"]
    runs_db = ["A", "B", "B", "A"]
    # sample 0: order 0,1,2,3 -> donor 0 shares run A
    # sample 1: order 1,2,3,0 -> donor 1 (any run accepted)
    # sample 2: order 2,1,3,0 -> 2 is bad, 1 shares run B
    chosen = seqrun_prior_donor(dis, runs, runs_db, bad_donors={2})
    assert chosen.tolist() == [0, 1, 1]
    # no qualifying donor falls back to 0 (reference zero-init semantics)
    chosen2 = seqrun_prior_donor(np.array([[0.1, 0.0]]), ["C"], ["A", "B"])
    assert chosen2.tolist() == [0]
