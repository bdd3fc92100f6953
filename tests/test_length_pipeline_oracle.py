"""`length` CLI (P8/P9 end-to-end) vs the reference's own functions.

The reference main (script/kmc2length.py:119-139) is bit-rotted at HEAD
(loadvntrmat passes the output row as readKms' ki_tr), so the oracle
executes the reference's OWN functions wired per the intended main:
loadLSB -> processCtrlBamCov -> vntrutils.readKms(f, ki_tr) ->
BiasCorrectedLenPred -> SaveEstErr, and asserts our CLI writes a
byte-identical estimated_TR_len.tsv from the same inputs."""

import importlib.util
import os
import subprocess
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REF_DIR = "/root/reference/script"
STUBS = os.path.join(os.path.dirname(__file__), "stubs")

needs_ref = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, "kmc2length.py")),
    reason="reference checkout absent")


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


def make_fixture(tmp_path, nloci=12, nctrl=30, ndb=4, nsamples=3,
                 seed=5):
    rng = np.random.default_rng(seed)
    d = tmp_path / "fix"
    d.mkdir()
    # trbed: nloci rows, ids become '_'.join(row)
    trbed = np.array([[f"chr{1+i%2}", str(1000 * i), str(1000 * i + 500)]
                      for i in range(nloci)], dtype=object)
    np.savetxt(d / "tr.bed", trbed, fmt="%s", delimiter="\t")
    # LSB: nctrl non-TR rows (names encode ctrl sizes after a 4-char
    # prefix) then nloci TR rows; columns = panel genomes
    ctrl_lo = rng.integers(100, 5000, nctrl)
    ctrl_sz = rng.integers(200, 2000, nctrl)
    names = [f"ctr.chr1_{lo}_{lo+sz}" for lo, sz in zip(ctrl_lo, ctrl_sz)]
    names += [f"tr_{i}" for i in range(nloci)]
    ntr_db = 1.0 + 0.2 * rng.standard_normal((nctrl, ndb))
    tr_db = np.abs(1.0 + 0.3 * rng.standard_normal((nloci, ndb)))
    tr_db[0, :] = 0.0                      # a bias-less locus -> nan est
    cols = [f"g{j}" for j in range(ndb)]
    with open(d / "lsb.tsv", "w") as f:
        f.write("\t" + "\t".join(cols) + "\n")
        for n, row in zip(names, np.vstack([ntr_db, tr_db])):
            f.write(n + "\t" + "\t".join(repr(float(v)) for v in row)
                    + "\n")
    # coverage table: cols 0-1 metadata, 2+ per-ctrl-region coverage
    covmat = np.abs(30 + 5 * rng.standard_normal((nsamples, nctrl)))
    with open(d / "cov.txt", "w") as f:
        for i in range(nsamples):
            f.write(f"s{i}\tx\t" + "\t".join(
                repr(float(v)) for v in covmat[i]) + "\n")
    # ksi + per-sample count-only kmer files
    per_locus = rng.integers(3, 9, nloci)
    ksi = np.cumsum(per_locus)
    np.savetxt(d / "pan.ksi", ksi, fmt="%d")
    files = []
    for i in range(nsamples):
        counts = rng.integers(0, 50, int(ksi[-1]))
        p = d / f"s{i}.kms"
        np.savetxt(p, counts, fmt="%d")
        files.append(str(p))
    with open(d / "kmers.txt", "w") as f:
        f.write("\n".join(files) + "\n")
    return d, trbed, covmat, ksi, files


@needs_ref
def test_length_cli_vs_reference_functions(tmp_path):
    d, trbed, covmat, ksi, files = make_fixture(tmp_path)
    nloci = trbed.shape[0]

    # ---- our CLI ----
    out_ours = tmp_path / "ours"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "danbing_tk_tpu", "length",
         "--outdir", str(out_ours), "--ksize", "21",
         "--kmers", str(d / "kmers.txt"), "--trbed", str(d / "tr.bed"),
         "--LSB", str(d / "lsb.tsv"), "--cov", str(d / "cov.txt"),
         "--ksi", str(d / "pan.ksi")],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]

    # ---- reference functions, wired per the intended main ----
    ref = _load(os.path.join(REF_DIR, "kmc2length.py"), "ref_kmc2len")
    ref.nloci = nloci
    ref.args = SimpleNamespace(ksize=21)
    (ref.trbiasmat_db, ref.ntrbiasmat_db, _dbg,
     ref.ctrlsize) = ref.loadLSB(str(d / "lsb.tsv"))
    raw = np.loadtxt(str(d / "cov.txt"), dtype=object, ndmin=2)
    ref.pbamcov, _, ref.ntrbiasmat = ref.processCtrlBamCov(
        raw[:, 2:].astype(float))
    sys.path.insert(0, STUBS)
    sys.path.insert(0, REF_DIR)
    try:
        from vntrutils import readKms
    finally:
        sys.path.remove(STUBS)
        sys.path.remove(REF_DIR)
    # the intended loadvntrmat: readKms with a REAL ki_tr index
    ref.trmat = np.array([readKms(f, list(ksi)) for f in files],
                         dtype=int)
    ests = ref.BiasCorrectedLenPred()
    ref.trbed = trbed
    out_ref = tmp_path / "ref"
    out_ref.mkdir()
    ref.SaveEstErr(ests, outdir=str(out_ref))

    ours = (out_ours / "estimated_TR_len.tsv").read_bytes()
    want = (out_ref / "estimated_TR_len.tsv").read_bytes()
    assert ours == want


def test_length_semantics_unit_bias(tmp_path):
    """With unit biases and no coverage outliers, est = kms/cov + (k-1)
    for counts >= cov (len_pred's bp correction)."""
    from danbing_tk_tpu.analysis.length_pipeline import run_length

    d, trbed, covmat, ksi, files = make_fixture(
        tmp_path, nloci=6, nctrl=20, ndb=2, nsamples=2, seed=9)
    # rewrite LSB with unit biases everywhere
    lsb = (d / "lsb.tsv").read_text().splitlines()
    out = [lsb[0]]
    for line in lsb[1:]:
        name = line.split("\t")[0]
        out.append(name + "\t1.0\t1.0")
    (d / "lsb.tsv").write_text("\n".join(out) + "\n")
    ests = run_length(str(tmp_path / "o2"), 21, str(d / "kmers.txt"),
                      str(d / "tr.bed"), str(d / "lsb.tsv"),
                      str(d / "cov.txt"), ksi_path=str(d / "pan.ksi"))
    from danbing_tk_tpu.analysis.kmc2length import (process_ctrl_cov,
                                                    read_locus_sums)
    from danbing_tk_tpu.analysis.length_pipeline import load_lsb

    _, _, _, ctrlsize = load_lsb(str(d / "lsb.tsv"), trbed.shape[0])
    pcov, _, _ = process_ctrl_cov(covmat, ctrlsize)
    for i, f in enumerate(files):
        kms = read_locus_sums(f, list(ksi))
        exp = kms / pcov[i]
        exp = np.where(exp >= 1, exp + 20, exp * 21)
        np.testing.assert_allclose(ests[i], exp, rtol=1e-12)


def test_length_seqrun_prior(tmp_path):
    """--seqruns switches the donor pick to the LOO seqrun prior."""
    from danbing_tk_tpu.analysis.length_pipeline import run_length

    d, trbed, covmat, ksi, files = make_fixture(
        tmp_path, nloci=6, nctrl=20, ndb=3, nsamples=2, seed=11)
    with open(d / "runs.txt", "w") as f:
        f.write("s0\trunA\ns1\trunB\n")
    with open(d / "dbruns.txt", "w") as f:
        f.write("g0\trunB\ng1\trunA\ng2\trunB\n")
    ests = run_length(str(tmp_path / "o3"), 21, str(d / "kmers.txt"),
                      str(d / "tr.bed"), str(d / "lsb.tsv"),
                      str(d / "cov.txt"), ksi_path=str(d / "pan.ksi"),
                      seqruns=str(d / "runs.txt"),
                      db_seqruns=str(d / "dbruns.txt"))
    assert ests.shape == (2, 6)
    assert np.isfinite(ests[:, 1:]).any()
