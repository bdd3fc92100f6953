"""Native-ingest device align == Python-ingest device align (counts)."""

import os

import numpy as np

from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG


def test_native_align_counts(golden_dir):
    reads = os.path.join(golden_dir, "reads.fa")
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, okam=False)
    a = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                          batch_pairs=1024, max_read_len=192)
    a.run_file(reads)
    b = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                          batch_pairs=1024, max_read_len=192)
    b.run_file_native(reads)
    np.testing.assert_array_equal(a.flat_counts(), b.flat_counts())
    # and both equal the reference golden .trkmc.ar
    from danbing_tk_tpu.io.binary import read_karray

    gold = read_karray(os.path.join(golden_dir, "out.trkmc.ar"))
    np.testing.assert_array_equal(b.flat_counts(), gold)


def test_native_align_prefiltered(golden_dir):
    """Two-phase prefilter path: identical counts, ~background pairs die
    in the cheap pass."""
    reads = os.path.join(golden_dir, "reads.fa")
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, okam=False)
    c = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                          batch_pairs=1024, max_read_len=192)
    c.run_file_native(reads, prefilter=True)
    from danbing_tk_tpu.io.binary import read_karray

    gold = read_karray(os.path.join(golden_dir, "out.trkmc.ar"))
    np.testing.assert_array_equal(c.flat_counts(), gold)
    assert c.n_prefiltered >= 200  # the background pairs


def test_hostq_prefilter_decision_identity(golden_dir):
    """Host-sampled-query prefilter must reproduce the device codes-path
    prefilter decisions bit-for-bit, including N bases, short reads, and
    empty rows."""
    from danbing_tk_tpu.engine import device_align as da
    from danbing_tk_tpu.ops import kmers_np as K

    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, okam=False)
    rpgg = RPGG(os.path.join(golden_dir, "pan"))
    drp = da.DeviceRPGG.build(rpgg, with_tre=False)
    P, L = 128, 192
    pre = da.make_prefilter_step(drp, cfg, P, L)
    pre_q = da.make_prefilter_step_q(drp, cfg, P)

    rng = np.random.default_rng(3)
    for trial in range(4):
        codes = rng.integers(0, 4, (2 * P, L)).astype(np.uint8)
        rlen = rng.integers(0, L + 1, 2 * P).astype(np.int32)
        # sprinkle Ns inside reads; pad tails with 255
        nmask = rng.random((2 * P, L)) < 0.03
        codes[nmask] = 255
        for i in range(2 * P):
            codes[i, rlen[i]:] = 255
        live = rng.random(P) < 0.9
        want = np.asarray(pre(codes, rlen, live))
        qlo, qhi, valid, nonshort = K.sample_subfilter_queries(
            codes, rlen, cfg.ksize, cfg.n_filter)
        got = np.asarray(pre_q(qlo, qhi, valid, nonshort, live))
        np.testing.assert_array_equal(want, got)


def test_native_prefilter_fastq_bait(golden_dir):
    """The full production flagship combination in one test: native C++
    fastq ingest + device prefilter + quality-masked bait filter.
    Counts must equal the Python-ingest device runner (itself validated
    byte-exact against the reference's fastq+bait golden)."""
    reads = os.path.join(golden_dir, "reads.sim.fq")
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      bait=True, is_fastq=True, okam=False)
    a = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan"), bait=True),
                          cfg, batch_pairs=1024, max_read_len=192)
    a.run_file(reads)
    b = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan"), bait=True),
                          cfg, batch_pairs=1024, max_read_len=192)
    b.run_file_native(reads, prefilter=True)
    np.testing.assert_array_equal(a.flat_counts(), b.flat_counts())
    nm_a = np.asarray(a.state["nmapread"])[:-1] + a.host.nmapread
    nm_b = np.asarray(b.state["nmapread"])[:-1] + b.host.nmapread
    np.testing.assert_array_equal(nm_a, nm_b)
