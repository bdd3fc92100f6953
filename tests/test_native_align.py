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
