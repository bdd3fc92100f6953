"""Two-phase expansion (small-E primary step + big-E device retry of
overflowing pairs) must produce identical counts to a single big-E run,
with the overflow pairs resolved on device rather than the host referee."""

import os

import numpy as np

from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG


def test_retry_expand_counts_identical(golden_dir):
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      okam=False)
    reads = os.path.join(golden_dir, "reads.fa")

    ref = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                            batch_pairs=512, max_read_len=192)
    ref.run_file_native(reads)

    # E=48 overflows nearly every pair (a 150bp pair probes ~260 kmers),
    # so the retry path and its re-batching buffer get real traffic
    two = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                            batch_pairs=512, max_read_len=192,
                            expand_cap=48, retry_expand=512)
    two.run_file_native(reads)

    assert two.n_retried > 0
    # retried pairs resolve on device: host referee count must match the
    # big-E run's (same tie/test2 pairs), not inflate with overflow
    assert two.n_referee == ref.n_referee, (two.n_referee, ref.n_referee)
    np.testing.assert_array_equal(two.flat_counts(), ref.flat_counts())
    nm = np.asarray(two.state["nmapread"])[:-1] + two.host.nmapread
    nm_ref = np.asarray(ref.state["nmapread"])[:-1] + ref.host.nmapread
    np.testing.assert_array_equal(nm, nm_ref)
