"""Native (C++) threading engine == Python threading engine, exactly.

The full-oracle test (test_threading_golden) already runs the native
engine by default; this one pins the two implementations against each
other directly (aln rows + accumulated counts) on a read subset, so a
regression in either is attributed immediately.
"""

import os

import numpy as np
import pytest

from danbing_tk_tpu.engine import native_thread
from danbing_tk_tpu.engine.host_align import AlignConfig, HostAligner, RPGG


@pytest.mark.skipif(not native_thread.available(),
                    reason="build/libdtk_thread.so not built")
def test_native_matches_python(golden_dir, tmp_path, monkeypatch):
    src = os.path.join(golden_dir, "reads.sim.fa")
    sub = tmp_path / "sub.fa"
    with open(src) as f:
        lines = f.readlines()
    sub.write_text("".join(lines[: 4 * 400]))  # 400 pairs

    def run(native: bool):
        if native:
            monkeypatch.delenv("DTK_NO_NATIVE_THREAD", raising=False)
        else:
            monkeypatch.setenv("DTK_NO_NATIVE_THREAD", "1")
        rpgg = RPGG(os.path.join(golden_dir, "pan"))
        cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                          simmode=2, threading=True, thread_cth=50,
                          maxncorrection=3, aln=True)
        al = HostAligner(rpgg, cfg)
        if native:
            assert al._nthr is not None
        else:
            assert al._nthr is None
        al.run_file(str(sub))
        return al.aln_rows, al.flat_counts(), dict(al.stats)

    aln_n, cnt_n, st_n = run(True)
    aln_p, cnt_p, st_p = run(False)
    assert aln_n == aln_p
    assert np.array_equal(cnt_n, cnt_p)
    assert st_n == st_p
