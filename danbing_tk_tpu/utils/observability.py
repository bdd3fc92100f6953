"""Observability: structured per-stage counters + JAX profiler hooks
(replaces the reference's stderr prose logging and commented-out
gperftools hooks, SURVEY §5).

The device step already accumulates the read-funnel counters as a device
array (stats[0..8]); this module renders them and wraps profiling.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time

import numpy as np

STAT_NAMES = [
    "nReads", "nShort(pairs)", "nSubFiltered", "nKmerFiltered",
    "nLocusAssignFiltered", "nThreadingReads", "nAsgnReads",
    "nQCFiltered", "nBaitFiltered",
]


def funnel_report(stats, host_stats: dict | None = None, out=sys.stderr):
    """Render the read-filter funnel (reference stderr summary,
    aQueryFasta_thread.cpp:2617-2627), merging device + host counters."""
    s = {name: int(v) for name, v in zip(STAT_NAMES, np.asarray(stats))}
    if host_stats:
        for k, v in host_stats.items():
            if k in s:
                s[k] += int(v)
            elif k == "nShort":
                s["nShort(pairs)"] += int(v)
    for k, v in s.items():
        print(f"{k}: {v}", file=out)
    return s


@contextlib.contextmanager
def stage_timer(name: str, log=None):
    t0 = time.time()
    yield
    dt = time.time() - t0
    rec = {"stage": name, "seconds": round(dt, 4)}
    print(json.dumps(rec), file=log or sys.stderr)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace wrapper (view in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
