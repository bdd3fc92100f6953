#!/usr/bin/env python
"""Single-chip align throughput benchmark.

Measures steady-state reads/s of the jitted device align step (k-mer
extraction -> kmerDBi probe -> filters -> locus voting -> assignTRkmc ->
count scatter-add) on whatever accelerator JAX selects (the driver runs
this on one real TPU chip).

Baseline: the reference `danbing-tk align` genotypes one 30x SRS sample in
~12 CPU-hours (README.md:42).  30x human coverage at 2x150bp is ~6.2e8
reads, so the reference does ~14.4k reads/s per CPU core-equivalent.
vs_baseline = our reads/s/chip over that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_READS_PER_SEC = 6.2e8 / (12 * 3600)  # ~14.35k reads/s/core


def main():
    import jax
    import numpy as np

    from __graft_entry__ import _example_batch
    from danbing_tk_tpu.engine import device_align as da
    from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG

    golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "golden")
    P = int(os.environ.get("DTK_BENCH_PAIRS", 4096))
    L = 160
    nsteps = int(os.environ.get("DTK_BENCH_STEPS", 8))

    rpgg = RPGG(os.path.join(golden, "pan"))
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1)
    drp = da.DeviceRPGG.build(rpgg, with_tre=False)
    step = da.make_step(drp, cfg, P, L, with_annot=False)
    state = da.init_state(drp)
    codes, rlen, live = _example_batch(P, L, seed=1)

    t0 = time.time()
    state, out = step(state, codes, rlen, live)
    jax.block_until_ready(out["vote_pass"])
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(nsteps):
        state, out = step(state, codes, rlen, live)
    jax.block_until_ready(out["vote_pass"])
    dt = time.time() - t0
    reads_per_sec = nsteps * 2 * P / dt

    print(json.dumps({
        "metric": "align_reads_per_sec_per_chip",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / REF_READS_PER_SEC, 3),
    }))
    print(f"# device={jax.devices()[0]} compile={compile_s:.1f}s "
          f"steady={dt/nsteps*1e3:.1f}ms/step P={P}", file=sys.stderr)


if __name__ == "__main__":
    main()
