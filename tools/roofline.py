#!/usr/bin/env python
"""Per-stage roofline for the align step (VERDICT r2 'weak' #7).

The step is gather-descriptor-bound, not FLOP- or bandwidth-bound; this
tool makes that claim auditable by computing, per pipeline stage, the
analytic floors from the actual table geometry:

  * descriptor floor: rows-gathered x 9 ns (the microbenched per-row
    cost of the TPU gather unit, independent of row width 32-128 B —
    PERF.md round-2 microbench)
  * HBM bandwidth floor: bytes-moved / 820 GB/s (v5e-class)
  * MXU floor for the vote-expansion one-hot matmul

and (with DTK_ROOFLINE_MEASURE=1, on the chip) re-measuring each
stage's delta via the DEBUG_STOP bisect to report utilization against
the binding floor.

Run: python tools/roofline.py            (analytic table only)
     DTK_ROOFLINE_MEASURE=1 python tools/roofline.py   (on TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GATHER_NS_PER_ROW = 9.0        # microbenched, PERF.md round 2
HBM_GBPS = 820.0               # v5e-class
MXU_TFLOPS_BF16 = 197.0        # v5e-class


def main():
    from danbing_tk_tpu.engine import device_align as da
    from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG
    from danbing_tk_tpu.index import device_table as dt
    from tools.make_bench_rpgg import build

    root = os.path.join(os.path.dirname(__file__), "..")
    nloci = int(os.environ.get("DTK_BENCH_NLOCI", 512))
    P = int(os.environ.get("DTK_BENCH_PAIRS", 4096))
    E = int(os.environ.get("DTK_BENCH_E", 512))
    L, k = 160, 21
    pan = build(os.path.join(
        root, "build", f"bench_rpgg{'' if nloci == 512 else nloci}"),
        nloci)
    rpgg = RPGG(pan)
    drp = da.DeviceRPGG.build(rpgg, with_tre=False)
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1)

    NKW = L - k + 1
    nq = 2 * P * NKW                    # probed lanes per step

    def tab_geom(tab):
        W = 2 + int(tab.composite) + tab.nval
        return len(tab.levels), W * dt.BUCKET * 4

    stages = []

    def add(name, rows, row_bytes, flops=0.0, note=""):
        desc_ms = rows * GATHER_NS_PER_ROW * 1e-6
        bw_ms = rows * row_bytes / (HBM_GBPS * 1e6)
        mxu_ms = flops / (MXU_TFLOPS_BF16 * 1e9)
        stages.append(dict(stage=name, rows=rows, row_B=row_bytes,
                           desc_ms=desc_ms, bw_ms=bw_ms, mxu_ms=mxu_ms,
                           floor_ms=max(desc_ms, bw_ms, mxu_ms),
                           note=note))

    dlv, drow = tab_geom(drp.dbi_tab)
    add("dbi probe", nq * dlv, drow, note=f"{dlv} levels x {nq} lanes")
    # vote: dedupe sort (compute), nmapped vv gather (8-lane rows: one
    # 32 B row per multi-locus entry; bound by W entries/pair), and the
    # covering-run one-hot expansion matmul
    Wd = 2 * NKW                        # dedup width per pair
    add("vote vv gather", P * Wd, 32, note="nmapped rows, 8-lane")
    add("vote expand matmul", 0, 0,
        flops=2.0 * P * Wd * E, note=f"(P,{Wd})x({Wd},{E}) one-hot")
    tlv, trow = tab_geom(drp.trfl_tab)
    add("annot probe", nq * tlv, trow, note=f"{tlv} levels x {nq} lanes")
    add("count scatter", nq, 16, note="scatter-add descriptors")

    meas = {}
    if os.environ.get("DTK_ROOFLINE_MEASURE"):
        import jax

        from danbing_tk_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        from danbing_tk_tpu.apps.fa2kmers import read_fasta_seqs
        from tools.bench_e2e import synth_reads
        from danbing_tk_tpu.ops import kmers_np as K

        rng = np.random.default_rng(3)
        seqs = read_fasta_seqs(os.path.join(os.path.dirname(pan),
                                            "hap0.fa"))
        codes = np.full((2 * P, L), 255, np.uint8)
        rlen = np.full(2 * P, L, np.int32)
        pool = [s for s in seqs if len(s) >= 500]
        for i in range(P):
            s = pool[int(rng.integers(len(pool)))]
            b = int(rng.integers(0, len(s) - 500 + 1))
            c = K.encode_bases(s[b:b + 500])
            codes[2 * i, :L] = c[:L]
            codes[2 * i + 1, :L] = 3 - c[500 - L:][::-1]
        live = np.ones(P, bool)

        # cumulative bisect: DEBUG_STOP after each stage
        marks = [("probe", "extract+probe+filters"),
                 ("vote", "vote"), ("annot", "annot"),
                 (None, "full")]
        prev = 0.0
        for stop, label in marks:
            da.DEBUG_STOP = stop
            step = da.make_step(drp, cfg, P, L, expand_cap=E,
                                with_annot=False)
            st = da.init_state(drp)
            key = "x" if stop else "referee"
            st, out = step(st, codes, rlen, live)
            jax.block_until_ready(out[key])
            t0 = time.time()
            nrep = 10
            for _ in range(nrep):
                st, out = step(st, codes, rlen, live)
            _ = int(np.asarray(out[key]).sum())
            cum = (time.time() - t0) / nrep * 1e3
            meas[label] = cum - prev
            prev = cum
        da.DEBUG_STOP = None
        print(f"# measured cumulative full step: {prev:.1f} ms",
              file=sys.stderr)

    print(f"{'stage':<22}{'rows':>12}{'desc ms':>9}{'bw ms':>8}"
          f"{'mxu ms':>8}{'floor ms':>9}  note")
    tot = 0.0
    for s in stages:
        tot += s["floor_ms"]
        print(f"{s['stage']:<22}{s['rows']:>12}{s['desc_ms']:>9.2f}"
              f"{s['bw_ms']:>8.2f}{s['mxu_ms']:>8.3f}"
              f"{s['floor_ms']:>9.2f}  {s['note']}")
    print(f"{'TOTAL descriptor floor':<22}{'':>12}{'':>9}{'':>8}{'':>8}"
          f"{tot:>9.2f}")
    if meas:
        print("\nmeasured stage deltas (ms):",
              json.dumps({k: round(v, 1) for k, v in meas.items()}))
        full = sum(meas.values())
        print(f"gather-floor utilization of full step: "
              f"{100 * tot / full:.0f}% (floor {tot:.1f} / measured "
              f"{full:.1f} ms)")


if __name__ == "__main__":
    main()
