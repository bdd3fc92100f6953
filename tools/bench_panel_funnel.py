#!/usr/bin/env python
"""Panel-funnel benchmark WORKER: one metric per process.

bench.py (the driver-facing orchestrator) runs this as a subprocess
under a hard timeout so a pathological compile or a contended host can
never take the other metrics down with it (the round-4 failure mode:
everything was measured in one process and one slow section lost every
already-measured number).  Emits exactly ONE JSON line on stdout the
moment the metric is measured; diagnostics go to stderr.

Panels (DTK_PF_PANEL):
  synthetic — 512-locus RNG panel (comparable across rounds r01+);
              metric `wgs_funnel_reads_per_sec_per_chip` (PRIMARY).
  real      — real-VNTR-motif panel with heavy cross-locus k-mer
              sharing (tools/make_real_panel.py), hg38 chr12 background;
              metric `wgs_funnel_real_panel_reads_per_sec`.

Soft deadline: DTK_PF_DEADLINE_TS (absolute epoch seconds).  The worker
checks it between steady passes and emits with however many passes fit
(>=1) rather than dying with nothing; short windows are flagged.

Measures the FULL production funnel: C reader ingest -> device
prefilter -> survivor repack -> device pipeline (+ retry ladder) ->
exact host referee.  Reference baseline: `danbing-tk align` genotypes a
30x SRS sample in ~12 CPU-hours (/root/reference/README.md:42) =
~14.35k reads/s per CPU core-equivalent.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF_READS_PER_SEC = 6.2e8 / (12 * 3600)  # ~14.35k reads/s/core


def spread_of(times):
    s = sorted(times)
    med = s[len(s) // 2]
    return (s[-1] - s[0]) / med if med else 0.0


def deadline_left():
    ts = float(os.environ.get("DTK_PF_DEADLINE_TS", 0) or 0)
    return (ts - time.time()) if ts else float("inf")


def measure_funnel(make_runner, reads, npairs, passes=5, max_rounds=3,
                   tol=0.15, tag=""):
    """Warm once (compile+cache), then run up to `passes` steady passes;
    on spread > tol re-run a fresh window (transient contention) up to
    max_rounds.  Respects the soft deadline between passes.  Returns
    (median_rate, times, warm_s, last_runner)."""
    al = make_runner(None)
    print(f"# {tag}: runner built (tables uploaded); warm pass "
          f"starting", file=sys.stderr, flush=True)
    t0 = time.time()
    al.run_file_native(reads, prefilter=True)
    warm = time.time() - t0
    print(f"# {tag}: warm pass (incl compile/load) {warm:.1f}s",
          file=sys.stderr, flush=True)
    times, al2 = [], al
    for rnd in range(max_rounds):
        times = []
        for _ in range(passes):
            al2 = make_runner(al)
            t0 = time.time()
            al2.run_file_native(reads, prefilter=True)
            times.append(time.time() - t0)
            # leave room for one more pass of the same cost (+10%)
            if times and deadline_left() < 1.2 * max(times):
                break
        if spread_of(times) <= tol or rnd + 1 >= max_rounds:
            break
        if deadline_left() < 1.2 * passes * max(times):
            break  # no budget for another window; report what we have
        print(f"# {tag}: spread {100*spread_of(times):.1f}% > "
              f"{100*tol:.0f}% on {[round(t,1) for t in times]} — "
              f"re-running window {rnd+2}/{max_rounds}", file=sys.stderr,
              flush=True)
    med = sorted(times)[len(times) // 2]
    rate = 2 * npairs / med
    print(f"# {tag}: {med:.1f}s steady median of "
          f"{[round(t, 1) for t in times]} "
          f"(spread {100*spread_of(times):.1f}%, {warm:.1f}s warm) "
          f"prefiltered={al2.n_prefiltered}/{npairs} "
          f"referee={al2.n_referee} retried={al2.n_retried} "
          f"reasons={al2.referee_reasons}",
          file=sys.stderr, flush=True)
    return rate, times, warm, al2


def main():
    from danbing_tk_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from danbing_tk_tpu.apps.fa2kmers import read_fasta_seqs
    from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
    from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG
    from tools.bench_e2e import synth_reads

    root = os.path.join(os.path.dirname(__file__), "..")
    panel = os.environ.get("DTK_PF_PANEL", "synthetic")
    nloci = int(os.environ.get("DTK_BENCH_NLOCI", 512))
    P = int(os.environ.get("DTK_PF_P", 4096))
    passes = int(os.environ.get("DTK_PF_PASSES", 5))

    if panel == "real":
        from tools.make_real_panel import background_pool
        from tools.make_real_panel import build as build_real

        pan = build_real(os.path.join(root, "build",
                                      f"real_panel{nloci}"), nloci)
        npairs = int(os.environ.get("DTK_BENCH_REAL_PAIRS", 2_000_000))
        reads = os.path.join(os.path.dirname(pan),
                             f"e2e_real_{npairs}_0.05_0.002.fa")
        if not os.path.exists(reads):
            seqs = read_fasta_seqs(os.path.join(os.path.dirname(pan),
                                                "hap0.fa"))
            synth_reads(reads, npairs, 0.05, seqs, L=150, err=0.002,
                        bg_pool=background_pool())
        # The shared-motif regime defeats any practical expansion cap:
        # measured on this panel, 84% of survivors still overflow at
        # E=2048 (odd demand p50 ~10k slots/pair), and the deep-ladder
        # tiers (E=4096/16384) never finished a warm pass inside a 50
        # min window (compile + tiny-batch cascade).  The measured
        # design is therefore reference-like: a cheap device pass
        # resolves the sparse-demand pairs, and every overflow pair
        # goes STRAIGHT to the exact scan-order referee (C++ pool,
        # overlapped with device compute) — no retry tiers.
        E = int(os.environ.get("DTK_PF_E", 768))
        retry = [int(x) for x in os.environ.get(
            "DTK_PF_RETRY", "").split(",") if x and int(x)]
        metric = "wgs_funnel_real_panel_reads_per_sec"
        prov = (f"{nloci}-locus real-motif panel (real VNTR motifs, "
                "heavy cross-locus k-mer sharing, independent-Markov "
                "flanks), real hg38 chr12 background, 0.2%/base errors, "
                f"E={E}, overflow pairs -> exact host referee "
                f"(retry={retry or 'off'})")
    else:
        from tools.make_bench_rpgg import build

        pan = build(os.path.join(
            root, "build", f"bench_rpgg{'' if nloci == 512 else nloci}"),
            nloci)
        npairs = int(os.environ.get("DTK_BENCH_E2E_PAIRS", 4_000_000))
        reads = os.path.join(os.path.dirname(pan),
                             f"e2e_v2_{npairs}_0.05_0.002.fa")
        if not os.path.exists(reads):
            seqs = read_fasta_seqs(os.path.join(os.path.dirname(pan),
                                                "hap0.fa"))
            synth_reads(reads, npairs, 0.05, seqs, L=150, err=0.002)
        # split expansion is the engine default; E only holds
        # multi-locus expansions, so 192 covers the toy panel's odd
        # demand (p99=65) with 3x margin; [1024] retry is a lazy guard
        E = int(os.environ.get("DTK_PF_E", 192))
        retry = [int(x) for x in os.environ.get(
            "DTK_PF_RETRY", str(max(4 * E, 1024))).split(",")
            if x and int(x)]
        metric = "wgs_funnel_reads_per_sec_per_chip"
        prov = None

    t0 = time.time()
    rpgg = RPGG(pan)
    print(f"# [{panel}] RPGG loaded ({time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      okam=False)

    def mk(prev):
        al = DeviceAlignRunner(rpgg, cfg, batch_pairs=P,
                               max_read_len=160, expand_cap=E,
                               retry_expand=retry)
        if prev is not None:
            al.step = prev.step
            al.retry_steps = prev.retry_steps
            al.prefilter_step = getattr(prev, "prefilter_step", None)
            al.prefilter_P = getattr(prev, "prefilter_P", None)
        return al

    rate, times, warm, al = measure_funnel(
        mk, reads, npairs, passes=passes, tag=f"{panel}-panel funnel e2e")
    m = {
        "metric": metric,
        "value": round(rate, 1),
        "unit": "reads/s",
        "vs_baseline": round(rate / REF_READS_PER_SEC, 3),
    }
    if prov:
        m["provenance"] = prov
        m["survivor_pairs"] = int(npairs - al.n_prefiltered)
        m["referee_pairs"] = int(al.n_referee)
        m["retried_pairs"] = int(al.n_retried)
        m["referee_reasons"] = {k: int(v) for k, v
                                in al.referee_reasons.items()}
    m["spread"] = round(spread_of(times), 4)
    m["passes"] = len(times)
    if spread_of(times) > 0.15 or len(times) < 3:
        m["contaminated"] = True
    print(json.dumps(m), flush=True)


if __name__ == "__main__":
    main()
