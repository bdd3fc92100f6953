#!/usr/bin/env python
"""End-to-end WGS-shaped benchmark: C-reader ingest -> device prefilter
-> survivor repack -> full pipeline -> outputs, wall-clock.

Synthesizes a read file shaped like a WGS sample hitting a TR panel:
DTK_E2E_FRAC (default 5%) of pairs come from the bench haplotypes, the
rest are random background the prefilter must reject.  Reports overall
reads/s including ingest, and the stage funnel.

Run on the TPU: `python tools/bench_e2e.py`
(env: DTK_E2E_PAIRS=200000, DTK_E2E_FRAC=0.05, DTK_BENCH_NLOCI=512)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
    from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG
    from danbing_tk_tpu.apps.fa2kmers import read_fasta_seqs
    from tools.make_bench_rpgg import build

    root = os.path.join(os.path.dirname(__file__), "..")
    npairs = int(os.environ.get("DTK_E2E_PAIRS", 200_000))
    frac = float(os.environ.get("DTK_E2E_FRAC", 0.05))
    nloci = int(os.environ.get("DTK_BENCH_NLOCI", 512))
    L = 150

    pan = build(os.path.join(
        root, "build", f"bench_rpgg{'' if nloci == 512 else nloci}"),
        nloci)
    reads = os.path.join(os.path.dirname(pan), f"e2e_{npairs}_{frac}.fa")
    if not os.path.exists(reads):
        print("synthesizing reads...", file=sys.stderr)
        rng = np.random.default_rng(3)
        seqs = read_fasta_seqs(os.path.join(os.path.dirname(pan),
                                            "hap0.fa"))
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        with open(reads, "w") as f:
            for i in range(npairs):
                if rng.random() < frac:
                    s = seqs[int(rng.integers(0, len(seqs)))]
                    b = int(rng.integers(0, max(len(s) - 500, 1)))
                    r1 = s[b:b + L]
                    r2 = s[b + 500 - L:b + 500][::-1].translate(
                        str.maketrans("ACGT", "TGCA"))
                else:
                    r1 = bases[rng.integers(0, 4, L)].tobytes().decode()
                    r2 = bases[rng.integers(0, 4, L)].tobytes().decode()
                f.write(f">p{i}/1\n{r1}\n>p{i}/2\n{r2}\n")

    rpgg = RPGG(pan)
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      okam=False)
    al = DeviceAlignRunner(rpgg, cfg, batch_pairs=4096, max_read_len=160)
    # compile both programs before the timed run (one-time cost per shape)
    t0 = time.time()
    al.run_file_native(reads, prefilter=True)
    wall = time.time() - t0
    nreads = 2 * npairs
    print(f"# wall={wall:.1f}s ({nreads / wall:.0f} reads/s incl. ingest "
          f"+ compile) prefiltered={al.n_prefiltered}/{npairs} "
          f"referee={al.n_referee}", file=sys.stderr)

    # steady-state: second pass reuses the compiled programs
    al2 = DeviceAlignRunner(rpgg, cfg, batch_pairs=4096, max_read_len=160)
    al2.prefilter_step = al.prefilter_step
    al2.step = al.step
    t0 = time.time()
    al2.run_file_native(reads, prefilter=True)
    wall2 = time.time() - t0
    print(f"# steady wall={wall2:.1f}s -> {nreads / wall2:.0f} reads/s "
          f"end-to-end (ingest+prefilter+full+referee)", file=sys.stderr)
    al2.write_trkmc_ar("/tmp/e2e.trkmc.ar")
    print(f"e2e_reads_per_sec={nreads / wall2:.0f}")


if __name__ == "__main__":
    main()
