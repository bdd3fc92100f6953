#!/usr/bin/env python
"""Builds a larger synthetic RPGG (default 512 loci x 4 haps) with OUR
build tools for benchmarking; cached under build/bench_rpgg/."""

import os
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, ROOT)

from danbing_tk_tpu.apps.fa2kmers import fa2kmers, make_tre_kmers  # noqa
from danbing_tk_tpu.index import dbi as dbi_mod  # noqa

KSIZE, FS = 21, 700


def build(outdir: str, nloci: int = 512, nhap: int = 4, seed: int = 42):
    os.makedirs(outdir, exist_ok=True)
    pan = os.path.join(outdir, "pan")
    if os.path.exists(pan + ".kmers.dbi"):
        return pan
    rng = np.random.default_rng(seed)
    bases = "ACGT"

    def rand_seq(n):
        return "".join(bases[i] for i in rng.integers(0, 4, n))

    motifs = []
    hapfiles = []
    haps = [[] for _ in range(nhap)]
    for li in range(nloci):
        if li % 5 == 4 and motifs:
            motif = motifs[int(rng.integers(0, len(motifs)))]
        else:
            motif = rand_seq(int(rng.integers(3, 16)))
        motifs.append(motif)
        lf, rf = rand_seq(FS), rand_seq(FS)
        base_n = int(rng.integers(20, 100))
        for h in range(nhap):
            n = max(3, base_n + int(rng.integers(-5, 6)))
            tr = motif * n
            haps[h].append(lf + tr + rf)
    for h in range(nhap):
        p = os.path.join(outdir, f"hap{h}.fa")
        with open(p, "w") as f:
            for li, s in enumerate(haps[h]):
                f.write(f">locus{li}\n{s}\n")
        hapfiles.append(p)
    print(f"building {nloci}-locus RPGG...", file=sys.stderr)
    fa2kmers(pan, hapfiles, k=KSIZE, fsi=FS, fso=FS)
    make_tre_kmers(pan, hapfiles, KSIZE, FS)
    dbi_mod.serialize(pan)
    return pan


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "build", "bench_rpgg")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print(build(out, n))
