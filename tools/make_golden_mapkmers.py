#!/usr/bin/env python
"""Golden for mapkmers (reference src/mapkmers.cpp, built ad hoc with
`g++ -O2 -I src -o bin/mapkmers src/mapkmers.cpp` — it has no Makefile
rule).  Maps pan.tr.kmers counts onto g0.tr.kmers loci through a panbed
whose target column permutes some loci and drops others ('.'), then
freezes the count-only writeKmers output (libstdc++ umap iteration
order) as tests/golden/mapkmers.golden.kmers."""

import os
import subprocess

REFBIN = os.environ.get("DTK_REF_BIN", "/tmp/refbuild/bin")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def panbed_rows(nloci):
    # deterministic mix: reverse-map even loci, drop the rest
    rows = []
    for i in range(nloci):
        tgt = str(nloci - 1 - i) if i % 2 == 0 else "."
        rows.append(f"chr1\t{100 * i}\t{100 * i + 50}\t{tgt}\n")
    return rows


def main():
    pan = os.path.join(OUT, "pan.tr.kmers")
    gen = os.path.join(OUT, "g0.tr.kmers")
    nloci = sum(1 for ln in open(pan) if ln.startswith(">"))
    bed = os.path.join(OUT, "mapkmers.panbed")
    with open(bed, "w") as f:
        f.writelines(panbed_rows(nloci))
    subprocess.run(
        [os.path.join(REFBIN, "mapkmers"), bed, "3", pan, gen,
         os.path.join(OUT, "mapkmers.golden")],
        check=True)
    print("wrote", os.path.join(OUT, "mapkmers.golden.kmers"))


if __name__ == "__main__":
    main()
