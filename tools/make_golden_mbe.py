#!/usr/bin/env python
"""Golden fixtures for the MBE (multi-boundary expansion) build step.

Constructs a synthetic 2-genome x 2-hap scenario with TR loci whose motifs
leak into the flanks (forcing expansion), runs the *reference* script
script/multiBoundaryExpansion.parallel.py on it, and freezes its outputs
(pan.tr.mbe.v1.bed, locusMap.v1.to.v0.txt, tmp2 beds) under
tests/golden_mbe/.
"""

import os
import shutil
import subprocess
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(ROOT, "tests", "golden_mbe")
REF = "/root/reference/script"
KSIZE, FS, TRWINDOW = 21, 50, 500
NLOCI = 10  # loci 8 and 9 share a contig and collide after expansion
GS = ["g0", "g1"]
NH = 4
BASES = "ACGT"


def rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def write_fa(path, recs, width=60):
    with open(path, "w") as f:
        for name, seq in recs:
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")


def write_fai(fa_path):
    # name, length, offset, linebases, linewidth
    rows = []
    off = 0
    with open(fa_path, "rb") as f:
        data = f.read()
    pos = 0
    lines = data.split(b"\n")
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith(b">"):
            name = line[1:].split()[0].decode()
            seq_off = pos + len(line) + 1
            seqlen = 0
            linebases = None
            j = i + 1
            p = seq_off
            while j < len(lines) and not lines[j].startswith(b">"):
                if lines[j]:
                    if linebases is None:
                        linebases = len(lines[j])
                    seqlen += len(lines[j])
                j += 1
            rows.append((name, seqlen, seq_off, linebases, linebases + 1))
        pos += len(line) + 1
        i += 1
    with open(fa_path + ".fai", "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def main():
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    os.makedirs(os.path.join(OUT, "input"))
    rng = np.random.default_rng(99)

    # panmap: locus 5 missing in hap 3; locus 7 missing in haps 1,2,3
    panmap = np.ones((NLOCI, NH), dtype=int)
    panmap[5, 3] = 0
    panmap[7, 1:] = 0

    # per-locus motifs; loci 0,2,4 leak motif copies into flanks
    loci = []
    for li in range(NLOCI):
        mlen = int(rng.integers(4, 12))
        motif = rand_seq(rng, mlen)
        loci.append(motif)

    ctgs = {}   # (hi) -> list of (name, seq)
    beds = {}   # (hi) -> rows
    for hi in range(NH):
        recs, rows = [], []
        shared = None  # loci 8+9 share one contig per hap
        for li in range(NLOCI):
            if not panmap[li, hi]:
                rows.append(None)
                continue
            motif = loci[li]
            n = int(rng.integers(15, 40))
            tr = motif * n
            if li == 8:
                lf = rand_seq(rng, TRWINDOW + 60)
                rf = rand_seq(rng, 30)  # close to locus 9 -> collision
                shared = (f"ctgS_{hi}", lf + tr + rf, len(lf),
                          len(lf) + len(tr))
                rows.append((shared[0], shared[2], shared[3]))
                continue
            if li == 9:
                assert shared is not None
                base = shared[1]
                s9 = len(base)
                seq = base + tr + rand_seq(rng, TRWINDOW + 60)
                recs.append((shared[0], seq))
                rows.append((shared[0], s9, s9 + len(tr)))
                continue
            lf = rand_seq(rng, TRWINDOW + 60)
            rf = rand_seq(rng, TRWINDOW + 60)
            if li % 2 == 0:
                # leak a few motif copies into the flanks at varying gaps
                gap = int(rng.integers(0, FS - len(motif) * 3))
                lf = lf[: len(lf) - gap - 3 * len(motif)] + motif * 3 + \
                    lf[len(lf) - gap :]
                rf = rf[:gap] + motif * 2 + rf[gap + 2 * len(motif) :]
            name = f"ctg{li}_{hi}"
            seq = lf + tr + rf
            recs.append((name, seq))
            rows.append((name, len(lf), len(lf) + len(tr)))
        ctgs[hi] = recs
        beds[hi] = rows

    for gi, g in enumerate(GS):
        os.makedirs(os.path.join(OUT, g), exist_ok=True)
        for h in (0, 1):
            hi = 2 * gi + h
            fa = os.path.join(OUT, "input", f"{g}.{h}.fa")
            write_fa(fa, ctgs[hi])
            write_fai(fa)
            with open(os.path.join(OUT, g, f"tmp1.{h}.bed"), "w") as f:
                for li, row in enumerate(beds[hi]):
                    if row is None:
                        f.write(".\t.\t.\t.\t.\t.\t.\n")
                    else:
                        nm, s, e = row
                        # col7 = strand-consistency flag (1/-1, per
                        # liftbed.clean.py), parsed as int downstream
                        f.write(f"{nm}\t{s}\t{e}\tc3\tc4\tc5\t1\n")

    with open(os.path.join(OUT, "genomes.txt"), "w") as f:
        for g in GS:
            f.write(g + "\n")
    with open(os.path.join(OUT, "pan.tr.mbe.v0.bed"), "w") as f:
        for li in range(NLOCI):
            cols = ["chr1", str(1000 * li), str(1000 * li + 500)] + [
                str(x) for x in panmap[li]]
            f.write("\t".join(cols) + "\n")

    os.makedirs(os.path.join(OUT, "MBE"), exist_ok=True)
    # statsmodels is absent in this image; vntrutils imports it at module
    # scope though MBE never uses it -- shim it out
    os.makedirs("/tmp/pyshims/statsmodels", exist_ok=True)
    for fn in ("__init__.py", "api.py"):
        with open(f"/tmp/pyshims/statsmodels/{fn}", "w") as f:
            f.write("# stub\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + "/tmp/pyshims"
    subprocess.run(
        [sys.executable, os.path.join(REF,
         "multiBoundaryExpansion.parallel.py"),
         str(KSIZE), str(FS), str(TRWINDOW), "genomes.txt",
         "pan.tr.mbe.v0.bed", "0.1", "0.8", "1", "input"],
        cwd=OUT, env=env, check=True,
    )
    # drop the pickles (irrelevant binary intermediates)
    shutil.rmtree(os.path.join(OUT, "MBE"))

    # --- collision scan (our bedops; both sides consume the same file) +
    # reference mergeMBEbed.py for the v2 golden ---
    sys.path.insert(0, ROOT)
    from danbing_tk_tpu.utils.bedops import collision_scan, write_m0_loci

    panbed_rows = [line.split("\t") for line in
                   open(os.path.join(OUT, "pan.tr.mbe.v1.bed"))
                   .read().splitlines()]
    groups = collision_scan(panbed_rows, NH, dist=FS)
    write_m0_loci(os.path.join(OUT, "mbe.m0.loci"), GS, groups)
    subprocess.run(
        [sys.executable, os.path.join(REF, "mergeMBEbed.py"),
         "genomes.txt", "0.8"],
        cwd=OUT, env=env, check=True,
    )
    print("MBE golden written to", OUT, file=sys.stderr)


if __name__ == "__main__":
    main()
