#!/usr/bin/env python
"""Golden-oracle generator (M0).

Builds a deterministic synthetic VNTR dataset, then runs the *reference*
danbing-tk binaries (built out-of-tree, default /tmp/refbuild/bin) to freeze
golden outputs for bit-exactness tests:

  tests/golden/
    hap{0..3}.fa            synthetic per-locus TR+flank fastas (4 haplotypes)
    pan.{tr,fl,graph}.kmers fa2kmers -on output (human readable)
    pan.tre.kmers           TR-region (k+1)-mers (synthesized; input-only fmt)
    pan.kmers.dbi           ktools serialize output (binary index)
    pan.{fl,tre}.kdb        binary kset DBs
    reads.fa                interleaved PE reads (shuffled pairing, errors, Ns)
    reads.sim.fa            same reads, simmode-2 titles (>chr:beg-end:locus)
    out.on.tr.kmers         align -on golden genotype (readable)
    out.kam                 align default kam output (stdout)
    out.trkmc.ar            align -o binary genotype
    out.tr.summary.txt      per-locus nmapread/kmc
    out.bub.kmdb            align -bu bubbles (binary)
    out.sim.kam             align -s 2 kam (src locus scored)

Scenario-1 flow per reference README.md:66-75; align behavior per
src/aQueryFasta_thread.cpp (HEAD: asgn counting mode, threading disabled).

Reference binaries are ONLY executed, never copied; golden outputs are test
fixtures.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from danbing_tk_tpu.ops import kmers_np as K

REFBIN = os.environ.get("DTK_REF_BIN", "/tmp/refbuild/bin")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
KSIZE = 21
FS = 700  # flank size (reference default build uses 700bp)
NLOCI = 24
NHAP = 4
READLEN = 150
FRAGLEN = 400
COV = 30

BASES = "ACGT"


def rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def mutate(rng, seq, sub=0.002, ind=0.0005):
    out = []
    for c in seq:
        r = rng.random()
        if r < sub:
            out.append(BASES[rng.integers(0, 4)])
        elif r < sub + ind:
            if rng.random() < 0.5:
                continue  # deletion
            out.append(c)
            out.append(BASES[rng.integers(0, 4)])
        else:
            out.append(c)
    return "".join(out)


def make_dataset(rng):
    """Returns haps[h][locus] = full sequence (LF + TR + RF).

    Several locus families share motifs (exact or lightly mutated) so that
    many k-mers map to multiple loci -- this exercises the kmerDBi vv lists,
    vote competition, and tie handling in align."""
    motifs = []
    haps = [[None] * NLOCI for _ in range(NHAP)]
    for li in range(NLOCI):
        if li % 4 == 3 and motifs:
            # reuse an earlier motif verbatim (shared kmers across loci)
            motif = motifs[int(rng.integers(0, len(motifs)))]
        elif li % 4 == 2 and motifs:
            # lightly mutated copy of an earlier motif
            motif = mutate(rng, motifs[-1], sub=0.08, ind=0)
            if not motif:
                motif = rand_seq(rng, 11)
        else:
            mlen = int(rng.integers(3, 16))
            motif = rand_seq(rng, mlen)
        motifs.append(motif)
        lf = rand_seq(rng, FS)
        rf = rand_seq(rng, FS)
        base_n = int(rng.integers(20, 80))
        for h in range(NHAP):
            n = base_n + int(rng.integers(-5, 6))
            tr = mutate(rng, motif * n, sub=0.01, ind=0.002)
            # keep TR length sane (>= k)
            if len(tr) < KSIZE + 2:
                tr = motif * 8
            haps[h][li] = lf + tr + rf
    return haps


def write_fasta(path, names, seqs, width=0):
    with open(path, "w") as f:
        for nm, s in zip(names, seqs):
            f.write(f">{nm}\n")
            if width:
                for i in range(0, len(s), width):
                    f.write(s[i : i + width] + "\n")
            else:
                f.write(s + "\n")


def make_tre(haps):
    """Per-locus canonical (k+1)-mer sets over the TR region (window matching
    fa2kmers' TR window semantics with k+1: positions FS .. len-FS-k-1)."""
    tre = [set() for _ in range(NLOCI)]
    for h in range(NHAP):
        for li in range(NLOCI):
            seq = haps[h][li]
            codes = K.encode_bases(seq)
            kms = K.seq_to_kmers(codes, KSIZE + 1, canonical=True)
            lo, hi = FS, len(codes) - FS - (KSIZE + 1) + 1
            for km in kms[lo:hi]:
                if km != K.NAN64:
                    tre[li].add(int(km))
    return tre


def sim_reads(rng, haps):
    """Simulate ~COVx error-free-ish PE reads over each locus region.

    Returns list of (title_plain, title_sim, seq1, seq2) where seq2 is the
    reverse complement mate (as samtools fasta -n would emit both mates in
    original orientation; we emit mate2 as RC of the fragment end, matching
    real FR libraries).
    """
    pairs = []
    rid = 0
    for li in range(NLOCI):
        for h in range(NHAP):
            seq = haps[h][li]
            n = len(seq)
            # restrict sampling to cover TR +/- flanks fully
            npairs = max(4, int(COV * n / (2 * READLEN) / NHAP))
            for _ in range(npairs):
                beg = int(rng.integers(0, n - FRAGLEN + 1))
                frag = seq[beg : beg + FRAGLEN]
                r1 = frag[:READLEN]
                r2 = K._revcomp_str(frag[-READLEN:])
                # light error injection on a subset
                if rng.random() < 0.3:
                    r1 = mutate(rng, r1, sub=0.01, ind=0)
                if rng.random() < 0.3:
                    r2 = mutate(rng, r2, sub=0.01, ind=0)
                # occasional N
                if rng.random() < 0.05:
                    p = int(rng.integers(0, len(r1)))
                    r1 = r1[:p] + "N" + r1[p + 1 :]
                t_plain = f"read{rid}"
                t_sim = f"ctg{li}_{h}:{beg}-{beg + FRAGLEN}:{li}"
                pairs.append((t_plain, t_sim, r1, r2))
                rid += 1
    # background reads not matching any locus
    for i in range(200):
        r1 = rand_seq(rng, READLEN)
        r2 = rand_seq(rng, READLEN)
        pairs.append((f"bg{i}", f"bg{i}:0-400:.", r1, r2))
    return pairs


def write_reads(path, pairs, sim, rng):
    """Interleaved-ish PE fasta with both mates sharing a title; mate order
    shuffled within a small window to exercise the pairing hashmap."""
    recs = []
    for tp, ts, r1, r2 in pairs:
        t = ts if sim else tp
        recs.append((f"{t}/1", r1))
        recs.append((f"{t}/2", r2))
    # local shuffle with window 8 (keeps pairing map small but nontrivial)
    idx = np.arange(len(recs))
    for i in range(0, len(recs) - 8, 8):
        rng.shuffle(idx[i : i + 8])
    with open(path, "w") as f:
        for i in idx:
            t, s = recs[i]
            f.write(f">{t}\n{s}\n")


def run(cmd, **kw):
    print("+", " ".join(cmd), file=sys.stderr)
    return subprocess.run(cmd, check=True, **kw)


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    haps = make_dataset(rng)

    hapfiles = []
    for h in range(NHAP):
        p = os.path.join(OUT, f"hap{h}.fa")
        write_fasta(p, [f"locus{li}" for li in range(NLOCI)], haps[h])
        hapfiles.append(p)

    # RPGG build (Scenario 1): fa2kmers -g -on + synthesized tre + serialize
    run(
        [f"{REFBIN}/fa2kmers", "-g", "-k", str(KSIZE), "-fsi", str(FS),
         "-fso", str(FS), "-on", os.path.join(OUT, "pan"), "-fa",
         str(NHAP)] + hapfiles
    )
    # -p prune golden: every 3rd TR kmer per locus pruned
    with open(os.path.join(OUT, "prune.kmers"), "w") as fo:
        n = 0
        for line in open(os.path.join(OUT, "pan.tr.kmers")):
            if line.startswith(">"):
                n = 0
                fo.write(line)
            else:
                if n % 3 == 0:
                    fo.write(line)
                n += 1
    run([f"{REFBIN}/fa2kmers", "-g", "-k", str(KSIZE), "-fsi", str(FS),
         "-fso", str(FS), "-p", os.path.join(OUT, "prune.kmers"), "-on",
         os.path.join(OUT, "pan.pruned"), "-fa", str(NHAP)] + hapfiles)

    tre = make_tre(haps)
    with open(os.path.join(OUT, "pan.tre.kmers"), "w") as f:
        for li in range(NLOCI):
            f.write(f">{li}\n")
            for km in sorted(tre[li]):
                f.write(f"{km}\n")
    run([f"{REFBIN}/ktools", "serialize", os.path.join(OUT, "pan")])

    # reads
    pairs = sim_reads(rng, haps)
    rng2 = np.random.default_rng(7)
    write_reads(os.path.join(OUT, "reads.fa"), pairs, sim=False, rng=rng2)
    rng2 = np.random.default_rng(7)
    write_reads(os.path.join(OUT, "reads.sim.fa"), pairs, sim=True, rng=rng2)

    pan = os.path.join(OUT, "pan")
    env = dict(os.environ)

    def align(extra, out_pref, kam_name, reads="reads.fa"):
        with open(os.path.join(OUT, kam_name), "w") as kam:
            run(
                [f"{REFBIN}/danbing-tk", "-k", str(KSIZE), "-qs", pan,
                 "-fa", os.path.join(OUT, reads), "-p", "1", "-cth", "20",
                 "-kf", "4", "1"] + extra + [out_pref],
                stdout=kam, env=env,
            )

    align(["-on"], os.path.join(OUT, "out.on"), "out.kam")
    align(["-bu", "-o"], os.path.join(OUT, "out"), "out.kam2")
    align(["-s", "2", "-o"], os.path.join(OUT, "out.sim"), "out.sim.kam",
          reads="reads.sim.fa")

    # --- -e extract-mode goldens (reads written to stdout, no counting)
    for e in (1, 2):
        with open(os.path.join(OUT, f"out.e{e}.fa"), "w") as fo:
            run([f"{REFBIN}/danbing-tk", "-k", str(KSIZE), "-qs", pan,
                 "-fa", os.path.join(OUT, "reads.fa"), "-p", "1", "-cth",
                 "20", "-kf", "4", "1", "-e", str(e), "-o", "/tmp/ex"],
                stdout=fo, env=env)

    # sanity: the two kam outputs (plain vs -on run) must be identical
    a = open(os.path.join(OUT, "out.kam"), "rb").read()
    b = open(os.path.join(OUT, "out.kam2"), "rb").read()
    assert a == b, "kam outputs differ between runs"
    os.remove(os.path.join(OUT, "out.kam2"))

    # --- per-genome builds + pan merge (genPanKmers golden) ---
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from danbing_tk_tpu.apps.fa2kmers import make_tre_kmers

    for gi, hs in enumerate([(0, 1), (2, 3)]):
        gp = os.path.join(OUT, f"g{gi}")
        gfas = [hapfiles[h] for h in hs]
        run([f"{REFBIN}/fa2kmers", "-g", "-k", str(KSIZE), "-fsi", str(FS),
             "-fso", str(FS), "-on", gp, "-fa", "2"] + gfas)
        make_tre_kmers(gp, gfas, KSIZE, FS)
    run([f"{REFBIN}/genPanKmers", "-o", os.path.join(OUT, "pan2"), "-m", "-",
         "-k", os.path.join(OUT, "g0"), os.path.join(OUT, "g1")])

    # --- bait pipeline golden: profiles -> FPS kmers -> bt.kmdb -> align -b
    simkam = os.path.join(OUT, "out.sim.kam")
    run([f"{REFBIN}/baitBuilder", "v1.pf", simkam, str(NLOCI), str(KSIZE),
         os.path.join(OUT, "bait")])
    run([f"{REFBIN}/baitBuilder", "v2", str(NLOCI), str(KSIZE),
         os.path.join(OUT, "bait.FPSkmer.tsv"),
         os.path.join(OUT, "bait.FP_pf.txt"),
         os.path.join(OUT, "bait.TP_pf.txt")])
    run([f"{REFBIN}/ktools", "serialize-bt", os.path.join(OUT,
         "bait.FPSkmer.tsv"), str(NLOCI), pan])
    with open("/dev/null", "w") as devnull:
        run([f"{REFBIN}/danbing-tk", "-k", str(KSIZE), "-qs", pan, "-fa",
             os.path.join(OUT, "reads.sim.fa"), "-p", "1", "-cth", "20",
             "-kf", "4", "1", "-b", "-tb", "-s", "2", "-o",
             os.path.join(OUT, "out.tb")], stdout=devnull, env=env)
    for junk in ("out.tb.trkmc.ar", "out.tb.tr.summary.txt"):
        jp = os.path.join(OUT, junk)
        if os.path.exists(jp):
            os.remove(jp)
    align(["-b", "-s", "2", "-o"], os.path.join(OUT, "out.bait"),
          "out.bait.kam", reads="reads.sim.fa")
    # --- simmode-1 golden (reads grouped by locus, >LOCUS.IND titles) ---
    pairs_by_title = {}
    order = []
    with open(os.path.join(OUT, "reads.sim.fa")) as fin:
        while True:
            t = fin.readline()
            if not t:
                break
            s = fin.readline().rstrip()
            t = t[1:].rstrip()
            base, mate = t.rsplit("/", 1)
            if base not in pairs_by_title:
                pairs_by_title[base] = {}
                order.append(base)
            pairs_by_title[base][mate] = s
    def locus_of(base):
        v = base.split(":")[2]
        return NLOCI if v == "." else int(v)
    order.sort(key=locus_of)
    with open(os.path.join(OUT, "reads.s1.fa"), "w") as fout:
        for i, base in enumerate(order):
            loc = locus_of(base)
            for mate in ("1", "2"):
                fout.write(f">{loc}.{i}/{mate}\n"
                           f"{pairs_by_title[base][mate]}\n")
    with open(os.path.join(OUT, "out.s1.kam"), "w") as kam:
        run([f"{REFBIN}/danbing-tk", "-k", str(KSIZE), "-qs", pan, "-fa",
             os.path.join(OUT, "reads.s1.fa"), "-p", "1", "-cth", "20",
             "-kf", "4", "1", "-s", "1", "-o", os.path.join(OUT,
             "out.s1")], stdout=kam)

    # --- fa2kmers binary (-o default) output golden ---
    run([f"{REFBIN}/fa2kmers", "-g", "-k", str(KSIZE), "-fsi", str(FS),
         "-fso", str(FS), "-o", os.path.join(OUT, "panbin"), "-fa",
         str(NHAP)] + hapfiles)

    # --- fastq flow: qualities + qual-masked bait (align -fq -b) ---
    rngq = np.random.default_rng(21)
    with open(os.path.join(OUT, "reads.sim.fa")) as fin, \
            open(os.path.join(OUT, "reads.sim.fq"), "w") as fout:
        for line in fin:
            if line.startswith(">"):
                title = line[1:].rstrip()
                seq = next(fin).rstrip()
                q = np.full(len(seq), ord("I"), dtype=np.uint8)
                # sprinkle low-quality bases (below default qth=20)
                nlow = int(rngq.integers(0, 6))
                for p in rngq.integers(0, len(seq), nlow):
                    q[p] = ord("#")  # Q2
                fout.write(f"@{title}\n{seq}\n+\n{q.tobytes().decode()}\n")
    with open(os.path.join(OUT, "out.fq.e1.fq"), "w") as fo:
        run([f"{REFBIN}/danbing-tk", "-k", str(KSIZE), "-qs", pan, "-fq",
             os.path.join(OUT, "reads.sim.fq"), "-p", "1", "-cth", "20",
             "-kf", "4", "1", "-e", "1", "-s", "2", "-o", "/tmp/ex"],
            stdout=fo)
    with open(os.path.join(OUT, "out.fq.kam"), "w") as kam:
        run([f"{REFBIN}/danbing-tk", "-k", str(KSIZE), "-qs", pan, "-fq",
             os.path.join(OUT, "reads.sim.fq"), "-p", "1", "-cth", "20",
             "-kf", "4", "1", "-b", "-s", "2", "-o",
             os.path.join(OUT, "out.fq")], stdout=kam)

    # --- ktools subcommand goldens: raava, extract, extract-bt, sum, ksi;
    # align -qc ---
    run([f"{REFBIN}/genPanKmers", "-tr", "-o", os.path.join(OUT,
         "pan.reindex"), "-m", "-", "-k", pan])
    run([f"{REFBIN}/ktools", "raava", pan, str(KSIZE)])
    # extract wants .ntr.kmers (older name of .fl); provide a copy
    shutil.copy(pan + ".fl.kmers", pan + ".ntr.kmers")
    run([f"{REFBIN}/ktools", "extract", pan, "3",
         os.path.join(OUT, "extract3")])
    qcf = os.path.join(OUT, "qc.txt")
    with open(qcf, "w") as f:
        f.write("".join("0" if i % 5 == 0 else "1" for i in range(NLOCI)))
    run([f"{REFBIN}/ktools", "extract-bt", pan, qcf])
    with open(os.path.join(OUT, "pan.tr.ksi"), "w") as f:
        run([f"{REFBIN}/ktools", "ksi", pan + ".tr.kmers"], stdout=f)
    # ktools sum golden: count-only file from out.trkmc.ar
    from danbing_tk_tpu.io.binary import read_karray

    with open(os.path.join(OUT, "counts.txt"), "w") as f:
        for v in read_karray(os.path.join(OUT, "out.trkmc.ar")):
            f.write(f"{v}\n")
    with open(os.path.join(OUT, "sum.golden.kms"), "w") as f:
        pass
    run([f"{REFBIN}/ktools", "sum", os.path.join(OUT, "pan.tr.ksi"),
         os.path.join(OUT, "counts.txt"), os.path.join(OUT,
         "sum.golden.kms")])

    align(["-qc", qcf, "-s", "2", "-o"], os.path.join(OUT, "out.qc"),
          "out.qc.kam", reads="reads.sim.fa")

    # --- threading-mode goldens (needs the re-enabled oracle; see
    # tools/patch_ref_threading.py) ---
    thrbin = "/tmp/refthread/bin/danbing-tk-thread"
    if not os.path.exists(thrbin):
        run([sys.executable,
             os.path.join(os.path.dirname(__file__),
                          "patch_ref_threading.py")])
    with open(os.path.join(OUT, "out.thread.aln"), "w") as alnf:
        run([thrbin, "-k", str(KSIZE), "-qs", pan, "-fa",
             os.path.join(OUT, "reads.sim.fa"), "-p", "1", "-cth", "20",
             "-kf", "4", "1", "-s", "2", "-gc", "50", "3", "-a", "-on",
             os.path.join(OUT, "out.thread")], stdout=alnf)

    # --- small utilities: sim_reads (deterministic stride mode), bam2pe ---
    with open(os.path.join(OUT, "sim_reads.golden.fa"), "w") as f:
        run([f"{REFBIN}/sim_reads", "-pe", "-no-err", "-c", "10", "-ml",
             "1000", "-i", hapfiles[0]], stdout=f)
    with open(os.path.join(OUT, "bam2pe.golden.fa"), "w") as f:
        run([f"{REFBIN}/bam2pe", "-fai", os.path.join(OUT, "reads.fa")],
            stdout=f)

    # drop empty placeholder files align creates via -o parse
    for f in ["out.on.trkmc.ar", "out.sim.trkmc.ar"]:
        p = os.path.join(OUT, f)
        if os.path.exists(p) and os.path.getsize(p) == 0:
            os.remove(p)
    print("golden fixtures written to", OUT, file=sys.stderr)


if __name__ == "__main__":
    main()
