"""End-to-end build pipeline: beds+assemblies -> serialized RPGG -> align.

Orchestration smoke test (each stage is individually golden-verified):
builds an RPGG from a synthetic 2-genome scenario, genotypes simulated
reads with the host aligner, and checks the expected loci get the counts.
"""

import os

import numpy as np
import pytest

from danbing_tk_tpu.apps.sim_reads import sim_reads
from danbing_tk_tpu.engine.host_align import AlignConfig, HostAligner, RPGG
from danbing_tk_tpu.pipeline.build import build_rpgg

KSIZE, FS, TRWINDOW = 21, 50, 500
GS = ["g0", "g1"]
NLOCI = 4


def _make_scenario(root):
    rng = np.random.default_rng(12)
    bases = "ACGT"

    def rand_seq(n):
        return "".join(bases[i] for i in rng.integers(0, 4, n))

    motifs = [rand_seq(int(rng.integers(5, 12))) for _ in range(NLOCI)]
    indir = os.path.join(root, "input")
    os.makedirs(indir)
    haps = {}
    for gi, g in enumerate(GS):
        os.makedirs(os.path.join(root, "work", g), exist_ok=True)
        for h in (0, 1):
            hi = 2 * gi + h
            recs, rows = [], []
            for li in range(NLOCI):
                n = int(rng.integers(20, 40))
                tr = motifs[li] * n
                lf, rf = rand_seq(TRWINDOW + 50), rand_seq(TRWINDOW + 50)
                name = f"ctg{li}_{hi}"
                recs.append((name, lf + tr + rf))
                rows.append((name, len(lf), len(lf) + len(tr),
                             "chr1", 1000 * li, 1000 * li + 500))
            haps[hi] = recs
            with open(os.path.join(indir, f"{g}.{h}.fa"), "w") as f:
                for nm, s in recs:
                    f.write(f">{nm}\n{s}\n")
            with open(os.path.join(root, "work", g, f"tmp1.{h}.bed"),
                      "w") as f:
                for nm, s, e, rc, rs, re_ in rows:
                    f.write(f"{nm}\t{s}\t{e}\t{rc}\t{rs}\t{re_}\t1\n")
    with open(os.path.join(root, "ref.tr.bed"), "w") as f:
        for li in range(NLOCI):
            f.write(f"chr1\t{1000 * li}\t{1000 * li + 500}\n")
    return indir, haps


def test_build_and_align(tmp_path):
    indir, haps = _make_scenario(str(tmp_path))
    work = str(tmp_path / "work")
    pan = build_rpgg(work, indir, GS, str(tmp_path / "ref.tr.bed"),
                     ksize=KSIZE, FS=FS, TRWINDOW=TRWINDOW,
                     dist_merge=FS)
    for ext in [".tr.kmers", ".fl.kmers", ".graph.kmers", ".kmers.dbi",
                ".fl.kdb", ".tre.kdb"]:
        assert os.path.getsize(pan + ext), ext
    # rerun hits the checkpoint cache
    pan2 = build_rpgg(work, indir, GS, str(tmp_path / "ref.tr.bed"),
                      ksize=KSIZE, FS=FS, TRWINDOW=TRWINDOW,
                      dist_merge=FS)
    assert pan2 == pan

    # simulate reads from the trfa regions of hap0 and genotype them
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as out:
        sim_reads(os.path.join(work, "trfa", "g0.0.tr.fasta"), out, cov=20,
                  flen=300, rlen=100, min_ctg_len=150)
    rpgg = RPGG(pan)
    cfg = AlignConfig(ksize=KSIZE, cth=10, n_filter=4, nm_filter=1,
                      nm_tr=20, okam=False)
    al = HostAligner(rpgg, cfg)
    al.run_file(str(reads))
    counts = al.flat_counts()
    assert counts.sum() > 0
    # every locus with a TR long enough to be covered should get reads
    assert (al.nmapread > 0).sum() >= NLOCI - 1


def _read_locus_kmers(path):
    per = []
    for line in open(path):
        if line[0] == ">":
            per.append({})
        else:
            km, c = line.split()
            per[-1][int(km)] = int(c)
    return per


def test_build_with_prune_path(tmp_path):
    """GenRaw->prune->GenPruned (snakefile:241-336): a locus whose reads
    never appear in the genome's own short-read set loses its kmers."""
    import io

    indir, _ = _make_scenario(str(tmp_path))
    work = str(tmp_path / "work")
    buf = io.StringIO()
    for h in (0, 1):
        sim_reads(os.path.join(indir, f"g0.{h}.fa"), buf, cov=20,
                  flen=300, rlen=100, min_ctg_len=100)
    reads = str(tmp_path / "g0.reads.fa")
    lines = buf.getvalue().splitlines()
    with open(reads, "w") as f:
        for title, seq in zip(lines[::2], lines[1::2]):
            if not title.startswith(">ctg3_"):  # locus 3 never sequenced
                f.write(f"{title}\n{seq}\n")
    pan = build_rpgg(work, indir, GS, str(tmp_path / "ref.tr.bed"),
                     ksize=KSIZE, FS=FS, TRWINDOW=TRWINDOW, dist_merge=FS,
                     prune_reads={"g0": reads}, cth=1, thcth=1)
    raw = _read_locus_kmers(os.path.join(work, "g0.rawPB.tr.kmers"))
    pb = _read_locus_kmers(os.path.join(work, "g0.PB.tr.kmers"))
    assert len(pb[3]) < len(raw[3])          # uncovered locus pruned
    assert all(pb[li] for li in (0, 1, 2))   # covered loci survive
    prune = _read_locus_kmers(os.path.join(work, "g0.prune.kmers"))
    assert sum(len(p) for p in prune) > 0
    assert os.path.getsize(os.path.join(work, "g0.rawLR.pred"))
    # non-pruned genome takes the direct path
    assert not os.path.exists(os.path.join(work, "g1.rawPB.tr.kmers"))
    assert os.path.getsize(pan + ".kmers.dbi")
