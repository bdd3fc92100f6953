"""L1 numpy kernel semantics vs reference-generated golden fixtures.

The golden pan.{tr,fl,graph}.kmers were produced by the reference fa2kmers
binary on tests/golden/hap*.fa; these tests prove our from-scratch k-mer
primitives reproduce the reference semantics exactly (multiset equality per
locus; file byte-order equality is covered by the build-side tests).
"""

import os

import numpy as np
import pytest

from danbing_tk_tpu.io import text as tio
from danbing_tk_tpu.ops import kmers_np as K

KSIZE = 21
FS = 700


def read_haps(golden_dir):
    haps = []
    for h in range(4):
        seqs = []
        with open(os.path.join(golden_dir, f"hap{h}.fa")) as f:
            cur = []
            for line in f:
                if line.startswith(">"):
                    if cur:
                        seqs.append("".join(cur))
                    cur = []
                else:
                    cur.append(line.strip())
            seqs.append("".join(cur))
        haps.append(seqs)
    return haps


def test_codec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        k = int(rng.integers(1, 33))
        km = int(rng.integers(0, 1 << min(2 * k, 63)))
        assert K.encode_kmer(K.decode_kmer(km, k)) == km


def test_revcomp_involution():
    rng = np.random.default_rng(1)
    for k in (4, 13, 21, 31):
        kms = rng.integers(0, 1 << min(2 * k, 63), 100).astype(np.uint64)
        rc = K.revcomp_kmers(kms, k)
        assert np.array_equal(K.revcomp_kmers(rc, k), kms)
        # string-level check
        for km in kms[:5]:
            s = K.decode_kmer(int(km), k)
            assert K.decode_kmer(int(K.revcomp_kmers(np.array([km]), k)[0]),
                                 k) == K._revcomp_str(s)


def test_kmer_extraction_n_handling():
    seq = "ACGTNACGTACGTACGT"
    kms = K.seq_to_kmers(K.encode_bases(seq), 4)
    # windows overlapping the N are invalid
    assert len(kms) == len(seq) - 4 + 1
    for i in range(len(kms)):
        if i + 4 > 4 and i <= 4:
            assert kms[i] == K.NAN64
        else:
            assert kms[i] != K.NAN64


def test_tr_kmers_match_reference(golden_dir):
    haps = read_haps(golden_dir)
    gold = tio.read_kmer_file(os.path.join(golden_dir, "pan.tr.kmers"))
    nloci = len(gold)
    mine = [dict() for _ in range(nloci)]
    for h in range(4):
        for li in range(nloci):
            K.count_kmers(mine[li], haps[h][li], KSIZE, FS, FS)
    for li in range(nloci):
        assert mine[li] == gold[li], f"locus {li} tr kmers differ"


def test_fl_kmers_match_reference(golden_dir):
    haps = read_haps(golden_dir)
    gold = tio.read_kmer_file(os.path.join(golden_dir, "pan.fl.kmers"))
    nloci = len(gold)
    mine = [dict() for _ in range(nloci)]
    for h in range(4):
        for li in range(nloci):
            seq = haps[h][li]
            # flank windows per fa2kmers.cpp:148-158 (fsi=fso=FS)
            lFL_l, lFL_r = 0, len(seq) - FS - (KSIZE - 1)
            rFL_l, rFL_r = len(seq) - FS - (KSIZE - 1), 0
            K.count_kmers(mine[li], seq, KSIZE, lFL_l, lFL_r)
            K.count_kmers(mine[li], seq, KSIZE, rFL_l, rFL_r)
    for li in range(nloci):
        assert mine[li] == gold[li], f"locus {li} fl kmers differ"


def test_graph_kmers_match_reference(golden_dir):
    haps = read_haps(golden_dir)
    gold = tio.read_kmer_file(os.path.join(golden_dir, "pan.graph.kmers"))
    nloci = len(gold)
    mine = [dict() for _ in range(nloci)]
    for h in range(4):
        for li in range(nloci):
            K.build_kmer_graph(mine[li], haps[h][li], KSIZE)
    for li in range(nloci):
        assert mine[li] == gold[li], f"locus {li} graph differs"


def test_edges_consistent_with_kp1mers():
    rng = np.random.default_rng(2)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    seq = seq[:100] + "N" + seq[101:]
    codes = K.encode_bases(seq)
    kms, edges = K.seq_to_kmers_and_edges(codes, KSIZE)
    assert len(edges) == len(kms) - 1
    # every valid edge must equal canonical (k+1)-mer of the window
    for i, e in enumerate(edges):
        sub = seq[i : i + KSIZE + 1]
        if "N" in sub:
            assert e == K.NAN64
        else:
            fwd = K.encode_kmer(sub)
            rc = int(K.revcomp_kmers(np.array([fwd], dtype=np.uint64),
                                     KSIZE + 1)[0])
            assert int(e) == min(fwd, rc)
