"""Device k-mer extraction vs numpy oracle."""

import numpy as np

from danbing_tk_tpu.ops import kmers_np as K
from danbing_tk_tpu.ops.kmers_jax import extract_kmers_edges, pack_reads

NAN64 = K.NAN64


def _rand_reads(rng, n, minlen=10, maxlen=160, nprob=0.05):
    reads = []
    for _ in range(n):
        ln = int(rng.integers(minlen, maxlen + 1))
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, ln))
        if rng.random() < nprob * 10:
            # sprinkle Ns
            for _ in range(int(rng.integers(1, 4))):
                p = int(rng.integers(0, ln))
                s = s[:p] + "N" + s[p + 1 :]
        reads.append(s)
    return reads


def _to_u64(lo, hi, valid):
    v = lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))
    v[~valid] = NAN64
    return v


def test_extract_matches_numpy():
    rng = np.random.default_rng(11)
    for k in (5, 21, 31):
        reads = _rand_reads(rng, 64, minlen=max(3, k - 3))
        L = 160
        codes, rlen = pack_reads(reads, L)
        out = extract_kmers_edges(codes, rlen, k)
        klo = np.asarray(out["klo"])
        khi = np.asarray(out["khi"])
        kv = np.asarray(out["kvalid"])
        elo = np.asarray(out["elo"])
        ehi = np.asarray(out["ehi"])
        ev = np.asarray(out["evalid"])
        for i, s in enumerate(reads):
            kms, edges = K.seq_to_kmers_and_edges(K.encode_bases(s), k)
            dev_k = _to_u64(klo[i], khi[i], kv[i])[: max(len(s) - k + 1, 0)]
            dev_e = _to_u64(elo[i], ehi[i], ev[i])[: max(len(s) - k, 0)]
            assert np.array_equal(dev_k, kms), (k, i, s)
            assert np.array_equal(dev_e, edges), (k, i, s)
            # padding region must be invalid
            assert not kv[i, max(len(s) - k + 1, 0):].any()
