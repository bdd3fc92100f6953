"""Native reader == Python reader (pair order, packing, throughput)."""

import os
import time

import numpy as np

from danbing_tk_tpu.engine.host_align import iter_fasta_pairs
from danbing_tk_tpu.io.native_reader import NativeBatchReader
from danbing_tk_tpu.ops import kmers_np as K


def test_native_matches_python(golden_dir):
    path = os.path.join(golden_dir, "reads.fa")
    P, L = 1024, 192
    py_pairs = [p for batch in iter_fasta_pairs(path, 40, 24, 0, 10**9)
                for p in batch]
    nat = []
    for codes, rlen, n, titles in NativeBatchReader(path, P, L,
                                                    min_read_size=40):
        for i in range(n):
            nat.append((titles[i], codes[2 * i], rlen[2 * i],
                        codes[2 * i + 1], rlen[2 * i + 1]))
    assert len(nat) == len(py_pairs)
    for (t, s1, s2, _), (nt, c1, l1, c2, l2) in zip(py_pairs, nat):
        assert t[1:] == nt  # python keeps '>'
        e1 = K.encode_bases(s1)
        e2 = K.encode_bases(s2)
        assert l1 == len(e1) and np.array_equal(c1[: l1], e1)
        assert l2 == len(e2) and np.array_equal(c2[: l2], e2)
        assert (c1[l1:] == 255).all()


def test_native_reader_throughput(golden_dir):
    path = os.path.join(golden_dir, "reads.fa")
    # best of 3: pass 1 warms the page cache, and a loaded CI host can
    # steal the core for any single pass
    rate = 0.0
    for _ in range(3):
        t0 = time.time()
        nreads = 0
        for codes, rlen, n, _ in NativeBatchReader(path, 4096, 192,
                                                   with_titles=False):
            nreads += 2 * n
        rate = max(rate, nreads / (time.time() - t0))
        if rate > 100_000:
            break
    print(f"native reader: {rate:.0f} reads/s")
    assert rate > 100_000  # C path must be far above TPU feed threshold

def test_native_scrambled_pair_order(tmp_path):
    """Non-adjacent mates exercise the held-record/hashmap interplay:
    a record displaced from the lookahead slot into the map must still
    pair, in the same order the Python reader produces."""
    rng = np.random.default_rng(7)
    names = [f"r{i}" for i in range(40)]
    recs = []
    for i, nm in enumerate(names):
        s = "".join("ACGT"[b] for b in rng.integers(0, 4, 60))
        recs.append((nm + "/1", s))
        recs.append((nm + "/2", s[::-1]))
    # scramble so mates are 0..9 records apart; drop one mate entirely
    order = list(range(len(recs)))
    for i in range(0, len(order) - 3, 4):
        order[i], order[i + 3] = order[i + 3], order[i]
    recs = [recs[j] for j in order]
    recs.append(("lonely/1", "ACGT" * 15))  # never pairs
    path = tmp_path / "scrambled.fa"
    path.write_text("".join(f">{t}\n{s}\n" for t, s in recs))

    py_pairs = [p for batch in iter_fasta_pairs(str(path), 40, 24, 0, 10**9)
                for p in batch]
    nat = []
    for codes, rlen, n, titles in NativeBatchReader(str(path), 16, 64,
                                                    min_read_size=40):
        for i in range(n):
            nat.append((titles[i], codes[2 * i], rlen[2 * i],
                        codes[2 * i + 1], rlen[2 * i + 1]))
    assert len(nat) == len(py_pairs) == len(names)
    for (t, s1, s2, _), (nt, c1, l1, c2, l2) in zip(py_pairs, nat):
        assert t[1:] == nt
        assert l1 == len(s1) and np.array_equal(c1[:l1], K.encode_bases(s1))
        assert l2 == len(s2) and np.array_equal(c2[:l2], K.encode_bases(s2))


def test_prefetch_iterator_order_and_errors():
    from danbing_tk_tpu.io.prefetch import PrefetchIterator

    assert list(PrefetchIterator(iter(range(100)), depth=3)) == \
        list(range(100))

    def boom():
        yield 1
        raise ValueError("producer died")

    it = iter(PrefetchIterator(boom(), depth=2))
    assert next(it) == 1
    try:
        next(it)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
