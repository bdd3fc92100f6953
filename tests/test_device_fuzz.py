"""Adversarial device-vs-host fuzz: random reads (junk, Ns, short,
chimeric, revcomp) through the device runner at stress expand caps must
produce counts identical to the host-exact aligner.  Exercises the
interval-one-hot covering-run selector's boundaries (runs starting at/
past E, total==E, zero-run pairs) beyond what the golden panels hit."""

import os

import numpy as np
import pytest

from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
from danbing_tk_tpu.engine.host_align import AlignConfig, HostAligner, RPGG


@pytest.mark.parametrize("seed,ecap", [(1, 16), (2, 64), (3, 512)])
def test_device_fuzz_vs_host(golden_dir, tmp_path, seed, ecap):
    rng = np.random.default_rng(seed)
    pan = os.path.join(golden_dir, "pan")
    rpgg = RPGG(pan)

    # harvest real TR sequence from the golden panel's reads for
    # motif-sharing pressure, then mix with junk/N/short/chimeric reads
    with open(os.path.join(golden_dir, "reads.fa")) as f:
        seqs = [l.strip() for l in f if not l.startswith(">")]

    def rand_seq(n):
        return "".join("ACGTN"[i] for i in
                       rng.choice(5, n, p=[.24, .24, .24, .24, .04]))

    comp = str.maketrans("ACGTN", "TGCAN")
    pairs = []
    for i in range(400):
        kind = i % 5
        if kind == 0:                       # real pair from the panel
            s1 = seqs[int(rng.integers(len(seqs)))]
            s2 = seqs[int(rng.integers(len(seqs)))]
        elif kind == 1:                     # junk
            s1, s2 = rand_seq(150), rand_seq(150)
        elif kind == 2:                     # short / empty-ish
            s1 = seqs[int(rng.integers(len(seqs)))][:int(rng.integers(0, 60))]
            s2 = rand_seq(int(rng.integers(0, 45)))
        elif kind == 3:                     # chimeric: real + junk splice
            a = seqs[int(rng.integers(len(seqs)))]
            s1 = a[:70] + rand_seq(80)
            s2 = rand_seq(60) + a[70:]
        else:                               # revcomp real pair
            a = seqs[int(rng.integers(len(seqs)))]
            s1 = a.translate(comp)[::-1]
            s2 = seqs[int(rng.integers(len(seqs)))]
        pairs.append((s1, s2))
    reads = tmp_path / "fuzz.fa"
    with open(reads, "w") as f:
        for i, (s1, s2) in enumerate(pairs):
            f.write(f">f{i}/1\n{s1}\n>f{i}/2\n{s2}\n")

    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, okam=False)
    host = HostAligner(RPGG(pan), cfg)
    host.run_file(str(reads))

    dev = DeviceAlignRunner(RPGG(pan), cfg, batch_pairs=128,
                            max_read_len=192, expand_cap=ecap)
    dev.run_file_native(str(reads), prefilter=True)
    np.testing.assert_array_equal(dev.flat_counts(), host.flat_counts())
