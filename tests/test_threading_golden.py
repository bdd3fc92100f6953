"""Threading aligner vs the re-enabled reference oracle (.aln + counts)."""

import os

import pytest

from danbing_tk_tpu.engine.host_align import AlignConfig, HostAligner, RPGG


def _gold(golden_dir, name):
    return open(os.path.join(golden_dir, name), "rb").read()


def test_threading_bit_exact(golden_dir, tmp_path):
    rpgg = RPGG(os.path.join(golden_dir, "pan"))
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2,
                      threading=True, thread_cth=50, maxncorrection=3,
                      aln=True)
    al = HostAligner(rpgg, cfg)
    al.run_file(os.path.join(golden_dir, "reads.sim.fa"))
    al.write_aln(tmp_path / "out.aln")
    al.write_tr_kmers(tmp_path / "out.tr.kmers")
    ours = (tmp_path / "out.aln").read_bytes()
    gold = _gold(golden_dir, "out.thread.aln")
    if ours != gold:
        a = ours.split(b"\n")
        b = gold.split(b"\n")
        ndiff = sum(1 for x, y in zip(a, b) if x != y)
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print("first diff row", i)
                print("ours:", x[:400])
                print("gold:", y[:400])
                break
        raise AssertionError(f"aln differs: {ndiff}/{len(b)} rows")
    assert (tmp_path / "out.tr.kmers").read_bytes() == _gold(
        golden_dir, "out.thread.tr.kmers")
