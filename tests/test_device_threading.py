"""Device threading DFA fast path: bit-exact .aln/.tr.kmers vs the
threading oracle; most pairs stay on device."""

import os

import pytest

from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG


def _gold(golden_dir, name):
    return open(os.path.join(golden_dir, name), "rb").read()


def test_device_threading_bit_exact(golden_dir, tmp_path):
    rpgg = RPGG(os.path.join(golden_dir, "pan"))
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2,
                      threading=True, thread_cth=50, maxncorrection=3,
                      aln=True)
    run = DeviceAlignRunner(rpgg, cfg, batch_pairs=1024, max_read_len=192)
    run.run_file(os.path.join(golden_dir, "reads.sim.fa"))
    run.write_aln(tmp_path / "out.aln")
    run.write_tr_kmers(tmp_path / "out.tr.kmers")
    ours = (tmp_path / "out.aln").read_bytes()
    gold = _gold(golden_dir, "out.thread.aln")
    if ours != gold:
        a, b = ours.split(b"\n"), gold.split(b"\n")
        nd = sum(1 for x, y in zip(a, b) if x != y)
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print("row", i)
                print("ours:", x[:250])
                print("gold:", y[:250])
                break
        raise AssertionError(f"aln differs {nd}/{len(b)} rows")
    assert (tmp_path / "out.tr.kmers").read_bytes() == _gold(
        golden_dir, "out.thread.tr.kmers")
    total = run.n_host_thread + run.n_referee
    print(f"host fallback: {run.n_host_thread} thread + "
          f"{run.n_referee} referee of ~4400 pairs")
    assert total < 2500  # majority handled on device
