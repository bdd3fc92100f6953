"""Threading mode on the native production funnel: device DFA resolves
clean walks, error-correction pairs fan over the ParallelThreader pool,
results re-serialize in pair order — .aln/.tr.kmers byte-identical to
the slow path's goldens (themselves golden-tested against the threading
oracle)."""

import os

import pytest

from danbing_tk_tpu.engine.align_runner import DeviceAlignRunner
from danbing_tk_tpu.engine.host_align import AlignConfig, RPGG


def _gold(golden_dir, name):
    return open(os.path.join(golden_dir, name), "rb").read()


@pytest.mark.parametrize("prefilter", [False, True])
def test_native_threading_bit_exact(golden_dir, tmp_path, prefilter):
    rpgg = RPGG(os.path.join(golden_dir, "pan"))
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      simmode=2, threading=True, thread_cth=50,
                      maxncorrection=3, aln=True)
    run = DeviceAlignRunner(rpgg, cfg, batch_pairs=512, max_read_len=192)
    run.run_file_native(os.path.join(golden_dir, "reads.sim.fa"),
                        prefilter=prefilter)
    run.write_aln(tmp_path / "out.aln")
    run.write_tr_kmers(tmp_path / "out.tr.kmers")
    assert (tmp_path / "out.aln").read_bytes() == _gold(
        golden_dir, "out.thread.aln")
    assert (tmp_path / "out.tr.kmers").read_bytes() == _gold(
        golden_dir, "out.thread.tr.kmers")
    total = run.n_host_thread + run.n_referee
    assert total < 2500  # majority handled on device


def test_native_threading_retry_ladder(golden_dir, tmp_path):
    """Threading + the retry ladder: overflow pairs resolve on bigger-E
    tiers, ordinal reordering keeps .aln in pair order."""
    rpgg = RPGG(os.path.join(golden_dir, "pan"))
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      simmode=2, threading=True, thread_cth=50,
                      maxncorrection=3, aln=True)
    run = DeviceAlignRunner(rpgg, cfg, batch_pairs=256, max_read_len=192,
                            expand_cap=64, retry_expand=[512])
    run.run_file_native(os.path.join(golden_dir, "reads.sim.fa"),
                        prefilter=True)
    assert run.n_retried > 0
    run.write_aln(tmp_path / "out.aln")
    run.write_tr_kmers(tmp_path / "out.tr.kmers")
    assert (tmp_path / "out.aln").read_bytes() == _gold(
        golden_dir, "out.thread.aln")
    assert (tmp_path / "out.tr.kmers").read_bytes() == _gold(
        golden_dir, "out.thread.tr.kmers")


def test_native_threading_checkpoint_resume(golden_dir, tmp_path):
    """Crash-resume a threading-mode run with the BATCHED fallback
    (dtk_thread_pairs): counts deferred in native CountMaps must drain
    at the checkpoint snapshot, so a resume from the mid-run checkpoint
    neither loses nor double-counts fallback k-mers — .tr.kmers (and
    .aln re-serialization) byte-identical to the goldens."""
    import shutil

    reads = os.path.join(golden_dir, "reads.sim.fa")
    ck = str(tmp_path / "thr.ckpt")
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      simmode=2, threading=True, thread_cth=50,
                      maxncorrection=3, aln=False)
    r1 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=128, max_read_len=192)
    mid = {}
    orig_write = r1._ckpt_write

    def hook(path, cursor, state, hsnap, extra):
        orig_write(path, cursor, state, hsnap, extra)
        if not mid:                      # keep the FIRST (mid-run) save
            shutil.copy(path, path + ".mid")
            mid["cursor"] = cursor

    r1._ckpt_write = hook
    r1.run_file_native(reads, checkpoint=ck, checkpoint_every=256,
                       prefilter=True)
    assert r1.n_host_thread > 0, "no fallback pairs batched"
    r1.write_tr_kmers(tmp_path / "a.tr.kmers")
    assert (tmp_path / "a.tr.kmers").read_bytes() == _gold(
        golden_dir, "out.thread.tr.kmers")

    assert mid, "no mid-run checkpoint was captured"
    assert mid["cursor"] > 0
    shutil.copy(ck + ".mid", ck)
    r2 = DeviceAlignRunner(RPGG(os.path.join(golden_dir, "pan")), cfg,
                           batch_pairs=128, max_read_len=192)
    r2.run_file_native(reads, checkpoint=ck, checkpoint_every=256,
                       prefilter=True)
    r2.write_tr_kmers(tmp_path / "b.tr.kmers")
    assert (tmp_path / "b.tr.kmers").read_bytes() == _gold(
        golden_dir, "out.thread.tr.kmers")
