"""Fastq ingest + quality-masked bait filter: bit-exact vs reference."""

import os

from danbing_tk_tpu.engine.host_align import (AlignConfig, HostAligner,
                                              RPGG, qstring_to_qmask)


def test_qmask_basics():
    # NOTE: expectations trace the reference qString2qMask exactly —
    # including its quirk of leaving the last k-1 windows False on a
    # clean run (the while loop returns when qi reaches nk)
    assert qstring_to_qmask("IIIIII", 20, 3) == [True, True, False, False]
    m = qstring_to_qmask("II#III", 20, 3)
    assert m == [False, False, False, True]
    assert qstring_to_qmask("##", 20, 3) == []


def test_fastq_bait_bit_exact(golden_dir, tmp_path):
    rpgg = RPGG(os.path.join(golden_dir, "pan"), bait=True)
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=2,
                      bait=True, is_fastq=True)
    al = HostAligner(rpgg, cfg)
    al.run_file(os.path.join(golden_dir, "reads.sim.fq"))
    al.write_kam(tmp_path / "out.kam")
    al.write_trkmc_ar(tmp_path / "out.trkmc.ar")
    al.write_summary(tmp_path / "out.sum")
    gold = lambda n: open(os.path.join(golden_dir, n), "rb").read()
    assert (tmp_path / "out.trkmc.ar").read_bytes() == gold(
        "out.fq.trkmc.ar")
    assert (tmp_path / "out.sum").read_bytes() == gold(
        "out.fq.tr.summary.txt")
    assert (tmp_path / "out.kam").read_bytes() == gold("out.fq.kam")
