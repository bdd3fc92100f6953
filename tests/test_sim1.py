"""simmode-1 (locus-grouped read titles): bit-exact vs reference."""

import os

from danbing_tk_tpu.engine.host_align import AlignConfig, HostAligner, RPGG


def test_sim1_bit_exact(golden_dir, tmp_path):
    rpgg = RPGG(os.path.join(golden_dir, "pan"))
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, simmode=1)
    al = HostAligner(rpgg, cfg)
    al.run_file(os.path.join(golden_dir, "reads.s1.fa"))
    al.write_kam(tmp_path / "out.kam")
    al.write_trkmc_ar(tmp_path / "out.trkmc.ar")
    gold = lambda n: open(os.path.join(golden_dir, n), "rb").read()
    assert (tmp_path / "out.trkmc.ar").read_bytes() == gold(
        "out.s1.trkmc.ar")
    assert (tmp_path / "out.kam").read_bytes() == gold("out.s1.kam")
