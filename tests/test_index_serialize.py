"""Byte-exact serialization vs ktools serialize golden outputs."""

import os

from danbing_tk_tpu.index import dbi


def test_serialize_bit_exact(golden_dir, tmp_path):
    # stage the text inputs, serialize with our implementation
    for fn in ["pan.tr.kmers", "pan.fl.kmers", "pan.tre.kmers"]:
        (tmp_path / fn).write_bytes(
            open(os.path.join(golden_dir, fn), "rb").read()
        )
    dbi.serialize(str(tmp_path / "pan"))
    for fn in ["pan.kmers.dbi", "pan.fl.kdb", "pan.tre.kdb"]:
        ours = (tmp_path / fn).read_bytes()
        gold = open(os.path.join(golden_dir, fn), "rb").read()
        assert ours == gold, f"{fn}: {len(ours)} vs {len(gold)} bytes"
