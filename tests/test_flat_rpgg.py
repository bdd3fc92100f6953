"""Flat-array host view (flat_rpgg.FlatRPGG) == dict-backed RPGG.

The flat view is the production-scale referee substrate (1e8+ keys where
dict builds are infeasible); these tests force the SAME reads through
the dict-backed HostAligner and a FlatRPGG recovered purely from the
device bucket tables, via both the Python path and the native (C++)
zero-copy flat engine, and require identical outputs.
"""

import os

import numpy as np
import pytest

from danbing_tk_tpu.engine import native_referee as nr
from danbing_tk_tpu.engine.device_align import DeviceRPGG
from danbing_tk_tpu.engine.flat_rpgg import FlatRPGG
from danbing_tk_tpu.engine.host_align import (AlignConfig, HostAligner,
                                              RPGG, iter_fasta_pairs)


@pytest.fixture(scope="module")
def dict_rpgg(golden_dir=None):
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    return RPGG(os.path.join(golden_dir, "pan"))


@pytest.fixture(scope="module")
def flat_rpgg(dict_rpgg):
    drp = DeviceRPGG.build(dict_rpgg, with_tre=True)
    return FlatRPGG.from_device_tables(drp)


def test_flat_view_contents(dict_rpgg, flat_rpgg):
    g, f = dict_rpgg, flat_rpgg
    assert f.nloci == g.nloci
    assert len(f.dbi) == len(g.dbi)
    for km, v in list(g.dbi.items())[:500]:
        assert km in f.dbi
        assert f.dbi[km] == v
        assert f.dbi.get(km) == v
    assert f.dbi.get(12345678901234567) is None
    assert np.array_equal(f.vv, g.vv)
    for li in range(g.nloci):
        assert set(f.tr_counts[li].keys_array().tolist()) == \
            set(g.tr_counts[li].keys())
        assert set(iter(f.fl_sets[li])) == set(g.fl_sets[li])
        assert set(iter(f.tre_sets[li])) == set(g.tre_sets[li])
        # rank order must replay the trkmc flatten (insertion) order
        assert list(f.tr_orders[li]) == list(g.tr_orders[li])


def _run(rpgg, reads_path, engine, cfgkw=None):
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1,
                      **(cfgkw or {}))
    host = HostAligner(rpgg, cfg)
    eng = nr.NativeReferee(host) if engine == "native" else host
    for batch in iter_fasta_pairs(reads_path, 40, rpgg.nloci,
                                  cfg.simmode, 150000):
        for title, s1, s2, src in batch:
            eng.process_pair(title, s1, s2, src)
        host.flush_batch()
    return host


@pytest.mark.parametrize("cfgkw", [dict(), dict(okam=True, simmode=2)])
def test_flat_python_path_exact(golden_dir, dict_rpgg, flat_rpgg, cfgkw):
    reads = os.path.join(
        golden_dir, "reads.sim.fa" if cfgkw.get("simmode") else "reads.fa")
    hd = _run(dict_rpgg, reads, "python", cfgkw)
    hf = _run(flat_rpgg, reads, "python", cfgkw)
    assert np.array_equal(hd.flat_counts(), hf.flat_counts())
    assert np.array_equal(hd.nmapread, hf.nmapread)
    assert np.array_equal(hd.kmc, hf.kmc)
    assert hd.stats == hf.stats
    assert hd.kam_rows == hf.kam_rows


@pytest.mark.skipif(not nr.available(),
                    reason="build/libdtk_align.so not built")
def test_flat_native_engine_exact(golden_dir, dict_rpgg, flat_rpgg):
    reads = os.path.join(golden_dir, "reads.fa")
    hd = _run(dict_rpgg, reads, "native")
    hf = _run(flat_rpgg, reads, "native")
    assert np.array_equal(hd.flat_counts(), hf.flat_counts())
    assert np.array_equal(hd.nmapread, hf.nmapread)
    assert np.array_equal(hd.kmc, hf.kmc)
    assert hd.stats == hf.stats
    assert hd.kam_rows == hf.kam_rows


def test_flat_bubbles_exact(golden_dir, dict_rpgg, flat_rpgg, tmp_path):
    """-bu bubble counting reads tre_sets; outputs must match."""
    reads = os.path.join(golden_dir, "reads.fa")
    hd = _run(dict_rpgg, reads, "python", dict(output_bubbles=True))
    hf = _run(flat_rpgg, reads, "python", dict(output_bubbles=True))
    hd.write_bubbles(tmp_path / "d.bub")
    hf.write_bubbles(tmp_path / "f.bub")
    assert (tmp_path / "d.bub").read_bytes() == \
        (tmp_path / "f.bub").read_bytes()
