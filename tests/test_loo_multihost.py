"""Leave-one-out pipeline + multi-host count merge."""

import os

import numpy as np

from danbing_tk_tpu.engine.host_align import AlignConfig
from danbing_tk_tpu.io import binary as bio
from danbing_tk_tpu.parallel.multihost import (merge_count_files,
                                               shard_predicate)
from danbing_tk_tpu.pipeline.leave_one_out import build_loo_rpgg, eval_loo


def test_loo_pipeline(golden_dir, tmp_path):
    # per-genome builds exist in the golden dir (g0/g1); hold out g1
    import shutil

    for g in ("g0", "g1"):
        for ft in ("tr", "fl", "graph", "tre"):
            shutil.copy(os.path.join(golden_dir, f"{g}.{ft}.kmers"),
                        tmp_path / f"{g}.PB.{ft}.kmers")
    loo = build_loo_rpgg(str(tmp_path), ["g0", "g1"], "g1")
    assert os.path.exists(loo + ".kmers.dbi")
    # genotype g1-derived reads (golden reads cover all haps) vs LOO RPGG
    res = eval_loo(loo, str(tmp_path / "g1.PB"),
                   os.path.join(golden_dir, "reads.fa"),
                   str(tmp_path / "loo"),
                   AlignConfig(ksize=21, cth=20, okam=False, nm_tr=20))
    assert res.shape[1] == 4
    good = res[:, 3] > 0.2
    assert good.sum() >= res.shape[0] // 2  # most loci recovered


def test_multihost_merge(tmp_path):
    rng = np.random.default_rng(0)
    parts = [rng.integers(0, 100, 50).astype(np.uint64) for _ in range(3)]
    for i, p in enumerate(parts):
        bio.write_karray(str(tmp_path / f"host{i}.trkmc.ar"), p)
    total = merge_count_files(str(tmp_path / "host*.trkmc.ar"))
    np.testing.assert_array_equal(total, sum(parts))
    pred = shard_predicate(1, 3)
    assert [b for b in range(9) if pred(b)] == [1, 4, 7]
