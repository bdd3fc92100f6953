"""Native (C++) referee engine == Python host engine, config sweep."""

import os

import numpy as np
import pytest

from danbing_tk_tpu.engine import native_referee as nr
from danbing_tk_tpu.engine.host_align import (AlignConfig, HostAligner,
                                              RPGG, iter_fasta_pairs)


def _run(golden_dir, native, cfgkw, reads, rpggkw):
    rpgg = RPGG(os.path.join(golden_dir, "pan"), **rpggkw)
    cfg = AlignConfig(ksize=21, cth=20, n_filter=4, nm_filter=1, **cfgkw)
    host = HostAligner(rpgg, cfg)
    eng = nr.NativeReferee(host) if native else host
    for batch in iter_fasta_pairs(os.path.join(golden_dir, reads), 40,
                                  rpgg.nloci, cfg.simmode, 150000,
                                  is_fastq=cfg.is_fastq):
        for rec in batch:
            title, s1, s2, src = rec[:4]
            quals = rec[4:6] if len(rec) > 4 else (None, None)
            eng.process_pair(title, s1, s2, src, quals)
        host.flush_batch()
    return host


@pytest.mark.skipif(not nr.available(),
                    reason="build/libdtk_align.so not built")
@pytest.mark.parametrize("name,cfgkw,reads,rpggkw", [
    ("plain", dict(), "reads.fa", dict()),
    ("sim2", dict(simmode=2), "reads.sim.fa", dict()),
    ("bait", dict(simmode=2, bait=True), "reads.sim.fa", dict(bait=True)),
    ("fq-bait", dict(simmode=2, bait=True, is_fastq=True),
     "reads.sim.fq", dict(bait=True)),
])
def test_native_referee_matches(golden_dir, name, cfgkw, reads, rpggkw):
    hp = _run(golden_dir, False, cfgkw, reads, rpggkw)
    hn = _run(golden_dir, True, cfgkw, reads, rpggkw)
    assert hp.kam_rows == hn.kam_rows
    assert np.array_equal(hp.flat_counts(), hn.flat_counts())
    assert np.array_equal(hp.nmapread, hn.nmapread)
    assert np.array_equal(hp.kmc, hn.kmc)
    assert hp.stats == hn.stats
