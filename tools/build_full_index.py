#!/usr/bin/env python
"""Build the FULL production-scale index (~1.2e9 dbi keys, the
reference's genome-wide RPGG size, /root/reference/README.md:22) on the
host and cache it to disk.  Records build wall time, peak RSS, and table
bytes for PERF.md (VERDICT r3 item 5).

Usage: python tools/build_full_index.py [nloci] [kmers_per_locus]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.make_scale_index import build_scale_rpgg_cached  # noqa


def main():
    nloci = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000
    kpl = int(sys.argv[2]) if len(sys.argv) > 2 else 15_000
    t0 = time.time()
    drp, seqs = build_scale_rpgg_cached(nloci, kpl)
    wall = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # GB
    dbi_keys = sum(t.shape[0] for t, _ in drp.dbi_tab.levels)
    gb = dict(
        dbi=drp.dbi_tab.nbytes / 1e9,
        trfl=(drp.trfl_tab.nbytes / 1e9) if drp.trfl_tab else 0.0,
        member=drp.member_tab.nbytes / 1e9,
        vv=drp.vv.nbytes / 1e9,
    )
    print(f"FULL-INDEX nloci={nloci} kpl={kpl} slots={drp.nslots/1e9:.3f}e9"
          f" wall={wall:.0f}s peak_rss={rss:.1f}GB"
          f" bytes: dbi={gb['dbi']:.2f} trfl={gb['trfl']:.2f}"
          f" member={gb['member']:.2f} vv={gb['vv']:.2f}"
          f" total={sum(gb.values()):.2f} GB")


if __name__ == "__main__":
    main()
