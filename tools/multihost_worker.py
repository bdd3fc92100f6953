#!/usr/bin/env python
"""One controller of a multi-process genotyping run (SURVEY §2.4 X4).

Usage: multihost_worker.py PID NPROC PORT READS PAN OUTDIR

Initializes jax.distributed against localhost:PORT, aligns this
process's round-robin shard of the PE read pairs, and global_merge()s
the per-locus counts across all processes; every process writes the
merged vector to OUTDIR/merged.<pid>.npy (they must be identical, and
byte-equal to a single-process run — tests/test_multihost_distributed.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, reads, pan, outdir = sys.argv[3:7]

    import jax

    # the axon sitecustomize force-overrides JAX_PLATFORMS via jax.config
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)

    import numpy as np

    from danbing_tk_tpu.engine.host_align import (AlignConfig, HostAligner,
                                                  RPGG)
    from danbing_tk_tpu.parallel.multihost import (global_merge,
                                                   shard_predicate)

    # pre-split shard: route by pair identity (the aligner pairs records
    # via a title hashmap, host_align.iter_fasta_pairs) so both mates of
    # a pair land on the same host; shard_predicate over a stable digest
    # of the pruned title
    import zlib

    from danbing_tk_tpu.engine.host_align import prune_pe_info

    keep = shard_predicate(pid, nproc)
    shard = os.path.join(outdir, f"shard.{pid}.fa")
    with open(reads) as f, open(shard, "w") as out:
        lines = f.read().splitlines()
        for i in range(0, len(lines), 2):
            pair_title = prune_pe_info(lines[i])
            if keep(zlib.crc32(pair_title.encode())):
                out.write("\n".join(lines[i:i + 2]) + "\n")

    al = HostAligner(RPGG(pan),
                     AlignConfig(ksize=21, cth=20, okam=False, nm_tr=20))
    al.run_file(shard)
    merged = global_merge(al.flat_counts())
    np.save(os.path.join(outdir, f"merged.{pid}.npy"), merged)
    print(f"[worker {pid}] devices={jax.device_count()} "
          f"processes={jax.process_count()} counts={int(merged.sum())}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
