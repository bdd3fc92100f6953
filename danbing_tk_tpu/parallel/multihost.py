"""Multi-host scale-out for align (replaces the reference's
Snakemake/sbatch node fan-out, SURVEY §2.4 X4).

Counts are commutative, so the multi-host recipe is embarrassingly
simple and fault-tolerant:

  1. shard the input stream by host: host i of H processes batch b when
     b % H == i (or pre-split FASTQ shards; `shard_predicate`)
  2. each host runs its DeviceAlignRunner over its local mesh
     (parallel/mesh.py), periodically checkpointing
  3. final per-locus counts = elementwise sum of every host's flat count
     array (`merge_count_files`), either via files on shared storage or
     one jax.distributed psum at the end

With jax.distributed initialized (multi-controller), `global_merge` does
the final reduction over ICI/DCN; otherwise file-based merging works
across any scheduler.
"""

from __future__ import annotations

import glob

import numpy as np

from ..io import binary as bio


def shard_predicate(host_id: int, nhosts: int):
    """Batch-level round-robin sharding predicate."""
    return lambda batch_index: batch_index % nhosts == host_id


def save_host_counts(path: str, runner) -> None:
    bio.write_karray(path, runner.flat_counts())


def merge_count_files(pattern: str) -> np.ndarray:
    """Sum per-host .ar count files (shared-filesystem merge)."""
    paths = sorted(glob.glob(pattern))
    assert paths, pattern
    total = bio.read_karray(paths[0]).astype(np.uint64)
    for p in paths[1:]:
        total = total + bio.read_karray(p)
    return total


def global_merge(local_counts):
    """Cross-host all-reduce of the final count vector (requires
    jax.distributed.initialize on every host)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("d",))

    def f(x):
        return jax.lax.psum(x, "d")

    return np.asarray(
        jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P(None),
                              out_specs=P(None)))(jnp.asarray(local_counts)))
