"""Multi-chip execution: shard_map data parallelism over a device mesh.

Mapping of the reference's parallelism inventory (SURVEY.md §2.4) onto TPU:
  X1 (pthread pool + semaphores)  -> read batches data-parallel over the
                                     "data" mesh axis; host streaming feeds
                                     all chips
  X2 (atomic scatter-increment)   -> per-device scatter-add into a
                                     device-local count shard; cross-chip
                                     merge is one reduction at finalize
                                     (counts are commutative, so no per-batch
                                     psum traffic on ICI)
  X4 (Snakemake/sbatch scale-out) -> multi-host: each host runs a runner on
                                     its local devices; final counts merged
                                     with a single all-reduce

The RPGG tables are replicated per device (HBM-resident; a genome-wide pan
index is a few GB vs ~95 GB v5p HBM).  Index sharding with all-to-all k-mer
routing is the planned fallback for indexes exceeding HBM (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import device_align as da
from ..engine.host_align import AlignConfig


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("data",))


def make_sharded_step(drp: da.DeviceRPGG, cfg: AlignConfig, mesh: Mesh,
                      P_global: int, L: int, expand_cap: int = 512,
                      with_annot: bool = True, with_bubbles: bool = False):
    """Data-parallel batch step over the mesh.

    state arrays carry a leading device axis sharded over "data"; inputs
    are sharded along the pair axis; per-pair outputs come back sharded
    (logically concatenated in pair order).
    """
    ndev = mesh.devices.size
    assert P_global % ndev == 0
    P_local = P_global // ndev
    local_step = da.make_step(drp, cfg, P_local, L, expand_cap=expand_cap,
                              with_annot=with_annot,
                              with_bubbles=with_bubbles, jit=False)

    @jax.jit
    def sharded_step(state, codes, rlen, live):
        def per_device(state_l, codes_l, rlen_l, live_l):
            state_l = jax.tree.map(lambda x: x[0], state_l)
            new_state, out = local_step(state_l, codes_l, rlen_l, live_l)
            new_state = jax.tree.map(lambda x: x[None], new_state)
            return new_state, out

        return jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data")),
            check_vma=False,
        )(state, codes, rlen, live)

    return sharded_step, P_local


def init_sharded_state(drp: da.DeviceRPGG, mesh: Mesh):
    ndev = mesh.devices.size
    state = da.init_state(drp)
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.zeros_like(x), (ndev,) + x.shape),
        state)
    shard = NamedSharding(mesh, P("data"))
    return jax.device_put(state, shard)


def finalize_counts(state) -> dict:
    """Merge per-device accumulators (single cross-chip reduction)."""
    return {k: np.asarray(v).sum(axis=0) for k, v in state.items()}
