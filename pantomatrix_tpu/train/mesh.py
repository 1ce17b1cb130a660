"""Device mesh + sharding helpers — the TPU-native replacement for the reference's
NCCL/DDP setup (torch.distributed.init_process_group at train_emage_audio.py:214,
DDP wrap :251, DistributedSampler :275-278).

One mesh, one axis ("data") for the reference's DP-only strategy; the mesh builder
accepts extra axes so TP/SP can be added without touching call sites. Collectives are
XLA's (psum/pmean over ICI/DCN) — there is no backend code to manage.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a Mesh over the first n_devices local devices.

    Multi-process TPU slices: call jax.distributed.initialize() first; jax.devices()
    then spans the slice and the same code shards over ICI/DCN.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if axis_sizes is None:
        axis_sizes = [n_devices] + [1] * (len(axis_names) - 1)
    grid = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(grid, tuple(axis_names))


def make_data_mesh(batch_size: int, axis: str = "data") -> Mesh:
    """Largest device count that divides the global batch (shard_map needs equal
    shards; DistributedSampler pads similarly in the reference)."""
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n, (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-axis sharding: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every leaf of a batch pytree with its leading dim sharded over ``axis``."""
    sh = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)


__all__ = ["data_sharding", "make_data_mesh", "make_mesh", "replicate", "replicated", "shard_batch"]
