"""Device mesh + sharding helpers — the TPU-native replacement for the reference's
NCCL/DDP setup (torch.distributed.init_process_group at train_emage_audio.py:214,
DDP wrap :251, DistributedSampler :275-278).

One mesh, one axis ("data") for the reference's DP-only strategy; the mesh builder
accepts extra axes so TP/SP can be added without touching call sites. Collectives are
XLA's (psum/pmean over ICI/DCN) — there is no backend code to manage.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> Tuple[int, int]:
    """Multi-process JAX init — the ``torchrun --nnodes M`` analogue
    (/root/reference/README.md:329; NCCL init at train_emage_audio.py:214).

    Launch modes (checked in order):
    - explicit: PANTO_COORDINATOR=<host:port> PANTO_NUM_PROCESSES=<M>
      PANTO_PROCESS_ID=<rank> — works on any backend (CPU simulation included);
    - auto: PANTO_DISTRIBUTED=1 — TPU pods, where jax.distributed.initialize()
      discovers coordinator/rank from the TPU environment;
    - single-process otherwise (no-op).

    Returns (process_index, process_count). Call BEFORE any other jax use; train
    CLIs feed the result into DataLoader(process_index=..., process_count=...) so
    each process consumes a disjoint shard of every epoch.
    """
    coord = os.environ.get("PANTO_COORDINATOR")
    nproc = os.environ.get("PANTO_NUM_PROCESSES")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ["PANTO_PROCESS_ID"]),
        )
    elif os.environ.get("PANTO_DISTRIBUTED"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


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
    if n_devices > len(devices):
        raise ValueError(f"asked for {n_devices} devices, only {len(devices)} visible")
    devices = devices[:n_devices]
    if axis_sizes is None:
        axis_sizes = [n_devices] + [1] * (len(axis_names) - 1)
    total = int(np.prod(axis_sizes))
    if total != n_devices:
        raise ValueError(
            f"axis_sizes {tuple(axis_sizes)} (product {total}) must multiply out to "
            f"the device count {n_devices} — e.g. 8 devices support (4, 2) or (2, 4), "
            f"not (3, 2)"
        )
    grid = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(grid, tuple(axis_names))


def make_data_mesh(batch_size: int, axis: str = "data") -> Mesh:
    """Largest device count that divides the global batch (shard_map needs equal
    shards; DistributedSampler pads similarly in the reference)."""
    n = len(jax.devices())
    if jax.process_count() > 1 and batch_size % n:
        # shrinking the mesh would orphan some process's devices; every process
        # must own an equal slice of the batch axis (DataLoader yields
        # batch_size/process_count rows per process)
        raise ValueError(
            f"multi-process runs need global batch_size={batch_size} divisible by "
            f"the global device count {n}"
        )
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n, (axis,))


def make_train_mesh(batch_size: int, model_axis: int = 1) -> Mesh:
    """Training mesh from config: 1D ("data",) when model_axis<=1 (DDP parity),
    else a 2D ("data", "model") mesh for FSDP/ZeRO-3 param sharding
    (solver.fsdp_model_axis in the train CLIs)."""
    if model_axis <= 1:
        return make_data_mesh(batch_size)
    n = len(jax.devices())
    if n % model_axis:
        raise ValueError(f"fsdp_model_axis={model_axis} must divide the device "
                         f"count {n}")
    dp = n // model_axis
    if batch_size % dp:
        raise ValueError(f"global batch_size={batch_size} must divide over the "
                         f"data axis ({dp} of {n} devices at "
                         f"fsdp_model_axis={model_axis})")
    return make_mesh(n, ("data", "model"), (dp, model_axis))


def fsdp_enabled(mesh: Mesh) -> bool:
    """THE placement rule: a mesh trains FSDP iff it has a model axis of size>1.
    Single source of truth for the CLIs (param_placement selection),
    place_train_state, and the resume path."""
    return "model" in mesh.axis_names and mesh.shape["model"] > 1


def place_train_state(params, opt_state, mesh: Mesh):
    """Initial placement for (params, opt_state) on a training mesh: FSDP-sharded
    over the model axis when ``fsdp_enabled(mesh)``, replicated otherwise.
    Matches the step's param_placement: "inherit" steps keep whatever this
    chose; "replicated" steps require the replicated form."""
    if fsdp_enabled(mesh):
        return (shard_tree_fsdp(params, mesh, "model"),
                shard_tree_fsdp(opt_state, mesh, "model"))
    return replicate(params, mesh), replicate(opt_state, mesh)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-axis sharding: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def fsdp_spec(shape, mesh: Mesh, axis: str = "model") -> "P":
    """FSDP/ZeRO-3 placement rule for one param leaf: shard the LARGEST dim that
    divides the model-axis size; replicate small/indivisible leaves (biases, BN
    vectors, scalars). Purely shape-based, so the same rule applies to optimizer
    moments (same shapes) without knowing the optax state structure."""
    size = mesh.shape[axis]
    if size == 1 or not shape:
        return P()
    dims = [d for d in range(len(shape)) if shape[d] % size == 0 and shape[d] >= size]
    if not dims:
        return P()
    best = max(dims, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def shard_tree_fsdp(tree, mesh: Mesh, axis: str = "model"):
    """Place every leaf of a pytree per ``fsdp_spec`` (params, opt state, or any
    tree of arrays). Params live sharded in HBM; GSPMD all-gathers them at use
    and reduce-scatters gradients — ZeRO-3 semantics with zero backend code.
    The train steps inherit input shardings for params/opt_state
    (train/steps.py ``_make_step``), so placing trees with this helper before
    training is the whole opt-in."""
    multiproc = jax.process_count() > 1

    def place(x):
        sh = NamedSharding(mesh, fsdp_spec(np.shape(x), mesh, axis))
        if multiproc:
            # the mesh spans devices this process can't address, so a plain
            # device_put of host data is illegal for a *sharded* target; build
            # the global array from per-shard host slices instead (every
            # process holds the same full value — train CLIs init/restore
            # identically on all ranks)
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
        x = np.asarray(x) if not hasattr(x, "sharding") else x
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def gather_replicated(tree, mesh: Mesh):
    """All-gather an FSDP-sharded tree into fully-replicated form (one compiled
    identity program with replicated out_shardings — XLA emits the all-gathers
    over ICI). Under multi-process training this is a COLLECTIVE: every process
    must call it. The result is fully addressable on every process, so val/test
    passes and checkpoint writes can pull leaves to host (the pod-scale analogue
    of the reference's rank-0 eval over DDP-replicated weights,
    /root/reference/train_emage_audio.py:214-251,320)."""
    # jax caches compiled executables by FUNCTION IDENTITY (CLAUDE.md pitfall):
    # a fresh lambda per call would re-trace the identity all-gather over the
    # full params+opt trees on EVERY val/test/final gather. Cache per mesh.
    fn = _GATHER_CACHE.get(mesh)
    if fn is None:
        fn = jax.jit(lambda t: t, out_shardings=replicated(mesh))
        _GATHER_CACHE[mesh] = fn
    return fn(tree)


_GATHER_CACHE: dict = {}


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every leaf of a batch pytree with its leading dim sharded over ``axis``.

    Single process: a plain device_put of the (global) host batch. Multi-process:
    each process holds only ITS rows (DataLoader yields batch_size/process_count of
    the global batch, block-ordered so process p's rows land exactly where the
    single-process run puts them), and ``make_array_from_process_local_data``
    assembles the global jax.Array over the full mesh without any cross-host copy.
    """
    sh = data_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate every leaf over the mesh. Multi-process: leaves must hold the SAME
    value on every process (train CLIs init params from the same seed); device_put
    of host data to a fully-replicated NamedSharding is legal across processes."""
    if jax.process_count() > 1:
        # normalize to host numpy first: locally-committed jax.Arrays can't be
        # re-placed onto a global (partially non-addressable) sharding directly
        tree = jax.tree_util.tree_map(np.asarray, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)


__all__ = ["data_sharding", "fsdp_enabled", "fsdp_spec", "gather_replicated",
           "make_data_mesh", "make_mesh", "make_train_mesh",
           "maybe_init_distributed", "place_train_state", "replicate",
           "replicated", "shard_batch", "shard_tree_fsdp"]
