"""Device-mesh and sharding helpers.

The reference is single-GPU (SURVEY §2.4: no DP/TP/PP anywhere); its only
parallelism is threads batching across cameras. The TPU build scales the same
workload across chips by sharding the STREAM-BATCH axis over a mesh (data
parallel over cameras: each chip runs the identical fused detector program on
its shard), and optionally sharding large parameters over a model axis
(fsdp/tensor-style) for the big Stage-2 classifier. Collectives ride ICI;
XLA inserts them from sharding annotations — nothing here speaks NCCL/MPI.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"    # stream-batch axis (cameras / frames)
MODEL_AXIS = "mp"   # parameter sharding axis (tensor/fsdp style)


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a (dp, mp) mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if n_devices % model_parallel != 0:
        raise ValueError(f"{n_devices} devices not divisible by "
                         f"model_parallel={model_parallel}")
    grid = np.array(devices).reshape(n_devices // model_parallel,
                                     model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (stream-batch) axis over dp; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rule(mesh: Mesh, path: Tuple, leaf: Any) -> NamedSharding:
    """fsdp-style parameter sharding: shard the largest divisible axis of
    big tensors over the model axis; replicate small ones."""
    mp = mesh.shape[MODEL_AXIS]
    shape = getattr(leaf, "shape", ())
    if mp <= 1 or not shape or math.prod(shape) < 2 ** 16:
        return replicated(mesh)
    # choose the largest axis divisible by mp
    best_axis, best_size = None, 0
    for i, s in enumerate(shape):
        if s % mp == 0 and s > best_size:
            best_axis, best_size = i, s
    if best_axis is None:
        return replicated(mesh)
    spec = [None] * len(shape)
    spec[best_axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a parameter pytree onto the mesh per the fsdp rule."""
    def place(path, leaf):
        return jax.device_put(leaf, param_sharding_rule(mesh, path, leaf))
    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """The sharding pytree (for jit in_shardings) matching shard_params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: param_sharding_rule(mesh, path, leaf), params)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
