"""Multi-host serving/training: jax.distributed + DCN-aware hybrid meshes.

The reference is a single process (SURVEY §5 "Distributed communication
backend: absent"); its scale-out story stops at one GPU. This layer is the
TPU-native multi-host extension called for by SURVEY §2.4/§5: each host runs
one process pinned to its local chips, `jax.distributed` wires the cluster
over DCN (gRPC coordination + XLA collectives across hosts), and the mesh is
laid out so the heavy axis (model/fsdp collectives) stays on ICI within a
host while only the stream-batch (data) axis crosses DCN — the standard
hybrid-mesh recipe.

Serving integration: shard cameras across hosts by giving each host's config
its own camera subset, and use `initialize_distributed` + `create_mesh` with
the GLOBAL device list so parameters replicate cluster-wide; the client-plane
(WebSocket/REST) stays per-host and byte-compatible.

Hermetically tested by spawning real multi-process CPU clusters
(tests/test_distributed.py): two processes, coordinator on localhost, a psum
and a sharded train step crossing the process boundary.
"""
from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import numpy as np

from telescope_cam_detection_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

logger = logging.getLogger(__name__)

_initialized = False


def initialize_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join (or start, for process 0) a jax.distributed cluster.

    Must run before any other jax API initializes a backend. Idempotent per
    process. coordinator_address: "host:port" of process 0 (DCN-reachable).
    """
    global _initialized
    if _initialized:
        logger.info("jax.distributed already initialized; skipping")
        return
    import jax
    if not (0 <= process_id < num_processes):
        raise ValueError(f"process_id {process_id} out of range "
                         f"[0, {num_processes})")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    logger.info("jax.distributed up: process %d/%d, %d local / %d global "
                "devices", process_id, num_processes,
                jax.local_device_count(), jax.device_count())


def create_hybrid_mesh(model_parallel: int = 1):
    """(dp, mp) mesh over the GLOBAL device list with mp confined to one
    host: mp collectives (parameter gathers) ride ICI, and only dp
    (stream-batch / gradient reductions) crosses DCN.

    model_parallel must divide the per-host device count.
    """
    import jax
    from jax.sharding import Mesh
    local = jax.local_device_count()
    if model_parallel > local or local % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide the per-host "
            f"device count ({local})")
    try:
        from jax.experimental import mesh_utils
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // model_parallel, model_parallel),
            dcn_mesh_shape=(jax.process_count(), 1),
            devices=jax.devices())
    except Exception as e:  # pragma: no cover - fallback for odd topologies
        logger.warning("hybrid mesh builder unavailable (%s); falling back "
                       "to process-major reshape", e)
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        grid = np.array(devs).reshape(-1, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def process_local_batch_slice(global_batch: int) -> slice:
    """Which rows of the global stream-batch this process feeds (data is
    host-local in multi-host jax: each process provides its own shard)."""
    import jax
    per = global_batch // jax.process_count()
    if global_batch % jax.process_count():
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{jax.process_count()} processes")
    start = jax.process_index() * per
    return slice(start, start + per)


def make_global_batch(local_rows: np.ndarray, mesh,
                      spec_ndim: Optional[int] = None) -> Any:
    """Assemble a GLOBAL sharded array from this process's local rows
    (jax.make_array_from_process_local_data) sharded over dp."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    ndim = spec_ndim if spec_ndim is not None else local_rows.ndim
    sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_rows)
