"""Pallas TPU kernel: fused NMS suppression (IoU matrix + greedy fixpoint).

The XLA path (ops/nms.py) materializes the KxK IoU matrix in HBM between
fixpoint passes; this kernel keeps boxes, the IoU matrix, and the keep mask
resident in VMEM for the whole suppression, so each fixpoint pass is a pure
VPU sweep with zero HBM traffic. One grid step per batch element.

K (pre-NMS candidate count) is padded to a multiple of 128 (lane width).
Semantics are identical to ops.nms._greedy_suppress (score-desc-sorted
greedy, torchvision-compatible); tests cross-check both paths.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _suppress_kernel(boxes_ref, valid_ref, thr_ref, keep_ref, iou_scratch):
    """boxes (K, 4) score-desc sorted; valid (K, 1) float 1/0; thr (1, 1).
    keep (K, 1) float output. iou_scratch (K, K)."""
    boxes = boxes_ref[0]                      # (K, 4) VMEM
    k = boxes.shape[0]
    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2, y2 = boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    # pairwise IoU, computed once into VMEM scratch
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0.0, inter / union, 0.0)

    thr = thr_ref[0, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    over = jnp.where((iou > thr) & (rows < cols), 1.0, 0.0)
    iou_scratch[:] = over                     # (K, K) suppression graph

    valid = valid_ref[0][:, 0]                # (K,)

    def body(state):
        keep, _, it = state
        # suppressed[i] = any_j over[j, i] * keep[j]  -> one VPU matvec-like
        suppressed = jnp.max(iou_scratch[:] * keep[:, None], axis=0)
        new_keep = jnp.where(suppressed > 0.0, 0.0, valid)
        return new_keep, keep, it + 1

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.asarray(0, jnp.int32)))
    keep_ref[0] = keep[:, None]


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_suppress(
    boxes: jnp.ndarray,      # (B, K, 4) score-desc sorted, class-offset applied
    valid: jnp.ndarray,      # (B, K) bool
    iou_threshold: float = 0.45,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy keep mask per batch element -> (B, K) bool."""
    b, k, _ = boxes.shape
    k_pad = _round_up(k, 128)
    if k_pad != k:
        boxes = jnp.pad(boxes, ((0, 0), (0, k_pad - k), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, k_pad - k)))
    thr = jnp.full((1, 1), iou_threshold, jnp.float32)

    keep = pl.pallas_call(
        _suppress_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k_pad, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, k_pad, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k_pad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k_pad, k_pad), jnp.float32)],
        interpret=interpret,
    )(boxes.astype(jnp.float32),
      valid.astype(jnp.float32)[..., None], thr)
    return keep[:, :k, 0] > 0.5
