"""Pallas TPU kernel: multi-scale deformable attention sampling.

The hard kernel of RT-DETR (SURVEY §7 hard part 2). The XLA path
(models/rtdetr.ms_deformable_attention) expresses the bilinear sampling as
take_along_axis gathers; TPUs have no fast arbitrary-gather unit, so this
kernel reformulates the whole sample-and-reduce as MXU matmuls:

For one (batch, head, level): the output is

    out[q, :] = sum_s  w[q, s] * V[idx[q, s], :]        s = P points x 4 corners

which is exactly  out = W @ V  where W is a sparse (Q, HW) matrix with 16
weighted nonzeros per row. The kernel builds W blockwise in VMEM — for each
(query-block, HW-tile) it materializes W_tile[q, hw] = sum_s w[q,s] *
(idx[q,s] == hw) with VPU compares and feeds it straight to the MXU against
the resident value slab. No gathers, no HBM round trips inside a level.

Indices and combined weights (bilinear corner weights x softmaxed attention
weights) are precomputed in XLA (cheap elementwise); the kernel is the
bandwidth/FLOP-heavy part. Validated bit-close against the XLA gather path
(tests/test_pallas_deform.py).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 128
HW_TILE = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _deform_kernel(idx_ref, w_ref, v_ref, out_ref):
    """idx (1, QB, S) int32; w (1, QB, S) f32; v (1, HW_pad, hd) f32;
    out (1, QB, hd) f32."""
    idx = idx_ref[0]                      # (QB, S)
    wgt = w_ref[0]                        # (QB, S)
    v = v_ref[0]                          # (HW_pad, hd)
    hw_pad, hd = v.shape
    qb = idx.shape[0]

    acc = jnp.zeros((qb, hd), jnp.float32)
    for t in range(hw_pad // HW_TILE):
        base = t * HW_TILE
        hw_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, 1, HW_TILE), 2)
        eq = (idx[:, :, None] == hw_ids)              # (QB, S, TILE)
        w_tile = jnp.sum(jnp.where(eq, wgt[:, :, None], 0.0), axis=1)
        # HIGHEST keeps fp32 on the MXU — matches the fp32 XLA gather path
        # (default bf16 passes drift ~3e-3 on unit-scale values)
        acc = acc + jnp.dot(w_tile, v[base:base + HW_TILE],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def deform_gather_matmul(
    values: jnp.ndarray,    # (BH, HW, hd) f32 — one level, batch*heads merged
    indices: jnp.ndarray,   # (BH, Q, S) int32 flat spatial indices
    weights: jnp.ndarray,   # (BH, Q, S) f32 combined weights
    interpret: bool = False,
) -> jnp.ndarray:
    """out[bh, q, :] = sum_s weights[bh,q,s] * values[bh, indices[bh,q,s], :]"""
    bh, hw, hd = values.shape
    _, q, s = indices.shape
    q_pad = _round_up(q, Q_BLOCK)
    hw_pad = _round_up(hw, HW_TILE)
    if q_pad != q:
        indices = jnp.pad(indices, ((0, 0), (0, q_pad - q), (0, 0)))
        weights = jnp.pad(weights, ((0, 0), (0, q_pad - q), (0, 0)))
    if hw_pad != hw:
        values = jnp.pad(values, ((0, 0), (0, hw_pad - hw), (0, 0)))
    # out-of-range (padding) indices must not match any hw id
    indices = jnp.where(weights != 0.0, indices, -1)

    out = pl.pallas_call(
        _deform_kernel,
        grid=(bh, q_pad // Q_BLOCK),
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK, s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_BLOCK, s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw_pad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q_BLOCK, hd), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, hd), jnp.float32),
        interpret=interpret,
    )(indices, weights, values)
    return out[:, :q]


def ms_deformable_attention_pallas(
    values: Sequence[jnp.ndarray],       # per level (B, H, W, heads, hd)
    sampling_locs: jnp.ndarray,          # (B, Q, heads, L, P, 2) normalized
    attn_weights: jnp.ndarray,           # (B, Q, heads, L, P)
    interpret: bool = None,
) -> jnp.ndarray:
    """Drop-in replacement for models.rtdetr.ms_deformable_attention.
    Returns (B, Q, heads, hd). interpret=None auto-selects interpreter mode
    on non-TPU backends (so the model flag works under CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from telescope_cam_detection_tpu.models.rtdetr import (
        bilinear_corner_fractions, ms_deformable_attention)
    b, q, heads, n_levels, n_points, _ = sampling_locs.shape
    out = None
    for lvl in range(n_levels):
        v = values[lvl]
        _, h, w, _, hd = v.shape
        # VMEM guard: the kernel keeps the whole (hw_pad, hd) level slab
        # resident (lane-padded to 128). Levels too big for VMEM fall back
        # to the XLA gather path — e.g. the /8 level of a 1280x1280 input.
        hw_pad = _round_up(h * w, HW_TILE)
        slab_bytes = hw_pad * max(hd, 128) * 4
        if slab_bytes > 6 * 1024 * 1024:
            lvl_out = ms_deformable_attention(
                [v], sampling_locs[:, :, :, lvl:lvl + 1],
                attn_weights[:, :, :, lvl:lvl + 1])
            out = lvl_out if out is None else out + lvl_out
            continue
        loc = sampling_locs[:, :, :, lvl]            # (B, Q, heads, P, 2)
        x0, y0, fx, fy = bilinear_corner_fractions(loc, h, w)
        aw = attn_weights[:, :, :, lvl]              # (B, Q, heads, P)

        corner_idx = []
        corner_w = []
        for (cy, cx, cw) in (
            (y0, x0, (1 - fy) * (1 - fx)),
            (y0, x0 + 1, (1 - fy) * fx),
            (y0 + 1, x0, fy * (1 - fx)),
            (y0 + 1, x0 + 1, fy * fx),
        ):
            yy = jnp.clip(cy.astype(jnp.int32), 0, h - 1)
            xx = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
            corner_idx.append(yy * w + xx)
            corner_w.append(cw * aw)
        idx = jnp.stack(corner_idx, axis=-1)         # (B, Q, heads, P, 4)
        wgt = jnp.stack(corner_w, axis=-1)

        s = n_points * 4
        idx = idx.reshape(b, q, heads, s).transpose(0, 2, 1, 3) \
            .reshape(b * heads, q, s)
        wgt = wgt.reshape(b, q, heads, s).transpose(0, 2, 1, 3) \
            .reshape(b * heads, q, s).astype(jnp.float32)
        v_merged = v.transpose(0, 3, 1, 2, 4).reshape(
            b * heads, h * w, hd).astype(jnp.float32)

        lvl_out = deform_gather_matmul(v_merged, idx, wgt,
                                       interpret=interpret)
        lvl_out = lvl_out.reshape(b, heads, q, hd).transpose(0, 2, 1, 3)
        out = lvl_out if out is None else out + lvl_out
    return out
