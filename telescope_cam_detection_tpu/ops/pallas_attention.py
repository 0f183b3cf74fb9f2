"""Fused (flash-style) multi-head attention Pallas kernel for EVA02.

The Stage-2 classifier (models/eva02.py) runs 24 transformer blocks over
577 tokens (336^2 / 14^2 patches + cls) per crop. XLA's stock
dot_product_attention materializes the (T, T) score matrix in HBM per head;
this kernel keeps the whole softmax(QK^T)V computation in VMEM per
(batch*head, q-block) grid cell — at T=577, K/V for one head are ~160 KB so
the entire KV block sits in VMEM and one MXU pass computes each q-block's
output with no HBM round trip for the scores.

Sequence padding: T is padded up to a multiple of the q-block (128); padded
KEY positions are masked to -inf before the softmax (segment masking), and
padded QUERY rows produce garbage that the caller slices off. This is what
makes variable crop-batch buckets safe: padded crops simply classify to
discarded rows.

Reference counterpart: the torch EVA02 attention inside timm
(species_classifier.py:377-383 drives it); this is its TPU-kernel analog.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 128


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    """One (bh, q_block) grid cell: softmax(q K^T * scale) V with padded
    keys masked. Block shapes: q (1, BQ, D), k/v (1, T_pad, D).

    Matmuls run in the INPUT dtype with f32 accumulation: upcasting Q/K/V
    to f32 first (the round-2 version) forfeits the MXU's bf16 rate — the
    batch-16 Stage-2 case lost to XLA exactly because of it. The softmax
    itself stays f32 for stability."""
    q = q_ref[0]                                         # (BQ, D)
    k = k_ref[0]                                         # (T, D)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (BQ, T) f32
    key_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(key_ids < valid_len, scores, -jnp.inf)
    # numerically-stable softmax in VMEM
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / denom      # (BQ, D) f32
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "q_block"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False,
                    q_block: int = Q_BLOCK) -> jnp.ndarray:
    """(B, T, H, D) q/k/v -> (B, T, H, D), matching
    jax.nn.dot_product_attention semantics (scale 1/sqrt(D), no mask across
    real tokens). q_block: query rows per grid cell (sweepable; at T=577 a
    single 640-row block processes the whole sequence per K/V fetch)."""
    b, t, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    t_pad = -(-t // q_block) * q_block
    d_pad = max(-(-d // 128) * 128, 128)

    def to_bh(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, d_pad - d)))

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    grid = (b * h, t_pad // q_block)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, valid_len=t),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (b * h) * t_pad * t_pad * d_pad,
            bytes_accessed=(b * h) * t_pad * d_pad * 4 * 4,
            transcendentals=(b * h) * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :t, :d].reshape(b, h, t, d)
    return jnp.transpose(out, (0, 2, 1, 3))
