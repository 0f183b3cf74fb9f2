"""EVA02 vision transformer (Stage-2 species classifier backbone) in Flax.

Functional re-implementation of the architecture behind
``timm/eva02_large_patch14_clip_336.merged2b_ft_inat21`` which the reference
wraps (species_classifier.py:235-353): patch-14 ViT with 2D rotary position
embeddings, SwiGLU MLP, and sub-LayerNorm, classifying 10,000 iNat-2021
species at 336x336. NHWC/TPU-first; attention is jax.nn.dot_product_attention
(flash path on TPU); params convert 1:1 from timm checkpoints
(models/convert.py).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

EVA02_VARIANTS = {
    # name -> (depth, dim, heads, mlp_hidden, patch)
    "eva02-tiny": (12, 192, 3, 512, 14),
    "eva02-small": (12, 384, 6, 1024, 14),
    "eva02-base": (12, 768, 12, 2048, 14),
    "eva02-large": (24, 1024, 16, 2730, 14),
}


def _rope_freqs(dim: int, n_side: int, theta: float = 100.0) -> np.ndarray:
    """2D axial rotary embedding tables: (n_side*n_side, dim/2) angles.

    EVA02 uses rotary position embeddings over the 2D patch grid (half the
    head dim rotates with x-position, half with y-position).
    """
    quarter = dim // 4
    freqs = 1.0 / (theta ** (np.arange(quarter, dtype=np.float64) / quarter))
    pos = np.arange(n_side, dtype=np.float64)
    ang = np.outer(pos, freqs)                      # (n_side, quarter)
    ang_y = np.repeat(ang[:, None, :], n_side, 1)   # (y, x, quarter)
    ang_x = np.repeat(ang[None, :, :], n_side, 0)   # (y, x, quarter)
    angles = np.concatenate([ang_y, ang_x], -1)     # (y, x, dim/2)
    return angles.reshape(n_side * n_side, dim // 2).astype(np.float32)


def _apply_rope(x: jnp.ndarray, angles: jnp.ndarray,
                n_prefix: int = 1) -> jnp.ndarray:
    """Rotate token features (B, T, H, D) by per-position angles
    ((T - n_prefix), D/2); prefix tokens (cls) pass through unrotated."""
    prefix, tokens = x[:, :n_prefix], x[:, n_prefix:]
    cos = jnp.cos(angles)[None, :, None, :].astype(x.dtype)
    sin = jnp.sin(angles)[None, :, None, :].astype(x.dtype)
    t1, t2 = jnp.split(tokens, 2, axis=-1)
    rotated = jnp.concatenate([t1 * cos - t2 * sin, t1 * sin + t2 * cos], -1)
    return jnp.concatenate([prefix, rotated], axis=1)


def _dense_cls(quant: str):
    """nn.Dense, or the int8-MXU drop-in when quant="int8" (same param
    tree, so the same checkpoint serves either precision)."""
    if quant == "int8":
        from telescope_cam_detection_tpu.ops.quant import QuantDense
        return QuantDense
    return nn.Dense


class SwiGLU(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        dense = _dense_cls(self.quant)
        gate = dense(self.hidden, dtype=self.dtype, name="w1")(x)
        val = dense(self.hidden, dtype=self.dtype, name="w2")(x)
        x = nn.silu(gate) * val
        x = nn.LayerNorm(dtype=jnp.float32, name="ffn_ln")(x)  # sub-LN
        return dense(self.out, dtype=self.dtype, name="w3")(x)


class EVA02Block(nn.Module):
    dim: int
    heads: int
    mlp_hidden: int
    dtype: Any = jnp.float32
    # "xla" | "pallas" (ops/pallas_attention.py) | "auto". After the
    # round-3 retune (input-dtype MXU matmuls + q_block 320) the fused
    # kernel wins at batch 4 (-30%) and matches XLA at batch 16
    # (docs/PERFORMANCE.md Stage-2 table), so auto picks pallas on TPU at
    # every bucket.
    attn_impl: str = "xla"
    # "none" | "int8": run the projection/SwiGLU matmuls (~83% of the
    # block's FLOPs) through the int8 MXU path (ops/quant.py, W8A8 dynamic
    # per-token/per-channel). Attention score/value matmuls and LayerNorms
    # stay in the compute dtype.
    quant: str = "none"

    @nn.compact
    def __call__(self, x, rope_angles):
        b, t, _ = x.shape
        head_dim = self.dim // self.heads
        dense = _dense_cls(self.quant)

        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        q = dense(self.dim, dtype=self.dtype, name="q_proj")(h)
        k = dense(self.dim, use_bias=False, dtype=self.dtype, name="k_proj")(h)
        v = dense(self.dim, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(b, t, self.heads, head_dim)
        k = k.reshape(b, t, self.heads, head_dim)
        v = v.reshape(b, t, self.heads, head_dim)
        q = _apply_rope(q, rope_angles)
        k = _apply_rope(k, rope_angles)
        impl = self.attn_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            from telescope_cam_detection_tpu.ops.pallas_attention import (
                flash_attention)
            interpret = jax.default_backend() != "tpu"
            # q_block=320: the 577-token sequence pads to 640, so two query
            # blocks per K/V fetch — measured best at both batch 4 and 16
            # (docs/PERFORMANCE.md Stage-2 table)
            attn = flash_attention(q, k, v, interpret=interpret, q_block=320)
        else:
            attn = jax.nn.dot_product_attention(q, k, v)
        attn = attn.reshape(b, t, self.dim)
        attn = nn.LayerNorm(dtype=jnp.float32, name="attn_ln")(attn)  # sub-LN
        x = x + dense(self.dim, dtype=self.dtype, name="proj")(attn)

        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + SwiGLU(self.mlp_hidden, self.dim, self.dtype,
                       quant=self.quant, name="mlp")(h)
        return x


class EVA02(nn.Module):
    num_classes: int = 10000
    depth: int = 24
    dim: int = 1024
    heads: int = 16
    mlp_hidden: int = 2730
    patch: int = 14
    image_size: int = 336
    dtype: Any = jnp.float32
    attn_impl: str = "xla"
    quant: str = "none"  # "int8": block matmuls via the int8 MXU path
    # Rematerialize each transformer block under grad (jax.checkpoint):
    # activations are recomputed in the backward pass instead of stored,
    # trading ~1 extra forward of FLOPs for O(depth) less activation HBM —
    # lets bigger fine-tune batches fit one chip. No effect on inference.
    remat: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images: (B, H, W, 3) normalized RGB floats -> (B, num_classes)."""
        b = images.shape[0]
        n_side = self.image_size // self.patch
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images)
        x = x.reshape(b, n_side * n_side, self.dim)

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)).astype(x.dtype), x], 1)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, n_side * n_side + 1, self.dim))
        x = x + pos.astype(x.dtype)

        head_dim = self.dim // self.heads
        rope_angles = jnp.asarray(_rope_freqs(head_dim, n_side))
        block_cls = nn.remat(EVA02Block) if self.remat else EVA02Block
        for i in range(self.depth):
            x = block_cls(self.dim, self.heads, self.mlp_hidden, self.dtype,
                          self.attn_impl, self.quant,
                          name=f"block{i}")(x, rope_angles)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        cls_feat = x[:, 0]
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(cls_feat)


def build_eva02(name: str = "eva02-large", num_classes: int = 10000,
                image_size: int = 336, dtype=jnp.float32,
                attn_impl: str = "xla", remat: bool = False,
                quant: str = "none") -> EVA02:
    if name not in EVA02_VARIANTS:
        raise ValueError(f"unknown EVA02 variant {name!r}; valid: "
                         f"{sorted(EVA02_VARIANTS)}")
    if quant not in ("none", "int8"):
        raise ValueError(f"unknown quant {quant!r} (valid: none, int8)")
    depth, dim, heads, mlp_hidden, patch = EVA02_VARIANTS[name]
    return EVA02(num_classes=num_classes, depth=depth, dim=dim, heads=heads,
                 mlp_hidden=mlp_hidden, patch=patch, image_size=image_size,
                 dtype=dtype, attn_impl=attn_impl, remat=remat, quant=quant)


def init_eva02(name: str = "eva02-large", num_classes: int = 10000,
               image_size: int = 336, seed: int = 0, dtype=jnp.float32,
               attn_impl: str = "xla", quant: str = "none"):
    model = build_eva02(name, num_classes, image_size, dtype, attn_impl,
                        quant=quant)
    dummy = jnp.zeros((1, image_size, image_size, 3), dtype)
    variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    return model, variables
