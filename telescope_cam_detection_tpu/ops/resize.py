"""Bilinear resize as two MXU matmuls.

torch ``F.interpolate(mode='bilinear', align_corners=False)`` — which the
reference applies on GPU per frame (yolox_detector.py:210-218,
species_classifier.py:323-332) — is a separable linear map. On TPU we
precompute the (out, in) interpolation matrices once per shape pair and apply
them as two dense matmuls, which XLA tiles onto the MXU and fuses with the
surrounding preprocess arithmetic. This is both faster than gather-based
resize on TPU and bit-tight against torch's half-pixel sampling (north-star
parity requires matching align_corners=False exactly; SURVEY §7 hard part 7).
"""
from __future__ import annotations

import functools

import jax
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _resize_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, half-pixel centers,
    edges clamped — the align_corners=False convention."""
    out = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == out_size:
        np.fill_diagonal(out, 1.0)
        return out
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        src_clamped = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src_clamped))
        hi = min(lo + 1, in_size - 1)
        frac = src_clamped - lo
        out[i, lo] += 1.0 - frac
        out[i, hi] += frac
    return out


def resize_matrices(
    in_hw: Tuple[int, int], out_hw: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (R_h, R_w) with shapes (out_h, in_h) and (out_w, in_w)."""
    r_h = jnp.asarray(_resize_matrix_np(in_hw[0], out_hw[0]))
    r_w = jnp.asarray(_resize_matrix_np(in_hw[1], out_hw[1]))
    return r_h, r_w


def resize_bilinear_nhwc(
    images: jnp.ndarray, out_hw: Tuple[int, int], dtype=jnp.float32
) -> jnp.ndarray:
    """Resize (N, H, W, C) -> (N, h, w, C) via two matmuls.

    Matches torch F.interpolate(..., mode='bilinear', align_corners=False)
    for float inputs.
    """
    n, h, w, c = images.shape
    r_h, r_w = resize_matrices((h, w), out_hw)
    x = images.astype(dtype)
    # Precision.HIGHEST keeps fp32 on the MXU (default drops to bf16 passes,
    # which breaks the IoU>=0.99 parity gate on fine box coordinates).
    x = jnp.einsum("oh,nhwc->nowc", r_h.astype(dtype), x,
                   preferred_element_type=dtype,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("pw,nowc->nopc", r_w.astype(dtype), x,
                   preferred_element_type=dtype,
                   precision=jax.lax.Precision.HIGHEST)
    return x


def resize_bilinear_hwc(image: jnp.ndarray, out_hw: Tuple[int, int],
                        dtype=jnp.float32) -> jnp.ndarray:
    return resize_bilinear_nhwc(image[None], out_hw, dtype)[0]
