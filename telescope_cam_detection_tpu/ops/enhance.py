"""Crop-enhancement image ops as jitted XLA programs.

Replaces the reference's cv2 CLAHE + bilateral path
(image_enhancement.py:146-183): luma-channel CLAHE (tiled histogram
equalization with clip limit and bilinear tile interpolation — the cv2
algorithm) and an edge-preserving bilateral filter, both running on device so
an enhanced crop never round-trips to the host before Stage-2.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


_N_BINS = 256


def _bgr_to_ycbcr(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + 128.0
    cr = (r - y) * 0.713 + 128.0
    return y, cb, cr


def _ycbcr_to_bgr(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray) -> jnp.ndarray:
    r = y + 1.403 * (cr - 128.0)
    b = y + 1.773 * (cb - 128.0)
    g = y - 0.714 * (cr - 128.0) - 0.344 * (cb - 128.0)
    return jnp.stack([b, g, r], axis=-1)


@functools.partial(jax.jit, static_argnames=("tiles", "clip_limit"))
def clahe_luma(img_bgr_u8: jnp.ndarray, tiles: Tuple[int, int] = (8, 8),
               clip_limit: float = 2.0) -> jnp.ndarray:
    """CLAHE on the luma channel of one (H, W, 3) uint8 BGR image.

    cv2-style: per-tile clipped histogram -> CDF lookup tables, applied with
    bilinear interpolation between the four neighboring tile LUTs. H and W
    must be divisible by the tile grid (crops are; callers pad otherwise).
    """
    h, w, _ = img_bgr_u8.shape
    ty, tx = tiles
    th, tw = h // ty, w // tx
    img = img_bgr_u8.astype(jnp.float32)
    y, cb, cr = _bgr_to_ycbcr(img)

    yq = jnp.clip(y, 0, 255).astype(jnp.int32)
    tiles_y = yq.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(
        ty * tx, th * tw)

    hist = jax.vmap(lambda t: jnp.zeros(_N_BINS, jnp.float32).at[t].add(1.0))(
        tiles_y)                                        # (T, 256)
    clip_count = clip_limit * th * tw / _N_BINS
    excess = jnp.sum(jnp.maximum(hist - clip_count, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip_count) + excess / _N_BINS
    cdf = jnp.cumsum(hist, axis=-1)
    cdf = cdf / cdf[:, -1:]                             # (T, 256) in 0..1
    luts = cdf * 255.0                                  # per-tile mapping
    luts = luts.reshape(ty, tx, _N_BINS)

    # bilinear interpolation between the 4 surrounding tile LUTs
    ii = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fy = jnp.clip((ii - th / 2) / th, 0.0, ty - 1.0)
    fx = jnp.clip((jj - tw / 2) / tw, 0.0, tx - 1.0)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, ty - 1)
    x1 = jnp.minimum(x0 + 1, tx - 1)
    wy = fy - y0
    wx = fx - x0

    def lut_at(tyi, txi):
        return luts[tyi, txi, yq]

    out_y = ((1 - wy) * (1 - wx) * lut_at(y0, x0)
             + (1 - wy) * wx * lut_at(y0, x1)
             + wy * (1 - wx) * lut_at(y1, x0)
             + wy * wx * lut_at(y1, x1))
    out = _ycbcr_to_bgr(out_y, cb, cr)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("d",))
def bilateral_filter(img_bgr_u8: jnp.ndarray, d: int = 9,
                     sigma_color: float = 75.0,
                     sigma_space: float = 75.0) -> jnp.ndarray:
    """Edge-preserving bilateral filter on (H, W, 3) uint8 (cv2 semantics:
    window d x d, gaussian space weight, gaussian color-distance weight over
    the summed channel difference)."""
    img = img_bgr_u8.astype(jnp.float32)
    r = d // 2
    padded = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="edge")
    h, w, _ = img.shape
    inv_2sc = -0.5 / (sigma_color ** 2)
    inv_2ss = -0.5 / (sigma_space ** 2)

    acc = jnp.zeros_like(img)
    norm = jnp.zeros((h, w, 1), jnp.float32)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = jax.lax.dynamic_slice(padded, (dy + r, dx + r, 0),
                                            (h, w, 3))
            cdiff = jnp.sum(jnp.abs(shifted - img), axis=-1, keepdims=True)
            wgt = jnp.exp(cdiff * cdiff * inv_2sc +
                          (dy * dy + dx * dx) * inv_2ss)
            acc = acc + shifted * wgt
            norm = norm + wgt
    return jnp.clip(acc / norm, 0, 255).astype(jnp.uint8)
