"""Fused on-device preprocess: uint8 BGR frames -> detector/classifier input.

Replaces the reference's per-frame OpenCV resize + torch ``.to(cuda)`` +
``F.interpolate`` chain (yolox_detector.py:186-220, rtdetr_detector.py:206-237,
species_classifier.py:298-352) with ONE jitted program per (batch, resolution)
bucket: dtype cast, bilinear resize (MXU matmuls), channel swap, and
normalization all fuse into a single XLA computation, so the host->device
transfer is raw uint8 (3 bytes/px) and everything else happens at HBM speed.

Three preprocess conventions exist in the reference and are preserved:
  * YOLOX: plain bilinear resize, stays BGR, raw 0..255 floats, no norm.
  * RT-DETR: resize, BGR->RGB, scale to 0..1.
  * EVA02 classifier: resize, BGR->RGB, scale 0..1, ImageNet-CLIP mean/std.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from telescope_cam_detection_tpu.ops.resize import resize_bilinear_nhwc

# OpenAI-CLIP normalization used by EVA02 (timm cfg for eva02_large_clip_336)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess_yolox(frames_bgr_u8: jnp.ndarray, out_hw: Tuple[int, int],
                     dtype=jnp.float32) -> jnp.ndarray:
    """(N,H,W,3) uint8 BGR -> (N,h,w,3) float BGR in 0..255 (YOLOX convention).

    YOLOX consumes raw-range BGR with no normalization; the reference resizes
    without letterbox (plain stretch) and so do we (yolox_detector.py:210-218).
    """
    return resize_bilinear_nhwc(frames_bgr_u8, out_hw, dtype=dtype)


def preprocess_rtdetr(frames_bgr_u8: jnp.ndarray, out_hw: Tuple[int, int],
                      dtype=jnp.float32) -> jnp.ndarray:
    """(N,H,W,3) uint8 BGR -> (N,h,w,3) float RGB in 0..1 (RT-DETR deploy
    convention: ToTensor after PIL RGB; rtdetr_detector.py:176-180)."""
    x = resize_bilinear_nhwc(frames_bgr_u8, out_hw, dtype=dtype)
    x = x[..., ::-1] * (1.0 / 255.0)
    return x


def preprocess_classifier(
    crops_bgr_u8: jnp.ndarray,
    out_hw: Tuple[int, int],
    mean: Tuple[float, float, float] = CLIP_MEAN,
    std: Tuple[float, float, float] = CLIP_STD,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """(N,H,W,3) uint8 BGR crops -> (N,h,w,3) normalized RGB floats
    (species_classifier.py:298-352 semantics, batched)."""
    x = resize_bilinear_nhwc(crops_bgr_u8, out_hw, dtype=dtype)
    x = x[..., ::-1] * (1.0 / 255.0)
    mean_a = jnp.asarray(mean, dtype=dtype)
    inv_std = 1.0 / jnp.asarray(std, dtype=dtype)
    return (x - mean_a) * inv_std


def scale_boxes_back(boxes: jnp.ndarray, model_hw: Tuple[int, int],
                     orig_hw: Tuple[int, int]) -> jnp.ndarray:
    """Map xyxy boxes from model input coords back to original frame coords
    (inverse of the plain-stretch resize; yolox_detector.py:252-259)."""
    sy = orig_hw[0] / model_hw[0]
    sx = orig_hw[1] / model_hw[1]
    scale = jnp.asarray([sx, sy, sx, sy], dtype=boxes.dtype)
    return boxes * scale


def yuv420_to_bgr(yuv: jnp.ndarray) -> jnp.ndarray:
    """(B, H*3//2, W) planar I420 uint8 -> (B, H, W, 3) float32 BGR.

    Transfer-compression decode for low-bandwidth host->device links: the
    host packs BGR to 4:2:0 (native/frameio.cpp, 2x fewer bytes), the device
    unpacks with a nearest-neighbor chroma upsample + BT.601 inverse. Fuses
    into the same program as the detector preprocess.
    """
    b, h15, w = yuv.shape
    h = h15 * 2 // 3
    y = yuv[:, :h, :].astype(jnp.float32)
    u = yuv[:, h:h + h // 4, :].reshape(b, h // 2, w // 2)
    v = yuv[:, h + h // 4:, :].reshape(b, h // 2, w // 2)

    def up2(c):
        c = jnp.broadcast_to(c[:, :, None, :, None],
                             (b, h // 2, 2, w // 2, 2))
        return c.reshape(b, h, w).astype(jnp.float32)

    u = up2(u) - 128.0
    v = up2(v) - 128.0
    r = y + 1.403 * v
    g = y - 0.714 * v - 0.344 * u
    bch = y + 1.773 * u
    return jnp.clip(jnp.stack([bch, g, r], axis=-1), 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("out_hw", "mode"))
def preprocess_jit(frames_bgr_u8: jnp.ndarray, out_hw: Tuple[int, int],
                   mode: str = "yolox") -> jnp.ndarray:
    if mode == "yolox":
        return preprocess_yolox(frames_bgr_u8, out_hw)
    if mode == "rtdetr":
        return preprocess_rtdetr(frames_bgr_u8, out_hw)
    if mode == "classifier":
        return preprocess_classifier(frames_bgr_u8, out_hw)
    raise ValueError(f"unknown preprocess mode {mode!r}")
