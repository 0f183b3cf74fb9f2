"""Device-side batched crop extraction (ROI bilinear sampling).

The reference crops each detection on the host and runs one classifier
forward per crop (two_stage_pipeline_yolox.py:261-289,475-481). Here crops
are sampled ON DEVICE from the detection frames that are already in HBM —
a fixed number K of boxes per dispatch, each bilinearly resampled straight
to the classifier input resolution in one gather-based program. No second
host->device transfer, no per-crop host resize.

sample_crops(frames, boxes, out_hw):
  frames: (B, H, W, 3) uint8/float
  boxes:  (K, 5) float — [batch_idx, x1, y1, x2, y2] in frame pixel coords;
          batch_idx < 0 marks padding (output garbage, callers mask).
  -> (K, out_h, out_w, 3) float32

Sampling uses half-pixel centers within the box (align_corners=False
convention), matching a cv2/torch resize of the equivalent host crop.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_hw",))
def sample_crops(frames: jnp.ndarray, boxes: jnp.ndarray,
                 out_hw: Tuple[int, int] = (336, 336)) -> jnp.ndarray:
    b, h, w, c = frames.shape
    k = boxes.shape[0]
    oh, ow = out_hw
    frames_f = frames.astype(jnp.float32)

    batch_idx = jnp.clip(boxes[:, 0].astype(jnp.int32), 0, b - 1)   # (K,)
    x1, y1, x2, y2 = boxes[:, 1], boxes[:, 2], boxes[:, 3], boxes[:, 4]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)

    # output-pixel centers in source coords (half-pixel convention within
    # the box, like resizing the [x1:x2, y1:y2] crop to (oh, ow))
    gy = (jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0) + 0.5) / oh
    gx = (jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1) + 0.5) / ow
    sy = y1[:, None, None] + gy[None] * bh[:, None, None] - 0.5     # (K,oh,ow)
    sx = x1[:, None, None] + gx[None] * bw[:, None, None] - 0.5

    sy = jnp.clip(sy, 0.0, h - 1.0)
    sx = jnp.clip(sx, 0.0, w - 1.0)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    flat = frames_f.reshape(b * h * w, c)
    base = batch_idx[:, None, None] * (h * w)

    def gather(yy, xx):
        return flat[(base + yy * w + xx).reshape(-1)].reshape(k, oh, ow, c)

    g00 = gather(y0i, x0i)
    g01 = gather(y0i, x1i)
    g10 = gather(y1i, x0i)
    g11 = gather(y1i, x1i)
    return ((1 - fy) * (1 - fx) * g00 + (1 - fy) * fx * g01
            + fy * (1 - fx) * g10 + fy * fx * g11)


def boxes_with_padding(frame_hw: Tuple[int, int], bboxes, batch_indices,
                       padding_percent: float, k: int):
    """Host helper: detection bboxes -> (K, 5) padded-box array for
    sample_crops. Applies the reference's percentage padding + frame clamp
    (two_stage_pipeline_yolox.py:261-289); rows beyond len(bboxes) get
    batch_idx=-1."""
    import numpy as np
    h, w = frame_hw
    out = np.full((k, 5), -1.0, np.float32)
    pad = padding_percent / 100.0
    for i, (bidx, bb) in enumerate(zip(batch_indices, bboxes)):
        if i >= k:
            break
        x1, y1, x2, y2 = bb["x1"], bb["y1"], bb["x2"], bb["y2"]
        bw_, bh_ = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        out[i] = [bidx,
                  max(0.0, x1 - bw_ * pad / 2),
                  max(0.0, y1 - bh_ * pad / 2),
                  min(float(w), x2 + bw_ * pad / 2),
                  min(float(h), y2 + bh_ * pad / 2)]
    return out
