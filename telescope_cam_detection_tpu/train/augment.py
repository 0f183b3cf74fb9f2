"""Training augmentations: mosaic, mixup, horizontal flip, HSV jitter.

The reference delegates augmentation to ultralytics' dataloader
(training/scripts/train_custom_model.py mosaic/mixup defaults); these are the
host-side numpy equivalents feeding the jitted train step. All outputs keep
the static (MAX_GT, 5) xyxy+class target layout (class < 0 = padding) so the
device program never recompiles.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _clip_targets(targets: np.ndarray, hw: Tuple[int, int],
                  min_size: float = 2.0) -> np.ndarray:
    """Clip boxes to the frame; drop degenerate ones (mark class -1)."""
    out = targets.copy()
    h, w = hw
    valid = out[:, 4] >= 0
    out[:, 0] = np.clip(out[:, 0], 0, w - 1)
    out[:, 2] = np.clip(out[:, 2], 0, w - 1)
    out[:, 1] = np.clip(out[:, 1], 0, h - 1)
    out[:, 3] = np.clip(out[:, 3], 0, h - 1)
    degenerate = ((out[:, 2] - out[:, 0]) < min_size) | \
        ((out[:, 3] - out[:, 1]) < min_size)
    out[valid & degenerate, 4] = -1.0
    return out


def _pack_targets(rows: List[np.ndarray], max_gt: int) -> np.ndarray:
    """Concatenate target rows, keep the max_gt largest-area valid boxes."""
    merged = np.concatenate(rows, axis=0) if rows else np.zeros((0, 5))
    merged = merged[merged[:, 4] >= 0]
    if len(merged) > max_gt:
        area = (merged[:, 2] - merged[:, 0]) * (merged[:, 3] - merged[:, 1])
        merged = merged[np.argsort(-area)[:max_gt]]
    out = np.full((max_gt, 5), -1.0, np.float32)
    out[:len(merged)] = merged
    return out


def mosaic(
    images: Sequence[np.ndarray],      # 4x (H, W, 3) uint8, same size
    targets: Sequence[np.ndarray],     # 4x (MAX_GT, 5)
    rng: np.random.Generator,
    center_jitter: float = 0.25,
) -> Tuple[np.ndarray, np.ndarray]:
    """Classic 4-image mosaic: tiles meet at a jittered center point; boxes
    translate with their tile and clip at the canvas."""
    assert len(images) == 4 and len(targets) == 4
    h, w, _ = images[0].shape
    cy = int(h * (0.5 + rng.uniform(-center_jitter, center_jitter)))
    cx = int(w * (0.5 + rng.uniform(-center_jitter, center_jitter)))
    cy, cx = np.clip(cy, 1, h - 1), np.clip(cx, 1, w - 1)
    canvas = np.zeros((h, w, 3), np.uint8)
    rows: List[np.ndarray] = []
    # (dest slice, which corner of the source to take)
    quads = [((0, cy, 0, cx), "br"), ((0, cy, cx, w), "bl"),
             ((cy, h, 0, cx), "tr"), ((cy, h, cx, w), "tl")]
    for (y0, y1, x0, x1), corner in quads:
        i = len(rows)
        img, tgt = images[i], targets[i].astype(np.float32).copy()
        th, tw = y1 - y0, x1 - x0
        # take the source corner opposite the destination quadrant
        sy0 = h - th if corner in ("br", "bl") else 0
        sx0 = w - tw if corner in ("br", "tr") else 0
        canvas[y0:y1, x0:x1] = img[sy0:sy0 + th, sx0:sx0 + tw]
        shift_x, shift_y = x0 - sx0, y0 - sy0
        tgt[:, [0, 2]] += shift_x
        tgt[:, [1, 3]] += shift_y
        # boxes fully outside this tile's destination window are dropped
        inside = ((tgt[:, 0] < x1) & (tgt[:, 2] > x0) &
                  (tgt[:, 1] < y1) & (tgt[:, 3] > y0))
        tgt[~inside, 4] = -1.0
        tgt[:, 0] = np.clip(tgt[:, 0], x0, x1 - 1)
        tgt[:, 2] = np.clip(tgt[:, 2], x0, x1 - 1)
        tgt[:, 1] = np.clip(tgt[:, 1], y0, y1 - 1)
        tgt[:, 3] = np.clip(tgt[:, 3], y0, y1 - 1)
        rows.append(tgt)
    packed = _pack_targets(rows, targets[0].shape[0])
    return canvas, _clip_targets(packed, (h, w))


def mixup(
    img_a: np.ndarray, tgt_a: np.ndarray,
    img_b: np.ndarray, tgt_b: np.ndarray,
    rng: np.random.Generator,
    alpha: float = 8.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Beta-blend two frames, union their targets (YOLOX-style mixup keeps
    full-weight labels from both)."""
    lam = float(rng.beta(alpha, alpha))
    mixed = (img_a.astype(np.float32) * lam +
             img_b.astype(np.float32) * (1.0 - lam))
    mixed = np.clip(mixed, 0, 255).astype(np.uint8)
    return mixed, _pack_targets([tgt_a.astype(np.float32),
                                 tgt_b.astype(np.float32)],
                                tgt_a.shape[0])


def hflip(img: np.ndarray, tgt: np.ndarray
          ) -> Tuple[np.ndarray, np.ndarray]:
    w = img.shape[1]
    out = tgt.astype(np.float32).copy()
    valid = out[:, 4] >= 0
    x1 = out[:, 0].copy()
    out[valid, 0] = w - 1 - out[valid, 2]
    out[valid, 2] = w - 1 - x1[valid]
    return img[:, ::-1].copy(), out


def hsv_jitter(img: np.ndarray, rng: np.random.Generator,
               h_gain: float = 0.015, s_gain: float = 0.7,
               v_gain: float = 0.4) -> np.ndarray:
    """Random HSV gains (ultralytics-style ranges); falls back to a plain
    brightness jitter when cv2 is unavailable."""
    try:
        import cv2
    except ImportError:  # pragma: no cover
        gain = 1.0 + rng.uniform(-v_gain, v_gain)
        return np.clip(img.astype(np.float32) * gain, 0, 255).astype(np.uint8)
    gains = 1.0 + rng.uniform(-1, 1, 3) * np.array([h_gain, s_gain, v_gain])
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv[..., 0] = (hsv[..., 0] * gains[0]) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] * gains[1], 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] * gains[2], 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


class Augmenter:
    """Composable training-batch augmenter (mosaic + mixup + flip + HSV)."""

    def __init__(self, mosaic_prob: float = 1.0, mixup_prob: float = 0.5,
                 flip_prob: float = 0.5, hsv_prob: float = 1.0,
                 seed: int = 0):
        self.mosaic_prob = mosaic_prob
        self.mixup_prob = mixup_prob
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob
        self.rng = np.random.default_rng(seed)

    def __call__(self, images: np.ndarray, targets: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, H, W, 3) uint8 + (B, MAX_GT, 5) -> augmented same shapes.
        Mosaic/mixup source images are drawn from within the batch."""
        b = len(images)
        out_i, out_t = [], []
        for i in range(b):
            img, tgt = images[i], targets[i]
            if b >= 4 and self.rng.uniform() < self.mosaic_prob:
                picks = [i] + list(self.rng.choice(b, 3, replace=False))
                img, tgt = mosaic([images[j] for j in picks],
                                  [targets[j] for j in picks], self.rng)
            if b >= 2 and self.rng.uniform() < self.mixup_prob:
                j = int(self.rng.integers(b))
                img, tgt = mixup(img, tgt, images[j], targets[j], self.rng)
            if self.rng.uniform() < self.flip_prob:
                img, tgt = hflip(img, tgt)
            if self.rng.uniform() < self.hsv_prob:
                img = hsv_jitter(img, self.rng)
            out_i.append(img)
            out_t.append(tgt.astype(np.float32))
        return np.stack(out_i), np.stack(out_t)
