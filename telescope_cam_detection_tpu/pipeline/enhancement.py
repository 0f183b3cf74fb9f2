"""Crop enhancement front-end for Stage-2 (none / clahe / realesrgan).

Counterpart of reference ``src/image_enhancement.py:28-278``. CLAHE+bilateral
run as jitted device ops (ops/enhance.py); Real-ESRGAN is the Flax RRDBNet
(models/rrdbnet.py) jitted per crop-size bucket.
"""
from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SIZE_BUCKETS = (64, 96, 128, 192, 256, 384, 512)


def _bucket_hw(h: int, w: int) -> Tuple[int, int]:
    def up(v):
        for b in _SIZE_BUCKETS:
            if v <= b:
                return b
        return _SIZE_BUCKETS[-1]
    return up(h), up(w)


class ImageEnhancer:
    def __init__(
        self,
        method: str = "none",
        clahe_clip_limit: float = 2.0,
        clahe_tile_grid: Tuple[int, int] = (8, 8),
        bilateral_d: int = 9,
        bilateral_sigma_color: float = 75.0,
        bilateral_sigma_space: float = 75.0,
        realesrgan_variables: Optional[Any] = None,
        realesrgan_scale: int = 4,
        seed: int = 0,
        auto_luma_threshold: float = 90.0,
        auto_contrast_threshold: float = 35.0,
        auto_night_boost: float = 1.5,
    ):
        """method="auto" is the reference's planned "Automatic enhancement
        selection based on image characteristics" + "Time-based enhancement
        (more aggressive at night)" (STAGE2_ENHANCEMENT_OPTIONS.md Future
        Enhancements): each crop's mean luma and contrast (gray stddev)
        decide none-vs-clahe per crop, and at night/dusk/dawn the decision
        thresholds and the CLAHE clip limit scale by auto_night_boost."""
        if method not in ("none", "clahe", "realesrgan", "auto"):
            raise ValueError(f"unknown enhancement method {method!r}")
        self.method = method
        self.auto_luma_threshold = float(auto_luma_threshold)
        self.auto_contrast_threshold = float(auto_contrast_threshold)
        self.auto_night_boost = max(float(auto_night_boost), 1.0)
        self.auto_enhanced = 0
        self.auto_passthrough = 0
        self.clahe_clip_limit = clahe_clip_limit
        self.clahe_tile_grid = tuple(clahe_tile_grid)
        self.bilateral_d = bilateral_d
        self.bilateral_sigma_color = bilateral_sigma_color
        self.bilateral_sigma_space = bilateral_sigma_space
        self.realesrgan_scale = realesrgan_scale
        self._sr_model = None
        self._sr_variables = realesrgan_variables
        self._sr_seed = seed
        self._enhance_times: list = []
        self.total_enhanced = 0

    # -- lazy Real-ESRGAN ---------------------------------------------------
    def _ensure_sr(self):
        if self._sr_model is None:
            import jax
            import jax.numpy as jnp
            from telescope_cam_detection_tpu.models.rrdbnet import RRDBNet
            self._sr_model = RRDBNet()
            if self._sr_variables is None:
                logger.warning("RRDBNet: random-init weights (no checkpoint)")
                self._sr_variables = self._sr_model.init(
                    jax.random.PRNGKey(self._sr_seed),
                    jnp.zeros((1, 64, 64, 3), jnp.float32))
        return self._sr_model, self._sr_variables

    def _auto_decide(self, crop: np.ndarray) -> Tuple[bool, float]:
        """(enhance?, clip_limit) from crop statistics + time of day."""
        from telescope_cam_detection_tpu.pipeline.time_of_day import (
            TimeOfDay, classify_time_of_day)
        # ITU-R 601 luma from BGR without a full cvtColor
        gray = (0.114 * crop[..., 0].astype(np.float32)
                + 0.587 * crop[..., 1] + 0.299 * crop[..., 2])
        luma, contrast = float(gray.mean()), float(gray.std())
        boost = (self.auto_night_boost
                 if classify_time_of_day() != TimeOfDay.DAY else 1.0)
        enhance = (luma < self.auto_luma_threshold * boost
                   or contrast < self.auto_contrast_threshold * boost)
        return enhance, self.clahe_clip_limit * boost

    def enhance(self, crop_bgr_u8: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 BGR -> enhanced uint8 BGR (possibly upscaled)."""
        t0 = time.perf_counter()
        if self.method == "none":
            return crop_bgr_u8
        clip_limit = self.clahe_clip_limit
        if self.method == "auto":
            do_enhance, clip_limit = self._auto_decide(crop_bgr_u8)
            if not do_enhance:
                self.auto_passthrough += 1
                return crop_bgr_u8
            self.auto_enhanced += 1
        try:
            if self.method in ("clahe", "auto"):
                out = self._enhance_clahe(crop_bgr_u8,
                                          clip_limit=clip_limit)
            else:
                out = self._enhance_realesrgan(crop_bgr_u8)
        except Exception:
            logger.exception("enhancement failed; returning original crop")
            return crop_bgr_u8
        self.total_enhanced += 1
        self._enhance_times.append((time.perf_counter() - t0) * 1000.0)
        if len(self._enhance_times) > 200:
            self._enhance_times = self._enhance_times[-200:]
        return out

    def _enhance_clahe(self, crop: np.ndarray,
                       clip_limit: Optional[float] = None) -> np.ndarray:
        import jax.numpy as jnp
        from telescope_cam_detection_tpu.ops.enhance import (
            bilateral_filter, clahe_luma)
        ty, tx = self.clahe_tile_grid
        h, w = crop.shape[:2]
        # pad to tile-divisible static bucket
        bh, bw = _bucket_hw(h, w)
        bh = ((bh + ty - 1) // ty) * ty
        bw = ((bw + tx - 1) // tx) * tx
        padded = np.zeros((bh, bw, 3), np.uint8)
        padded[:h, :w] = crop
        padded[h:, :w] = crop[h - 1:, :]    # edge-extend so tiles stay sane
        padded[:, w:] = padded[:, w - 1:w]
        out = clahe_luma(jnp.asarray(padded), tiles=(ty, tx),
                         clip_limit=(self.clahe_clip_limit
                                     if clip_limit is None else clip_limit))
        out = bilateral_filter(out, d=self.bilateral_d,
                               sigma_color=self.bilateral_sigma_color,
                               sigma_space=self.bilateral_sigma_space)
        return np.asarray(out)[:h, :w]

    def _enhance_realesrgan(self, crop: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        model, variables = self._ensure_sr()
        h, w = crop.shape[:2]
        bh, bw = _bucket_hw(h, w)
        padded = np.zeros((bh, bw, 3), np.uint8)
        padded[:h, :w] = crop
        x = jnp.asarray(padded[None, ..., ::-1], jnp.float32) / 255.0  # RGB
        y = model.apply(variables, x)
        y = np.asarray(jnp.clip(y, 0.0, 1.0))[0, :h * 4, :w * 4, ::-1]
        return (y * 255.0).astype(np.uint8)

    def get_stats(self) -> Dict[str, Any]:
        times = self._enhance_times
        stats = {"method": self.method,
                 "total_enhanced": self.total_enhanced,
                 "avg_enhance_ms": float(np.mean(times)) if times else 0.0}
        if self.method == "auto":
            stats["auto_enhanced"] = self.auto_enhanced
            stats["auto_passthrough"] = self.auto_passthrough
        return stats
