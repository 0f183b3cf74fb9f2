"""Host-facing motion filters over the on-device gate kernels.

These wrap ``ops.motion`` with the stateful, hot-reloadable, stats-bearing
interfaces the pipeline threads expect — the same component surfaces as the
reference's ``empty_frame_filter.py`` and ``motion_filter.py``. Two pixel
backends per gate: "cv2" (the reference's own SIMD host path — default when
cv2 is importable; this host's CPU XLA runs MOG2 ~1000x slower than cv2) and
"xla" (jitted with device-resident state — the right choice when gates fuse
into the accelerator program on local-PCIe hardware). Gate DECISIONS are
backend-independent (tests/test_motion_cv2_parity.py pins the agreement).
"""
from __future__ import annotations

import logging
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from telescope_cam_detection_tpu.ops import motion as motion_ops

try:
    import cv2
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

logger = logging.getLogger(__name__)


def _gate_device(preference: str = "cpu"):
    """Device for gate programs. Default: the host CPU XLA backend — frames
    are host-resident and the gates are memory-bound elementwise work, so on
    deployments where the accelerator sits behind a low-bandwidth link
    (~20 MB/s measured here) shipping full frames to gate them is a net loss.
    Set preference="accelerator" to fuse gates into the device program path
    on real local-PCIe hardware."""
    if preference == "accelerator":
        return jax.devices()[0]
    return jax.devices("cpu")[0]


class EmptyFrameFilter:
    """Pre-inference gate: skip detector dispatch for motionless frames
    (reference empty_frame_filter.py:15-113; claims 30-50% throughput win)."""

    def __init__(self, min_motion_area: int = 200, blur_size: int = 21,
                 threshold: int = 25, enabled: bool = True,
                 device: str = "cpu", backend: str = "auto"):
        """backend: "cv2" (SIMD C++ host path — the reference's own gate,
        empty_frame_filter.py:51-98, ~1-2 ms/frame), "xla" (jitted on the
        gate device — the right choice when gates fuse into the on-device
        program on local-PCIe hardware), or "auto" (cv2 when importable).
        The gate DECISION is identical across backends (same blur/diff/
        threshold/area math)."""
        self.enabled = enabled
        self.min_motion_area = float(min_motion_area)
        self.blur_size = int(blur_size)
        self.threshold = float(threshold)
        self.backend = backend
        if backend == "auto":
            self.backend = "cv2" if _HAS_CV2 else "xla"
        if self.backend == "cv2" and not _HAS_CV2:
            raise RuntimeError("backend='cv2' but cv2 is not importable")
        self._device = _gate_device(device)
        self._state: Optional[motion_ops.FrameDiffState] = None
        self._state_hw: Optional[Tuple[int, int]] = None
        self._prev_blurred: Optional[np.ndarray] = None   # cv2 backend state
        self._lock = threading.Lock()
        self.frames_processed = 0
        self.frames_skipped = 0
        self.total_gate_time = 0.0

    def _has_motion_cv2(self, frame: np.ndarray) -> bool:
        k = self.blur_size | 1
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        blurred = cv2.GaussianBlur(gray, (k, k), 0).astype(np.float32)
        prev = self._prev_blurred
        self._prev_blurred = blurred
        if prev is None or prev.shape != blurred.shape:
            return True  # first frame always dispatches (reference :61-66)
        diff = np.abs(blurred - prev)
        return int((diff > self.threshold).sum()) >= self.min_motion_area

    def has_motion(self, frame: np.ndarray) -> bool:
        """True if the frame should go to the detector."""
        if not self.enabled:
            return True
        t0 = time.perf_counter()
        with self._lock:
            if self.backend == "cv2":
                result = self._has_motion_cv2(frame)
            else:
                result = self._has_motion_xla(frame)
            self.frames_processed += 1
            if not result:
                self.frames_skipped += 1
            self.total_gate_time += time.perf_counter() - t0
        return result

    def _has_motion_xla(self, frame: np.ndarray) -> bool:
        hw = frame.shape[:2]
        with jax.default_device(self._device):
            if self._state is None or self._state_hw != hw:
                self._state = motion_ops.init_frame_diff_state(hw)
                self._state_hw = hw
            state, has_motion, _area = motion_ops.frame_diff_gate(
                self._state, jax.device_put(frame, self._device),
                jnp.asarray(self.threshold, jnp.float32),
                jnp.asarray(self.min_motion_area, jnp.float32),
                blur_size=self.blur_size)
            self._state = state
            return bool(has_motion)

    def get_stats(self) -> Dict[str, Any]:
        with self._lock:
            n = max(self.frames_processed, 1)
            return {
                "enabled": self.enabled,
                "frames_processed": self.frames_processed,
                "frames_skipped": self.frames_skipped,
                "skip_rate": self.frames_skipped / n,
                "avg_gate_ms": 1000.0 * self.total_gate_time / n,
            }


class DeviceEmptyFrameGate:
    """Empty-frame gate consumer for ``ProgramSpec.gates='device'``: the
    fused detector program computes the changed-pixel count on device
    (per-lane state in HBM, ops/motion.py gate_step); this object only
    applies the hot-reloadable area threshold to the returned scalar —
    zero host pixel work. Same stats surface as EmptyFrameFilter."""

    def __init__(self, min_motion_area: int = 200, enabled: bool = True):
        self.enabled = enabled
        self.min_motion_area = float(min_motion_area)
        self._lock = threading.Lock()
        self.frames_processed = 0
        self.frames_skipped = 0

    def decide(self, motion_area: float, initialized: bool) -> bool:
        """True if the frame's detections should be kept (has motion).
        motion_area arrives in capture-resolution pixel units (the program
        scales it), so the config threshold applies unchanged; a lane's
        first-ever frame always passes (reference empty_frame_filter.py:
        61-66)."""
        if not self.enabled:
            return True
        has = (not initialized) or motion_area >= self.min_motion_area
        with self._lock:
            self.frames_processed += 1
            if not has:
                self.frames_skipped += 1
        return has

    def update_params(self, config: Dict[str, Any]) -> List[str]:
        updated = []
        with self._lock:
            for key, typ in (("enabled", bool), ("min_motion_area", float)):
                if key in config and getattr(self, key) != typ(config[key]):
                    setattr(self, key, typ(config[key]))
                    updated.append(key)
        return updated

    def get_stats(self) -> Dict[str, Any]:
        with self._lock:
            n = max(self.frames_processed, 1)
            return {
                "enabled": self.enabled,
                "backend": "device",
                "frames_processed": self.frames_processed,
                "frames_skipped": self.frames_skipped,
                "skip_rate": self.frames_skipped / n,
                "avg_gate_ms": 0.0,   # fused into the detector dispatch
            }


class MotionFilter:
    """Post-detection gate: reject detections whose bbox shows no foreground
    motion under a background-subtraction model (reference
    motion_filter.py:18-244, MOG2)."""

    def __init__(self, enabled: bool = True, history: int = 500,
                 var_threshold: float = 16.0, detect_shadows: bool = True,
                 min_motion_area: int = 100, motion_blur_size: int = 21,
                 min_motion_ratio: float = 0.05, min_motion_pixels: int = 10,
                 device: str = "cpu", backend: str = "auto"):
        # Gate semantics match the reference exactly (motion_filter.py:125):
        # keep a detection when motion_pixels >= min_motion_pixels (fixed
        # absolute floor, default 10) AND motion_ratio > min_motion_ratio.
        # min_motion_area is accepted/stored/hot-reloadable like the
        # reference but does NOT gate per-bbox decisions there either.
        # backend: "cv2" (native MOG2 with shadow modeling, the reference's
        # exact path, ~5 ms/frame) | "xla" (first-party mixture,
        # ops/motion.py) | "program" (gates='device': the fused detector
        # program already computed per-detection motion_ratio/motion_pixels
        # against its HBM-resident background model — this filter only
        # applies the hot-reloadable thresholds, zero host pixel work)
        # | "auto" (cv2 when importable).
        self._device = _gate_device(device)
        self.min_motion_pixels = int(min_motion_pixels)
        self.enabled = enabled
        self.history = int(history)
        self.var_threshold = float(var_threshold)
        self.detect_shadows = detect_shadows  # honored by both backends
        self.min_motion_area = float(min_motion_area)
        self.motion_blur_size = int(motion_blur_size)
        self.min_motion_ratio = float(min_motion_ratio)
        self.backend = backend
        if backend == "auto":
            self.backend = "cv2" if _HAS_CV2 else "xla"
        if self.backend == "cv2" and not _HAS_CV2:
            raise RuntimeError("backend='cv2' but cv2 is not importable")
        self._cv2_sub = None
        self._state: Optional[motion_ops.MOG2ColorState] = None
        self._state_hw: Optional[Tuple[int, int]] = None
        self._lock = threading.Lock()
        self.total_processed = 0
        self.total_filtered = 0

    def _learning_rate(self) -> float:
        return 1.0 / max(self.history, 1)

    def _cv2_subtractor(self):
        if self._cv2_sub is None:
            self._cv2_sub = cv2.createBackgroundSubtractorMOG2(
                history=self.history, varThreshold=self.var_threshold,
                detectShadows=self.detect_shadows)
        return self._cv2_sub

    def _update_background_cv2(self, frame: np.ndarray) -> np.ndarray:
        fg = self._cv2_subtractor().apply(frame)
        if self.detect_shadows:
            fg[fg == 127] = 0  # shadow pixels are not motion (reference :99)
        k = self.motion_blur_size | 1
        fg = cv2.GaussianBlur(fg, (k, k), 0)
        return fg > 127

    def update_background(self, frame: np.ndarray) -> np.ndarray:
        """Feed one frame to the background model; returns the cleaned
        foreground mask (H, W) bool."""
        if self.backend == "cv2":
            with self._lock:
                return self._update_background_cv2(frame)
        hw = frame.shape[:2]
        with self._lock, jax.default_device(self._device):
            if self._state is None or self._state_hw != hw:
                self._state = motion_ops.init_mog2_color_state(hw)
                self._state_hw = hw
            state, fg, shadow = motion_ops.mog2_update_color(
                self._state, jax.device_put(frame, self._device),
                jnp.asarray(self.var_threshold, jnp.float32),
                jnp.asarray(self._learning_rate(), jnp.float32),
                jnp.asarray(motion_ops.MOG2_SHADOW_TAU, jnp.float32))
            self._state = state
            if self.detect_shadows:
                fg = fg & ~shadow  # shadow pixels are not motion (ref :99)
            return np.asarray(motion_ops.motion_mask_postprocess(
                fg, blur_size=self.motion_blur_size))

    def _clipped_area(self, bbox_xyxy: np.ndarray, hw) -> np.ndarray:
        """Box areas EXACTLY as the integral-image ratio kernel normalizes
        them (ops/motion.py bbox_motion_ratios: floor x1/y1, ceil x2/y2,
        clip to frame) so ratio * area reconstructs true pixel counts."""
        h, w = hw
        x1 = np.clip(bbox_xyxy[:, 0].astype(np.int32), 0, w)
        y1 = np.clip(bbox_xyxy[:, 1].astype(np.int32), 0, h)
        x2 = np.clip(np.ceil(bbox_xyxy[:, 2]).astype(np.int32), 0, w)
        y2 = np.clip(np.ceil(bbox_xyxy[:, 3]).astype(np.int32), 0, h)
        return np.maximum((x2 - x1) * (y2 - y1), 1).astype(np.float32)

    def _passes(self, ratio: float, area: float) -> bool:
        motion_pixels = ratio * area
        return (motion_pixels >= self.min_motion_pixels
                and ratio > self.min_motion_ratio)

    def has_motion_in_bbox(self, mask: np.ndarray, bbox: Dict[str, float]) -> bool:
        boxes = np.asarray([[bbox["x1"], bbox["y1"], bbox["x2"], bbox["y2"]]],
                           np.float32)
        ratio = float(self._ratios(mask, boxes)[0])
        area = float(self._clipped_area(boxes, mask.shape)[0])
        return self._passes(ratio, area)

    def _ratios(self, mask: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """Per-box foreground ratios; numpy for the cv2 backend (a handful
        of region sums), the integral-image XLA kernel otherwise. Identical
        floor/ceil/clip semantics (ops/motion.py bbox_motion_ratios)."""
        if self.backend == "cv2":
            h, w = mask.shape
            out = np.zeros((len(boxes),), np.float32)
            for i, (x1, y1, x2, y2) in enumerate(boxes):
                xa = int(np.clip(int(x1), 0, w))
                ya = int(np.clip(int(y1), 0, h))
                xb = int(np.clip(np.ceil(x2), 0, w))
                yb = int(np.clip(np.ceil(y2), 0, h))
                region = mask[ya:yb, xa:xb]
                out[i] = region.mean() if region.size else 0.0
            return out
        with jax.default_device(self._device):
            return np.asarray(
                motion_ops.bbox_motion_ratios(jnp.asarray(mask), boxes))

    def _filter_precomputed(
        self, detections: List[Dict[str, Any]]
    ) -> List[Dict[str, Any]]:
        """gates='device' path: threshold the program-computed per-detection
        motion stats (already capture-px units). Detections without the
        fields (sparse-reused keyframes, failure callbacks) pass through —
        the same fail-open the reference has when the mask is unavailable."""
        out = []
        with self._lock:
            self.total_processed += len(detections)
        for det in detections:
            ratio = det.get("motion_ratio")
            pixels = det.get("motion_pixels")
            if ratio is None or pixels is None:
                out.append(det)
                continue
            if pixels >= self.min_motion_pixels and ratio > self.min_motion_ratio:
                out.append(det)
            else:
                with self._lock:
                    self.total_filtered += 1
        return out

    def filter_detections(
        self, frame: np.ndarray, detections: List[Dict[str, Any]],
        mean_luma: Optional[float] = None,
    ) -> List[Dict[str, Any]]:
        """Update the model with this frame, then keep only detections whose
        bbox contains sufficient foreground motion. mean_luma: optional
        program-computed frame brightness (adaptive day/night subclass)."""
        if not self.enabled:
            return detections
        if self.backend == "program":
            return self._filter_precomputed(detections)
        mask = self.update_background(frame)
        if not detections:
            return detections
        boxes = np.asarray(
            [[d["bbox"]["x1"], d["bbox"]["y1"], d["bbox"]["x2"], d["bbox"]["y2"]]
             for d in detections], np.float32)
        ratios = self._ratios(mask, boxes)
        areas = self._clipped_area(boxes, mask.shape)
        out = []
        with self._lock:
            self.total_processed += len(detections)
        for det, ratio, area in zip(detections, ratios, areas):
            if self._passes(float(ratio), float(area)):
                det["motion_ratio"] = float(ratio)
                out.append(det)
            else:
                with self._lock:
                    self.total_filtered += 1
        return out

    def update_params(self, config: Dict[str, Any]) -> List[str]:
        """Hot-reload (reference motion_filter.py:187-244). Changing history/
        var_threshold keeps the learned background; only shape changes reset."""
        coerce = {"enabled": bool, "history": int, "var_threshold": float,
                  "detect_shadows": bool, "min_motion_area": float,
                  "motion_blur_size": int, "min_motion_ratio": float,
                  "min_motion_pixels": int}
        updated = []
        with self._lock:
            for key, typ in coerce.items():
                if key not in config:
                    continue
                try:
                    value = typ(config[key])
                except (TypeError, ValueError):
                    logger.warning("motion_filter.%s: invalid value %r",
                                   key, config[key])
                    continue
                if getattr(self, key) != value:
                    setattr(self, key, value)
                    updated.append(key)
            if self._cv2_sub is not None:
                # apply to the live subtractor without losing the learned
                # background (reference keeps it too, motion_filter.py:187)
                if "history" in updated:
                    self._cv2_sub.setHistory(self.history)
                if "var_threshold" in updated:
                    self._cv2_sub.setVarThreshold(self.var_threshold)
                if "detect_shadows" in updated:
                    self._cv2_sub.setDetectShadows(self.detect_shadows)
        return updated

    def get_stats(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "enabled": self.enabled,
                "total_processed": self.total_processed,
                "total_filtered": self.total_filtered,
                "filter_rate": self.total_filtered / max(self.total_processed, 1),
            }


class AdaptiveMotionFilter(MotionFilter):
    """Day/night-adaptive thresholds (reference motion_filter.py:246-304):
    night frames are noisier (IR), so require a higher motion ratio."""

    def __init__(self, *args, night_min_motion_ratio: float = 0.15,
                 night_luma_threshold: float = 60.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.day_min_motion_ratio = self.min_motion_ratio
        self.night_min_motion_ratio = night_min_motion_ratio
        self.night_luma_threshold = night_luma_threshold

    def filter_detections(self, frame, detections, mean_luma=None):
        if mean_luma is None and frame is not None:
            # program-computed luma avoids this host reduce
            mean_luma = float(frame.mean())
        if mean_luma is not None:
            self.min_motion_ratio = (
                self.night_min_motion_ratio
                if mean_luma < self.night_luma_threshold
                else self.day_min_motion_ratio)
        return super().filter_detections(frame, detections,
                                         mean_luma=mean_luma)
