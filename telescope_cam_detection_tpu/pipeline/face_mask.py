"""Privacy face masking.

Counterpart of reference ``src/face_masker.py:17-455``: Haar-cascade face
detection (host cv2 — control-path work, per SURVEY §2.3 this intentionally
stays on CPU) with gaussian_blur / pixelate / black_box / adaptive_blur mask
styles, plus a per-camera cache that only re-detects every N frames.
"""
from __future__ import annotations

import logging
import threading
import time
from typing import Any, Dict, List, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

logger = logging.getLogger(__name__)

MASK_STYLES = ("gaussian_blur", "pixelate", "black_box", "adaptive_blur")


class FaceMasker:
    def __init__(
        self,
        mask_style: str = "gaussian_blur",
        detection_backend: str = "opencv_haar",
        min_face_size: int = 30,
        blur_strength: int = 25,
        pixelate_blocks: int = 10,
        scale_factor: float = 1.1,
        min_neighbors: int = 5,
        detect_max_dim: int = 480,
        require_backend: bool = False,
        mask_person_boxes: bool = False,
    ):
        """require_backend: raise at construction when no face detector can
        be loaded — set by the orchestrator whenever privacy masking is
        enabled, so a config that promises masking can never silently serve
        unmasked faces."""
        if mask_style not in MASK_STYLES:
            raise ValueError(f"unknown mask style {mask_style!r}")
        if detection_backend not in ("opencv_haar", "mediapipe"):
            raise ValueError(
                f"unknown detection_backend {detection_backend!r} "
                "(valid: opencv_haar, mediapipe)")
        self.mask_style = mask_style
        self.mask_person_boxes = bool(mask_person_boxes)
        self.detection_backend = detection_backend
        self._mp_detector = None
        if detection_backend == "mediapipe":
            # reference face_masker.py:97-110 offers this backend; this
            # image does not ship mediapipe, so use it when importable and
            # otherwise FAIL LOUDLY under require_backend (a config that
            # names a backend must not silently get a different one)
            try:
                import mediapipe as mp
                self._mp_detector = mp.solutions.face_detection.FaceDetection(
                    model_selection=1, min_detection_confidence=0.5)
            except ImportError:
                if require_backend:
                    raise RuntimeError(
                        "privacy.detection_backend is 'mediapipe' but the "
                        "mediapipe package is not installed; install it or "
                        "set detection_backend: opencv_haar")
                logger.warning("mediapipe not installed; falling back to "
                               "the Haar backend for face masking")
                self.detection_backend = "opencv_haar"
        self.min_face_size = min_face_size
        self.blur_strength = blur_strength | 1  # odd
        self.pixelate_blocks = pixelate_blocks
        self.scale_factor = scale_factor
        self.min_neighbors = min_neighbors
        # faces are detected on a copy downscaled to this max dimension (the
        # pure-python cascade is control-path code; boxes scale back up)
        self.detect_max_dim = max(int(detect_max_dim), 64)
        self._cascade = None
        self._cascade_kind = None
        self.total_faces_detected = 0
        self.total_frames_processed = 0
        if require_backend and self._get_cascade() is None:
            raise RuntimeError(
                "privacy face masking is enabled but no face-detection "
                "backend could be loaded (no cv2 CascadeClassifier and no "
                "cascade XML found for the built-in detector)")

    def _get_cascade(self):
        if self._cascade is not None:
            return self._cascade
        if cv2 is not None and hasattr(cv2, "CascadeClassifier"):
            # cv2 <= 4.x native implementation (fast C++ path)
            path = cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
            cascade = cv2.CascadeClassifier(path)
            if not cascade.empty():
                self._cascade, self._cascade_kind = cascade, "cv2"
                return self._cascade
        # cv2 >= 5.0 dropped CascadeClassifier but still ships the trained
        # cascade XMLs; use the first-party evaluator (pipeline/haar.py)
        from telescope_cam_detection_tpu.pipeline.haar import (
            HaarCascade, find_cascade_file)
        path = find_cascade_file()
        if path is not None:
            try:
                self._cascade = HaarCascade.load(path)
                self._cascade_kind = "builtin"
                return self._cascade
            except Exception as e:  # pragma: no cover
                logger.error("failed to load cascade %s: %s", path, e)
        if not getattr(self, "_warned_no_backend", False):
            logger.warning("no face-detection backend available; face "
                           "masking will be a no-op")
            self._warned_no_backend = True
        return None

    def _detect_mediapipe(self, frame: np.ndarray
                          ) -> List[Tuple[int, int, int, int]]:
        """Relative-coordinate detections -> pixel (x, y, w, h), min-size
        filtered (reference face_masker.py mediapipe path)."""
        rgb = frame[..., ::-1] if frame.ndim == 3 else frame
        results = self._mp_detector.process(np.ascontiguousarray(rgb))
        out = []
        h, w = frame.shape[:2]
        for det in (getattr(results, "detections", None) or []):
            box = det.location_data.relative_bounding_box
            fw, fh = int(box.width * w), int(box.height * h)
            if min(fw, fh) < self.min_face_size:
                continue
            out.append((int(box.xmin * w), int(box.ymin * h), fw, fh))
        return out

    # -- detection -----------------------------------------------------------
    def detect_faces(self, frame: np.ndarray) -> List[Tuple[int, int, int, int]]:
        """Returns (x, y, w, h) tuples in frame coordinates."""
        self.total_frames_processed += 1
        if self._mp_detector is not None:
            faces_mp = self._detect_mediapipe(frame)
            self.total_faces_detected += len(faces_mp)
            return faces_mp
        cascade = self._get_cascade()
        if cascade is None:
            return []
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) if frame.ndim == 3 \
            else frame
        # Downscale for speed, but never below the point where a
        # min_face_size face shrinks under the cascade's 24px training
        # window — otherwise small faces silently become undetectable
        # (a privacy regression, not a speed trade).
        window = 24
        scale = 1.0
        if max(gray.shape) > self.detect_max_dim:
            scale = max(gray.shape) / self.detect_max_dim
            scale = min(scale, max(self.min_face_size / window, 1.0))
        if scale > 1.0:
            gray = cv2.resize(
                gray, (max(int(round(gray.shape[1] / scale)), 1),
                       max(int(round(gray.shape[0] / scale)), 1)),
                interpolation=cv2.INTER_LINEAR)
        min_px = max(int(round(self.min_face_size / scale)), window)
        if self._cascade_kind == "cv2":
            faces = cascade.detectMultiScale(
                gray, scaleFactor=self.scale_factor,
                minNeighbors=self.min_neighbors, minSize=(min_px, min_px))
        else:
            faces = cascade.detect_multi_scale(
                gray, scale_factor=self.scale_factor,
                min_neighbors=self.min_neighbors, min_size=(min_px, min_px))
        out = [tuple(int(round(v * scale)) for v in f) for f in faces]
        self.total_faces_detected += len(out)
        return out

    # -- masking ---------------------------------------------------------------
    def apply_mask(self, frame: np.ndarray,
                   faces: List[Tuple[int, int, int, int]],
                   copy: bool = True) -> np.ndarray:
        out = frame.copy() if copy else frame
        fh, fw = out.shape[:2]
        for (x, y, w, h) in faces:
            # clamp to frame bounds: Haar boxes are always in-frame, but
            # person-detection boxes (mask_person_boxes) can extend past
            # the edges, and a partial region must resize to ITS OWN
            # shape, not the nominal (w, h)
            x1, y1 = max(x, 0), max(y, 0)
            x2, y2 = min(x + w, fw), min(y + h, fh)
            rw, rh = x2 - x1, y2 - y1
            if rw <= 0 or rh <= 0:
                continue
            region = out[y1:y2, x1:x2]
            if self.mask_style == "gaussian_blur":
                k = self.blur_strength
                out[y1:y2, x1:x2] = cv2.GaussianBlur(region, (k, k), 0)
            elif self.mask_style == "pixelate":
                b = max(self.pixelate_blocks, 1)
                small = cv2.resize(region,
                                   (max(rw // b, 1), max(rh // b, 1)),
                                   interpolation=cv2.INTER_LINEAR)
                out[y1:y2, x1:x2] = cv2.resize(
                    small, (rw, rh), interpolation=cv2.INTER_NEAREST)
            elif self.mask_style == "black_box":
                out[y1:y2, x1:x2] = 0
            elif self.mask_style == "adaptive_blur":
                # blur strength scales with face size (bigger face = closer
                # = needs stronger blur); reference face_masker.py:300-345
                k = (max(self.blur_strength, int(max(rw, rh) / 3)) | 1)
                out[y1:y2, x1:x2] = cv2.GaussianBlur(region, (k, k), 0)
        return out

    def person_boxes(self, detections) -> List[Tuple[int, int, int, int]]:
        """Whole-body regions from person detections, as (x, y, w, h) —
        the reference's planned "Person detection masking (blur entire
        body, not just face)" (PRIVACY_MASKING.md Planned Enhancements).
        Only used when mask_person_boxes is on."""
        boxes = []
        for d in detections or []:
            if d.get("class_name") != "person":
                continue
            bb = d.get("bbox") or {}
            try:
                x1, y1 = int(bb["x1"]), int(bb["y1"])
                w, h = int(bb["x2"]) - x1, int(bb["y2"]) - y1
            except (KeyError, TypeError, ValueError):
                continue
            if w > 0 and h > 0:
                boxes.append((x1, y1, w, h))
        return boxes

    def mask_frame(self, frame: np.ndarray, copy: bool = True,
                   detections=None) -> np.ndarray:
        boxes = self.detect_faces(frame)
        if self.mask_person_boxes and detections:
            boxes = boxes + self.person_boxes(detections)
        return self.apply_mask(frame, boxes, copy=copy)

    def get_stats(self) -> Dict[str, Any]:
        return {
            "mask_style": self.mask_style,
            "backend": self.detection_backend,
            "total_frames_processed": self.total_frames_processed,
            "total_faces_detected": self.total_faces_detected,
        }


class FaceMaskingCache:
    """Per-camera cached face positions, re-detected every N frames
    (reference face_masker.py:367-455)."""

    def __init__(self, masker: FaceMasker, detection_interval: int = 5,
                 ttl_seconds: float = 2.0,
                 camera_overrides: Dict[str, Dict[str, Any]] = None):
        self.masker = masker
        self.detection_interval = max(int(detection_interval), 1)
        self.ttl_seconds = ttl_seconds
        # per-camera enable/disable (reference privacy.camera_overrides,
        # face_masker cache consulted per camera in web_server MJPEG path)
        self.camera_overrides = dict(camera_overrides or {})
        self._lock = threading.Lock()
        self._faces: Dict[str, List[Tuple[int, int, int, int]]] = {}
        self._stamp: Dict[str, float] = {}
        self._counter: Dict[str, int] = {}

    def enabled_for(self, camera_id: str) -> bool:
        override = self.camera_overrides.get(camera_id)
        if override is None:
            return True
        return bool(override.get("enable_face_masking", True))

    def mask_frame(self, camera_id: str, frame: np.ndarray,
                   copy: bool = True, detections=None) -> np.ndarray:
        if not self.enabled_for(camera_id):
            return frame.copy() if copy else frame
        with self._lock:
            count = self._counter.get(camera_id, 0)
            self._counter[camera_id] = count + 1
            stale = (time.time() - self._stamp.get(camera_id, 0.0)
                     > self.ttl_seconds)
            need_detect = stale or count % self.detection_interval == 0
        if need_detect:
            faces = self.masker.detect_faces(frame)
            with self._lock:
                self._faces[camera_id] = faces
                self._stamp[camera_id] = time.time()
        else:
            with self._lock:
                faces = self._faces.get(camera_id, [])
        # person boxes are never cached: they come from the current
        # frame's detections, which are fresher than the face cache
        if self.masker.mask_person_boxes and detections:
            faces = list(faces) + self.masker.person_boxes(detections)
        if not faces:
            return frame.copy() if copy else frame
        return self.masker.apply_mask(frame, faces, copy=copy)
