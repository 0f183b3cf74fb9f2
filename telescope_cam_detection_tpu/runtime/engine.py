"""Per-camera inference engine thread.

Behavioral counterpart of reference ``src/inference_engine_yolox.py:33-805``:
pulls frame dicts from the camera queue, applies dispatch gates (sparse
keyframes, empty-frame motion), dispatches to either the shared coordinator
(async, batched across cameras) or a standalone DetectorProgram, applies
per-camera host-side refinement filters on the <=max_det detections (the
heavy per-anchor filtering already happened on-device), runs Stage 2, and
queues the result dict.

Key differences from the reference, by TPU design:
  * No CUDA OOM retry loop — headroom degradation lives in the coordinator's
    bucket ceiling (runtime/memory.py).
  * No CPU-fallback model load — jax picks the backend; a CPU jax platform
    runs the identical program.
  * Per-class filtering splits: coarse on-device floor (shared program) +
    exact per-camera refinement here, so per-camera hot-reload never touches
    compiled programs.
"""
from __future__ import annotations

import logging
import threading
import time
from queue import Empty, Full, Queue
from typing import Any, Dict, List, Optional

import numpy as np

from telescope_cam_detection_tpu import constants as C
from telescope_cam_detection_tpu.coco_constants import WILDLIFE_CLASSES
from telescope_cam_detection_tpu.runtime.program import rows_to_detections
from telescope_cam_detection_tpu.utils.bbox import ensure_valid_bbox

logger = logging.getLogger(__name__)


class InferenceEngine:
    def __init__(
        self,
        input_queue: Queue,
        output_queue: Queue,
        camera_id: str = "cam1",
        program=None,                    # standalone DetectorProgram
        coordinator=None,                # or SharedInferenceCoordinator
        detection_config: Optional[Dict[str, Any]] = None,
        two_stage_pipeline=None,
        empty_frame_filter=None,
        sparse_interval: int = 1,
    ):
        if program is None and coordinator is None:
            raise ValueError("need a DetectorProgram or a coordinator")
        self.input_queue = input_queue
        self.output_queue = output_queue
        self.camera_id = camera_id
        self.program = program
        self.coordinator = coordinator
        self.two_stage_pipeline = two_stage_pipeline
        self.empty_frame_filter = empty_frame_filter
        self.sparse_interval = max(int(sparse_interval), 1)
        # device-gated program? (gates fused into the dispatch — results
        # arrive as (rows, gate aux) and the host gate objects only apply
        # thresholds; pipeline/filters.DeviceEmptyFrameGate)
        prog = program if program is not None else getattr(
            coordinator, "program", None)
        spec = getattr(prog, "spec", None)
        self._device_gates = getattr(spec, "gates", "none") == "device"
        self._needs_lanes = self._device_gates or (
            getattr(spec, "transfer", None) == "delta")

        cfg = detection_config or {}
        self._settings_lock = threading.Lock()
        self._settings = {
            "conf_threshold": cfg.get("conf_threshold", 0.25),
            "class_confidence_overrides": dict(
                cfg.get("class_confidence_overrides") or {}),
            "min_box_area": cfg.get("min_box_area", 0),
            "max_detections": cfg.get("max_detections", 100),
            "wildlife_only": cfg.get("wildlife_only", True),
            # per-class min/max box-area constraints, e.g.
            # {'bird': {'max': 8000}} (reference inference_engine_yolox.py:
            # 112, applied :523-528, hot-reloaded :699-701)
            "class_size_constraints": dict(
                cfg.get("class_size_constraints") or {}),
        }

        self._thread: Optional[threading.Thread] = None
        self._running = threading.Event()

        self.frames_processed = 0
        self.frames_skipped_sparse = 0
        self.frames_skipped_empty = 0
        self.results_dropped = 0
        self._last_detections: List[Dict[str, Any]] = []
        self._frame_counter = 0
        self._inference_time_ema = 0.0
        self._fps = 0.0
        self._fps_count = 0
        self._fps_t0 = time.time()

    # -- lifecycle ------------------------------------------------------------
    def start(self) -> bool:
        if self._thread is not None and self._thread.is_alive():
            return True
        self._running.set()
        self._thread = threading.Thread(
            target=self._loop, name=f"inference-{self.camera_id}", daemon=True)
        self._thread.start()
        return True

    def stop(self) -> None:
        self._running.clear()
        if self._thread is not None:
            self._thread.join(timeout=C.THREAD_JOIN_TIMEOUT_SECONDS)
            if self._thread.is_alive():
                logger.critical("[%s] inference thread did not stop (leak)",
                                self.camera_id)
            self._thread = None

    # -- main loop ---------------------------------------------------------------
    def _loop(self) -> None:
        while self._running.is_set():
            try:
                item = self.input_queue.get(timeout=C.QUEUE_GET_TIMEOUT_SECONDS)
            except Empty:
                continue
            try:
                self._handle_frame(item)
            except Exception:
                logger.exception("[%s] inference error", self.camera_id)
                time.sleep(C.ERROR_SLEEP_SECONDS)

    def _handle_frame(self, item: Dict[str, Any]) -> None:
        frame = item["frame"]
        self._frame_counter += 1

        # sparse keyframe gate (reference inference_engine_yolox.py:581-586)
        if self.sparse_interval > 1 and \
                (self._frame_counter - 1) % self.sparse_interval != 0:
            self.frames_skipped_sparse += 1
            self._queue_result(item, list(self._last_detections), 0.0,
                               reused=True)
            return

        # empty-frame motion gate (:589-593). Host variant runs BEFORE
        # dispatch (saves the forward); the device variant (gates='device',
        # a DeviceEmptyFrameGate without has_motion) is evaluated in
        # _on_rows from the fused program's output instead.
        if self.empty_frame_filter is not None \
                and hasattr(self.empty_frame_filter, "has_motion") \
                and not self.empty_frame_filter.has_motion(frame):
            self.frames_skipped_empty += 1
            self._queue_result(item, [], 0.0, skipped_empty=True)
            return

        t0 = time.perf_counter()
        if self.coordinator is not None:
            # bind loop variables as defaults (the reference had a capture-by-
            # reference bug here; inference_engine_yolox.py:343-348)
            def callback(rows, gate=None, _item=item, _t0=t0):
                self._on_rows(_item, rows, _t0, gate=gate)
            self.coordinator.infer_async(frame, callback, self.camera_id)
        else:
            lanes = None
            if self._needs_lanes:
                lanes = [self.program.lane_for_stream(self.camera_id)]
            rows, aux = self.program.detect_batch_gated(frame[None],
                                                        lanes=lanes)
            gate = ({k: v[0] for k, v in aux.items()}
                    if aux is not None else None)
            self._on_rows(item, rows[0], t0, gate=gate)

    def _on_rows(self, item: Dict[str, Any], rows: np.ndarray, t0: float,
                 gate: Optional[Dict[str, Any]] = None) -> None:
        try:
            # device empty-frame gate: same observable behavior as the host
            # gate (reference inference_engine_yolox.py:589-593 returns no
            # detections and skips Stage-2), evaluated from the fused
            # program's changed-pixel count instead of a host cv2 pass
            if gate is not None and self.empty_frame_filter is not None \
                    and hasattr(self.empty_frame_filter, "decide"):
                if not self.empty_frame_filter.decide(
                        float(gate["motion_area"]),
                        bool(gate["initialized"])):
                    self.frames_skipped_empty += 1
                    self._queue_result(item, [], 0.0, skipped_empty=True)
                    return
            if gate is not None:
                detections = rows_to_detections(
                    rows, motion_ratio=gate.get("motion_ratio"),
                    motion_pixels=gate.get("motion_pixels"),
                    species_prob=gate.get("species_prob"),
                    species_id=gate.get("species_id"),
                    species_row=gate.get("species_row"),
                    species_valid=gate.get("species_valid"))
            else:
                detections = rows_to_detections(rows)
            detections = self._apply_camera_filters(detections)
            if self.two_stage_pipeline is not None and detections:
                detections = self.two_stage_pipeline.process_detections(
                    item["frame"], detections)
            infer_ms = (time.perf_counter() - t0) * 1000.0
            self._last_detections = detections
            self._queue_result(
                item, detections, infer_ms,
                mean_luma=(float(gate["mean_luma"])
                           if gate is not None and "mean_luma" in gate
                           else None))
        except Exception:
            logger.exception("[%s] post-processing error", self.camera_id)

    # -- per-camera refinement (host side, <=max_det rows) -------------------
    def _apply_camera_filters(
        self, detections: List[Dict[str, Any]]
    ) -> List[Dict[str, Any]]:
        with self._settings_lock:
            s = dict(self._settings)
            overrides = dict(s["class_confidence_overrides"])
            size_constraints = dict(s["class_size_constraints"])
        out = []
        for det in detections:
            det["bbox"] = ensure_valid_bbox(det["bbox"])
            if s["wildlife_only"] and det.get("class_id") not in WILDLIFE_CLASSES:
                continue
            thr = overrides.get(det["class_name"], s["conf_threshold"])
            if det["confidence"] < thr:
                continue
            if det["bbox"]["area"] < s["min_box_area"]:
                continue
            # per-class size constraints (reference :523-528)
            constraints = size_constraints.get(det["class_name"])
            if constraints:
                area = det["bbox"]["area"]
                if "min" in constraints and area < constraints["min"]:
                    continue
                if "max" in constraints and area > constraints["max"]:
                    continue
            out.append(det)
            if len(out) >= s["max_detections"]:
                break
        return out

    def _queue_result(self, item: Dict[str, Any],
                      detections: List[Dict[str, Any]], infer_ms: float,
                      reused: bool = False, skipped_empty: bool = False,
                      mean_luma: Optional[float] = None) -> None:
        self.frames_processed += 1
        if infer_ms > 0:
            self._inference_time_ema = (0.9 * self._inference_time_ema +
                                        0.1 * infer_ms
                                        if self._inference_time_ema else infer_ms)
        self._fps_count += 1
        now = time.time()
        if now - self._fps_t0 >= C.FPS_CALCULATION_INTERVAL_SECONDS:
            self._fps = self._fps_count / (now - self._fps_t0)
            self._fps_count = 0
            self._fps_t0 = now
        result = {
            "frame_id": item["frame_id"],
            "timestamp": item["timestamp"],
            "camera_id": item.get("camera_id", self.camera_id),
            "camera_name": item.get("camera_name", ""),
            "inference_time": infer_ms / 1000.0,
            "detections": detections,
            "frame_shape": tuple(item["frame"].shape),
            "detections_reused": reused,
            "skipped_empty_frame": skipped_empty,
        }
        if mean_luma is not None:
            result["mean_luma"] = mean_luma
        try:
            self.output_queue.put_nowait(result)
        except Full:
            try:
                self.output_queue.get_nowait()
                self.output_queue.put_nowait(result)
            except Exception:
                pass
            self.results_dropped += 1
            if self.results_dropped % C.LOG_DROPPED_EVERY_N == 0:
                logger.warning("[%s] dropped %d results (queue full)",
                               self.camera_id, self.results_dropped)

    # -- hot reload -----------------------------------------------------------
    def update_settings(self, settings: Dict[str, Any]) -> List[str]:
        """Hot-reload per-camera detection settings (reference
        inference_engine_yolox.py:651-704)."""
        updated = []
        with self._settings_lock:
            for key in self._settings:
                if key in settings and self._settings[key] != settings[key]:
                    self._settings[key] = settings[key]
                    updated.append(key)
        if "sparse_interval" in settings:
            self.sparse_interval = max(int(settings["sparse_interval"]), 1)
            updated.append("sparse_interval")
        return updated

    def get_settings(self) -> Dict[str, Any]:
        with self._settings_lock:
            return dict(self._settings)

    # -- stats -----------------------------------------------------------------
    def get_stats(self) -> Dict[str, Any]:
        return {
            "camera_id": self.camera_id,
            "is_running": self._running.is_set(),
            "mode": "coordinator" if self.coordinator is not None else "standalone",
            "frames_processed": self.frames_processed,
            "frames_skipped_sparse": self.frames_skipped_sparse,
            "frames_skipped_empty": self.frames_skipped_empty,
            "results_dropped": self.results_dropped,
            "inference_time_ema_ms": round(self._inference_time_ema, 3),
            "fps": round(self._fps, 2),
            "sparse_interval": self.sparse_interval,
            "empty_frame_filter": (self.empty_frame_filter.get_stats()
                                   if self.empty_frame_filter else None),
        }
