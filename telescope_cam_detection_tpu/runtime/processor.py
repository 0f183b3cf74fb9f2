"""Per-camera detection post-processing thread.

Counterpart of reference ``src/detection_processor.py:28-386``: pulls
inference results, grabs a thread-safe copy of the camera's latest frame,
applies the motion filter (background-subtraction gate) and time-of-day
filter, computes end-to-end latency, maintains a detection history, triggers
snapshot/clip saving, and pushes to the shared detection queue feeding the
web plane.
"""
from __future__ import annotations

import logging
import threading
import time
from collections import Counter, deque
from queue import Empty, Full, Queue
from typing import Any, Callable, Dict, List, Optional

from telescope_cam_detection_tpu import constants as C

logger = logging.getLogger(__name__)


class DetectionProcessor:
    def __init__(
        self,
        input_queue: Queue,
        output_queue: Queue,
        camera_id: str = "cam1",
        get_latest_frame: Optional[Callable[[], Any]] = None,
        motion_filter=None,
        time_of_day_filter=None,
        snapshot_saver=None,
        collision_detector=None,
        tracker=None,
        history_size: int = 30,
    ):
        self.input_queue = input_queue
        self.output_queue = output_queue
        self.camera_id = camera_id
        self.get_latest_frame = get_latest_frame
        self.motion_filter = motion_filter
        self.time_of_day_filter = time_of_day_filter
        self.snapshot_saver = snapshot_saver
        self.collision_detector = collision_detector
        self.tracker = tracker
        self.history: deque = deque(maxlen=history_size)

        self._thread: Optional[threading.Thread] = None
        self._running = threading.Event()
        self.results_processed = 0
        self.results_dropped = 0
        self.total_detections = 0
        self._latency_samples: deque = deque(maxlen=200)

    def start(self) -> bool:
        if self._thread is not None and self._thread.is_alive():
            return True
        self._running.set()
        self._thread = threading.Thread(
            target=self._loop, name=f"processor-{self.camera_id}", daemon=True)
        self._thread.start()
        return True

    def stop(self) -> None:
        self._running.clear()
        if self._thread is not None:
            self._thread.join(timeout=C.THREAD_JOIN_TIMEOUT_SECONDS)
            if self._thread.is_alive():
                logger.critical("[%s] processor thread did not stop (leak)",
                                self.camera_id)
            self._thread = None

    def _loop(self) -> None:
        while self._running.is_set():
            try:
                result = self.input_queue.get(timeout=C.QUEUE_GET_TIMEOUT_SECONDS)
            except Empty:
                continue
            try:
                self._process(result)
            except Exception:
                logger.exception("[%s] processing error", self.camera_id)
                time.sleep(C.ERROR_SLEEP_SECONDS)

    def _needs_frame(self) -> bool:
        """Grab-and-copy of the camera's latest frame costs ~1.2 ms at
        1440p — skip it when nothing downstream consumes pixels (program-
        backed motion filter thresholds device-computed stats; snapshots
        may be disabled)."""
        # a DISABLED saver is still constructed (hot-reload can enable it
        # later) but consumes no pixels — without the enabled check every
        # result paid the copy anyway (measured 26.8% of the host core on
        # the 8-cam config-5 bench with snapshots off)
        if self.snapshot_saver is not None and getattr(
                self.snapshot_saver, "enabled", True):
            return True
        mf = self.motion_filter
        return (mf is not None and getattr(mf, "enabled", True)
                and getattr(mf, "backend", None) != "program")

    def _process(self, result: Dict[str, Any]) -> None:
        frame = (self.get_latest_frame()
                 if self.get_latest_frame and self._needs_frame() else None)
        detections: List[Dict[str, Any]] = result.get("detections", [])

        if self.motion_filter is not None and (
                frame is not None
                or getattr(self.motion_filter, "backend", None) == "program"):
            detections = self.motion_filter.filter_detections(
                frame, detections, mean_luma=result.get("mean_luma"))
        # motion_ratio/motion_pixels are gated-program transport for the
        # filter above, not part of the reference detection format — strip
        # before the result reaches the wire. species_raw is popped by
        # two_stage; strip here too for cameras running without a Stage-2
        # pipeline against a fused program.
        for d in detections:
            d.pop("motion_ratio", None)
            d.pop("motion_pixels", None)
            d.pop("species_raw", None)
        if self.time_of_day_filter is not None:
            detections = self.time_of_day_filter.filter_detections(detections)
        # tracking runs AFTER the filters (IDs only for detections that
        # survive) and BEFORE collision (which prefers the Kalman velocity
        # over its nearest-center heuristic)
        if self.tracker is not None:
            detections = self.tracker.update(detections)

        now = time.time()
        result["detections"] = detections
        result["total_detections"] = len(detections)
        result["total_latency_ms"] = (now - result["timestamp"]) * 1000.0
        result["processed_timestamp"] = now
        counts = Counter(d.get("class_name", "?") for d in detections)
        result["detection_counts"] = dict(counts)
        # local read: the zone editor may swap/None this attribute live
        collision = self.collision_detector
        if collision is not None:
            alerts = collision.check(detections, now=now)
            if alerts:
                result["collision_alerts"] = alerts
                for a in alerts:
                    logger.warning("[%s] collision %s: %s near zone %r "
                                   "(%.0f px%s)", self.camera_id, a["risk"],
                                   a["class_name"], a["zone"],
                                   a["distance_px"],
                                   ", predicted" if a["predicted"] else "")

        self.results_processed += 1
        self.total_detections += len(detections)
        self._latency_samples.append(result["total_latency_ms"])
        if detections:
            self.history.append({
                "timestamp": now,
                "frame_id": result.get("frame_id"),
                "counts": dict(counts),
            })

        if self.snapshot_saver is not None and frame is not None:
            try:
                if hasattr(self.snapshot_saver, "add_frame_to_buffer"):
                    self.snapshot_saver.add_frame_to_buffer(
                        self.camera_id, frame, now)
                self.snapshot_saver.process_detections(
                    self.camera_id, frame, detections)
            except Exception:
                logger.exception("[%s] snapshot handling failed", self.camera_id)

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
                drop_rate = self.results_dropped / max(self.results_processed, 1)
                logger.warning("[%s] dropped %d results (%.1f%% drop rate)",
                               self.camera_id, self.results_dropped,
                               100 * drop_rate)

    def get_stats(self) -> Dict[str, Any]:
        lat = list(self._latency_samples)
        lat_sorted = sorted(lat)

        def pct(p):
            if not lat_sorted:
                return 0.0
            return lat_sorted[min(int(len(lat_sorted) * p), len(lat_sorted) - 1)]

        stats = {
            "camera_id": self.camera_id,
            "is_running": self._running.is_set(),
            "results_processed": self.results_processed,
            "results_dropped": self.results_dropped,
            "total_detections": self.total_detections,
            "latency_ms_p50": round(pct(0.50), 2),
            "latency_ms_p95": round(pct(0.95), 2),
            "latency_ms_p99": round(pct(0.99), 2),
            "history_size": len(self.history),
        }
        if self.tracker is not None:
            stats["tracking"] = self.tracker.get_stats()
        return stats


# CollisionDetector graduated from the Phase-3 placeholder the reference
# ships (detection_processor.py:388-437) into a real implementation:
from telescope_cam_detection_tpu.pipeline.collision import (  # noqa: E402,F401
    CollisionDetector,
)
