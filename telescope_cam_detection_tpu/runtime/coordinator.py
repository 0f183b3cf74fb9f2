"""Cross-camera dynamic batching onto bucketed static-shape device programs.

The reference's flagship parallelism (shared_inference_coordinator.py:27-338):
N camera threads enqueue frames, one coordinator thread collects a batch
(wait <= max_batch_wait_ms, size <= max_batch_size) and runs ONE forward.

TPU redesign: XLA programs need static shapes, so collected frames are
grouped by capture resolution and padded up to the nearest batch bucket
(constants.BATCH_BUCKETS); each (bucket, resolution) pair compiles once and
is cached. HBM-aware degradation (replacing CUDA OOM retry,
memory_manager.py) shrinks the allowed bucket ceiling under pressure.
"""
from __future__ import annotations

import logging
import threading
import time
from collections import defaultdict, deque
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from telescope_cam_detection_tpu import constants as C

logger = logging.getLogger(__name__)


@dataclass
class PendingInference:
    frame: np.ndarray
    callback: Callable[[np.ndarray], None]   # receives (max_det, 7) rows
    camera_id: str
    enqueue_time: float = field(default_factory=time.time)


def bucket_for(n: int, buckets=C.BATCH_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class SharedInferenceCoordinator:
    """Owns the DetectorProgram; batches across streams."""

    MAX_QUEUE_DEPTH = 60  # reference shared_inference_coordinator.py:148-164

    def __init__(
        self,
        program,                      # DetectorProgram (duck-typed)
        max_batch_size: int = 8,
        max_batch_wait_ms: float = 35.0,
        enable_metrics: bool = True,
        memory_manager=None,          # optional HBM MemoryManager
        callback_workers: int = 4,
    ):
        self.program = program
        self.max_batch_size = max_batch_size
        self.max_batch_wait_ms = max_batch_wait_ms
        self.enable_metrics = enable_metrics
        self.memory_manager = memory_manager
        # Callbacks (which include per-camera post-processing and Stage-2)
        # run OFF the coordinator thread — the reference executes Stage-2 on
        # its coordinator thread, serializing classification against the next
        # batch's dispatch (SURVEY §3.3 note at
        # inference_engine_yolox.py:390-442). Per-camera FIFO lanes over a
        # shared pool: one camera's slow Stage-2 never blocks another
        # camera's results, yet each camera's results stay ordered.
        from telescope_cam_detection_tpu.utils.concurrency import (
            KeySerialExecutor)
        self._callback_pool = KeySerialExecutor(
            max_workers=max(callback_workers, 1),
            thread_name_prefix="coordinator-callbacks")

        self._queue: deque = deque()
        self._cond = threading.Condition()
        self._thread: Optional[threading.Thread] = None
        self._running = threading.Event()

        # delta transfer: lanes come from the program's shared registry
        # (program.lane_for_stream), so engines and coordinator agree
        self._delta = getattr(getattr(program, "spec", None),
                              "transfer", None) == "delta"

        self.total_requests = 0
        self.total_batches = 0
        self.total_frames = 0
        self.total_dropped = 0
        self._batch_sizes: deque = deque(maxlen=200)
        self._wait_times: deque = deque(maxlen=200)
        self._infer_times: deque = deque(maxlen=200)
        self._per_camera: Dict[str, int] = defaultdict(int)

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            return
        self._running.set()
        self._thread = threading.Thread(target=self._loop,
                                        name="inference-coordinator",
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running.clear()
        with self._cond:
            self._cond.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=C.THREAD_JOIN_TIMEOUT_SECONDS)
            if self._thread.is_alive():
                logger.critical("coordinator thread did not stop (leak)")
            self._thread = None
        self._callback_pool.shutdown(wait=True)

    # -- submission -----------------------------------------------------------
    def infer_async(self, frame: np.ndarray,
                    callback: Callable[[np.ndarray], None],
                    camera_id: str = "unknown") -> bool:
        """Queue a frame; callback fires on the coordinator thread with the
        (max_det, 7) detection rows. Returns False if dropped."""
        req = PendingInference(frame, callback, camera_id)
        with self._cond:
            if len(self._queue) >= self.MAX_QUEUE_DEPTH:
                dropped = self._queue.popleft()
                self.total_dropped += 1
                if self.total_dropped % C.LOG_DROPPED_EVERY_N == 1:
                    logger.warning(
                        "coordinator queue full; dropped %d frames so far "
                        "(latest from %s)", self.total_dropped, dropped.camera_id)
                # empty-result callback so the engine's loop continues;
                # routed through the camera's FIFO lane so a drop can never
                # overtake an earlier in-flight result for the same camera
                def drop_cb(dropped=dropped):
                    try:
                        dropped.callback(np.full(
                            (self.program.spec.max_det, 7), -1.0, np.float32))
                    except Exception:
                        logger.exception("dropped-frame callback failed")
                if not self._callback_pool.submit(dropped.camera_id, drop_cb):
                    drop_cb()
            self._queue.append(req)
            self.total_requests += 1
            self._per_camera[camera_id] += 1
            self._cond.notify()
        return True

    # -- batching loop ----------------------------------------------------------
    def _collect(self) -> List[PendingInference]:
        """Block until >=1 request; then linger up to max_batch_wait_ms for
        more, capped at max_batch_size (reference :188-224)."""
        with self._cond:
            while self._running.is_set() and not self._queue:
                self._cond.wait(timeout=0.1)
            if not self._running.is_set():
                return []
            deadline = time.time() + self.max_batch_wait_ms / 1000.0
            limit = self._current_batch_limit()
            while (len(self._queue) < limit and time.time() < deadline
                   and self._running.is_set()):
                self._cond.wait(timeout=max(deadline - time.time(), 0.001))
            batch = []
            while self._queue and len(batch) < limit:
                batch.append(self._queue.popleft())
            return batch

    def _current_batch_limit(self) -> int:
        limit = self.max_batch_size
        if self.memory_manager is not None:
            limit = min(limit, self.memory_manager.recommended_batch_limit(limit))
        return max(limit, 1)

    def _loop(self) -> None:
        while self._running.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                self._process(batch)
            except Exception:
                logger.exception("batch processing failed")
                empty = np.full((self.program.spec.max_det, 7), -1.0, np.float32)
                for req in batch:
                    try:
                        req.callback(empty)
                    except Exception:
                        pass

    def _process(self, batch: List[PendingInference]) -> None:
        now = time.time()
        for req in batch:
            self._wait_times.append(now - req.enqueue_time)

        # group by capture resolution -> homogeneous static-shape programs
        groups: Dict[Tuple[int, int], List[PendingInference]] = defaultdict(list)
        for req in batch:
            groups[req.frame.shape[:2]].append(req)

        for hw, reqs in groups.items():
            n = len(reqs)
            padded_n = min(bucket_for(n), self.max_batch_size)
            if padded_n < n:  # bucket table smaller than batch — split
                for i in range(0, n, padded_n):
                    self._run_group(reqs[i:i + padded_n], hw, padded_n)
            else:
                self._run_group(reqs, hw, padded_n)

    def _run_group(self, reqs: List[PendingInference], hw: Tuple[int, int],
                   padded_n: int) -> None:
        n = len(reqs)
        frames = np.zeros((padded_n, *hw, 3), np.uint8)
        for i, req in enumerate(reqs):
            frames[i] = req.frame
        lanes = None
        if self._delta:
            pad_lane = self.program.lane_for_stream("__pad__")
            lanes = [self.program.lane_for_stream(r.camera_id)
                     for r in reqs] + [pad_lane] * (padded_n - n)
        t0 = time.perf_counter()
        if lanes is None:  # keep duck-typed (lane-less) programs working
            rows = self.program.detect_batch_rows(frames)
        else:
            rows = self.program.detect_batch_rows(frames, lanes=lanes)
        infer_ms = (time.perf_counter() - t0) * 1000.0
        self._infer_times.append(infer_ms)
        self.total_batches += 1
        self.total_frames += n
        self._batch_sizes.append(n)

        for i, req in enumerate(reqs):
            def run_one(req=req, row=rows[i]):
                try:
                    req.callback(row)
                except Exception:
                    logger.exception("inference callback failed (camera %s)",
                                     req.camera_id)
            # keyed by camera: per-camera order holds, cameras overlap
            if not self._callback_pool.submit(req.camera_id, run_one):
                run_one()  # pool shut down during stop(): run inline

    # -- stats ---------------------------------------------------------------
    def get_stats(self) -> Dict[str, Any]:
        sizes = list(self._batch_sizes)
        waits = list(self._wait_times)
        infers = list(self._infer_times)
        return {
            "running": self._running.is_set(),
            "queue_depth": len(self._queue),
            "total_requests": self.total_requests,
            "total_batches": self.total_batches,
            "total_frames": self.total_frames,
            "total_dropped": self.total_dropped,
            "avg_batch_size": float(np.mean(sizes)) if sizes else 0.0,
            "avg_wait_ms": 1000.0 * float(np.mean(waits)) if waits else 0.0,
            "avg_infer_ms": float(np.mean(infers)) if infers else 0.0,
            "per_camera_requests": dict(self._per_camera),
            "max_batch_size": self.max_batch_size,
            "current_batch_limit": self._current_batch_limit(),
        }
