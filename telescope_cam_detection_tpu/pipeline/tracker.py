"""Multi-object tracking: persistent IDs + filtered velocities per camera.

The reference never tracks identity: its collision placeholder lists "track
velocity vectors, predict intersection points" as TODOs
(reference detection_processor.py:388-437), and its snapshot cooldowns are
per-class, not per-animal. This module supplies the missing substrate — a
SORT-style tracker (constant-velocity Kalman filter per track, IoU-gated
greedy association, tentative->confirmed->lost lifecycle) that stamps
``track_id`` / ``track_age`` / ``track_velocity`` onto the detection dicts
flowing through the :class:`~..runtime.processor.DetectionProcessor`.

Host-side by design: association is a handful of 4-float boxes of scalar
work per frame — the TPU does detection, identity is control-plane math
(the same split the fused program draws for NMS-survivor post-filtering).
All state is per camera; cameras never share IDs.

Consumers:
  * ``pipeline.collision.CollisionDetector`` prefers ``track_velocity``
    (px/frame, Kalman-filtered) over its nearest-previous-center heuristic,
    so "approaching" predictions ride a real per-object estimate.
  * WebSocket clients receive the stamped fields with every detection; the
    dashboard labels boxes with ``#id``.

Config block (validated by config.loader, hot-reloadable)::

    tracking:
      enabled: true
      iou_min: 0.3          # association gate
      max_age: 15           # frames a track survives unmatched
      min_hits: 3           # matches before a track is confirmed (gets an id)
      class_consistent: true  # only associate within the same class_name
      max_tracks: 128
"""
from __future__ import annotations

import logging
import threading
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# Constant-velocity Kalman over x = [cx, cy, w, h, vcx, vcy].
# Box size is tracked without its own velocity: during occlusion a w/h
# velocity extrapolates boxes into degenerate or frame-sized rectangles
# (the classic SORT failure with its area-velocity term); a static-size
# prediction keeps the IoU gate meaningful on reappearance.
_F = np.eye(6, dtype=np.float64)
_F[0, 4] = 1.0
_F[1, 5] = 1.0
_H = np.zeros((4, 6), dtype=np.float64)
_H[0, 0] = _H[1, 1] = _H[2, 2] = _H[3, 3] = 1.0
# Measurement noise: detector box jitter, a few px at serving resolutions.
_R = np.diag([4.0, 4.0, 16.0, 16.0]).astype(np.float64)
# Process noise: centers accelerate, sizes drift slowly.
_Q = np.diag([1.0, 1.0, 0.25, 0.25, 0.5, 0.5]).astype(np.float64)


class _Track:
    __slots__ = ("track_id", "class_name", "x", "P", "hits", "age",
                 "time_since_update", "confirmed")

    def __init__(self, track_id: int, class_name: str,
                 box: Tuple[float, float, float, float]):
        self.track_id = track_id
        self.class_name = class_name
        cx, cy, w, h = _box_to_z(box)
        self.x = np.array([cx, cy, w, h, 0.0, 0.0], dtype=np.float64)
        # velocity starts unknown: large variance lets the first few
        # updates set it almost entirely from the measurements
        self.P = np.diag([10.0, 10.0, 10.0, 10.0, 1e3, 1e3]).astype(
            np.float64)
        self.hits = 1
        self.age = 1
        self.time_since_update = 0
        self.confirmed = False

    def predict(self) -> None:
        self.x = _F @ self.x
        self.P = _F @ self.P @ _F.T + _Q
        self.age += 1
        self.time_since_update += 1

    def update(self, box: Tuple[float, float, float, float]) -> None:
        z = np.array(_box_to_z(box), dtype=np.float64)
        y = z - _H @ self.x
        S = _H @ self.P @ _H.T + _R
        K = self.P @ _H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        self.P = (np.eye(6) - K @ _H) @ self.P
        # floor: a Kalman update can't shrink a box below a pixel
        self.x[2] = max(self.x[2], 1.0)
        self.x[3] = max(self.x[3], 1.0)
        self.hits += 1
        self.time_since_update = 0

    def predicted_box(self) -> Tuple[float, float, float, float]:
        cx, cy, w, h = self.x[:4]
        return (cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0)

    def velocity(self) -> Tuple[float, float]:
        return (float(self.x[4]), float(self.x[5]))


def _box_to_z(box) -> Tuple[float, float, float, float]:
    x1, y1, x2, y2 = box
    return ((x1 + x2) / 2.0, (y1 + y2) / 2.0,
            max(x2 - x1, 1.0), max(y2 - y1, 1.0))


def _iou(a, b) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(ix2 - ix1, 0.0), max(iy2 - iy1, 0.0)
    inter = iw * ih
    if inter <= 0.0:
        return 0.0
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-9)


def _det_box(det: Dict[str, Any]) -> Optional[Tuple[float, float, float, float]]:
    bbox = det.get("bbox") or {}
    try:
        box = (float(bbox["x1"]), float(bbox["y1"]),
               float(bbox["x2"]), float(bbox["y2"]))
    except (KeyError, TypeError, ValueError):
        return None
    if box[2] <= box[0] or box[3] <= box[1]:
        return None
    return box


class MultiObjectTracker:
    """Per-camera SORT-style tracker. ``update`` is called once per
    processed result from the processor thread; ``update_params`` may be
    called concurrently from the reload thread (scalar assignments under a
    lock; the processor reads a consistent snapshot per update)."""

    def __init__(self, iou_min: float = 0.3, max_age: int = 15,
                 min_hits: int = 3, class_consistent: bool = True,
                 max_tracks: int = 128):
        self.iou_min = float(iou_min)
        self.max_age = int(max_age)
        self.min_hits = int(min_hits)
        self.class_consistent = bool(class_consistent)
        self.max_tracks = int(max_tracks)
        self._lock = threading.Lock()
        self._tracks: List[_Track] = []
        self._next_id = 1
        self._saturated = False   # warn once per saturation episode
        self.tracks_created = 0
        self.tracks_confirmed = 0
        self.frames_processed = 0

    # ------------------------------------------------------------- main entry
    def update(self, detections: List[Dict[str, Any]]
               ) -> List[Dict[str, Any]]:
        """Advance one frame: predict every live track, associate the
        detections, stamp confirmed matches, retire stale tracks. Returns
        the same list (dicts mutated in place: ``track_id``, ``track_age``
        in frames, ``track_velocity`` {"vx","vy"} px/frame).

        The whole frame advances under ``_lock``: ``get_stats``/``reset``
        may run concurrently from the web-stats / control threads, and an
        unlocked update would silently undo a concurrent ``reset`` when it
        reassigns ``_tracks`` (the per-frame cost at <=max_det boxes is
        negligible next to the Kalman math)."""
        with self._lock:
            return self._update_locked(detections)

    def _update_locked(self, detections: List[Dict[str, Any]]
                       ) -> List[Dict[str, Any]]:
        iou_min, max_age, min_hits = (self.iou_min, self.max_age,
                                      self.min_hits)
        class_consistent = self.class_consistent
        max_tracks = self.max_tracks
        self.frames_processed += 1
        for t in self._tracks:
            t.predict()

        boxes = [_det_box(d) for d in detections]
        candidates: List[Tuple[float, int, int]] = []
        for ti, t in enumerate(self._tracks):
            tbox = t.predicted_box()
            for di, box in enumerate(boxes):
                if box is None:
                    continue
                if class_consistent and (
                        detections[di].get("class_name") != t.class_name):
                    continue
                iou = _iou(tbox, box)
                if iou >= iou_min:
                    candidates.append((iou, ti, di))
        # greedy: globally best IoU first (ByteTrack-style association
        # without the second low-score pass; dependency-free, and at <=
        # max_det boxes the optimality gap vs Hungarian is immaterial)
        candidates.sort(key=lambda c: -c[0])
        used_t: set = set()
        used_d: set = set()
        for iou, ti, di in candidates:
            if ti in used_t or di in used_d:
                continue
            used_t.add(ti)
            used_d.add(di)
            t = self._tracks[ti]
            t.update(boxes[di])
            if not t.confirmed and t.hits >= min_hits:
                t.confirmed = True
                self.tracks_confirmed += 1
            if t.confirmed:
                vx, vy = t.velocity()
                detections[di]["track_id"] = t.track_id
                detections[di]["track_age"] = t.age
                detections[di]["track_velocity"] = {
                    "vx": round(vx, 2), "vy": round(vy, 2)}

        # births: every unmatched valid detection seeds a tentative track
        for di, box in enumerate(boxes):
            if box is None or di in used_d:
                continue
            if len(self._tracks) >= max_tracks:
                # once per saturation EPISODE, not per frame: at 30 fps a
                # busy scene would otherwise emit this 30x/sec per camera
                if not self._saturated:
                    self._saturated = True
                    logger.warning("tracker at max_tracks=%d; unmatched "
                                   "detections not tracked until tracks "
                                   "retire", max_tracks)
                break
            t = _Track(self._next_id, detections[di].get("class_name", "?"),
                       box)
            self._next_id += 1
            self.tracks_created += 1
            if min_hits <= 1:
                t.confirmed = True
                self.tracks_confirmed += 1
                detections[di]["track_id"] = t.track_id
                detections[di]["track_age"] = t.age
                detections[di]["track_velocity"] = {"vx": 0.0, "vy": 0.0}
            self._tracks.append(t)

        # deaths: confirmed tracks ride out max_age missed frames (the
        # Kalman prediction carries them through occlusion); tentative
        # tracks die on their first miss (SORT's spurious-birth guard)
        self._tracks = [
            t for t in self._tracks
            if t.time_since_update <= (max_age if t.confirmed else 0)]
        if self._saturated and len(self._tracks) < max_tracks:
            self._saturated = False   # episode over; next one warns again
        return detections

    # ---------------------------------------------------------------- control
    def update_params(self, config: Dict[str, Any]) -> List[str]:
        """Hot-reload: apply changed scalar knobs, return their names."""
        updated: List[str] = []
        with self._lock:
            for key, cast in (("iou_min", float), ("max_age", int),
                              ("min_hits", int), ("class_consistent", bool),
                              ("max_tracks", int)):
                if key in config:
                    val = cast(config[key])
                    if val != getattr(self, key):
                        setattr(self, key, val)
                        updated.append(key)
        return updated

    def reset(self) -> None:
        with self._lock:
            self._tracks = []
            self._saturated = False

    def get_stats(self) -> Dict[str, Any]:
        with self._lock:   # consistent snapshot vs a concurrent update()
            live = list(self._tracks)
            return {
                "active_tracks": sum(1 for t in live if t.confirmed
                                     and t.time_since_update == 0),
                "live_tracks": len(live),
                "tracks_created": self.tracks_created,
                "tracks_confirmed": self.tracks_confirmed,
                "frames_processed": self.frames_processed,
            }
