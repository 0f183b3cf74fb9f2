"""Snapshot and clip products.

Counterpart of reference ``src/snapshot_saver.py:34-724``: one shared saver
for all cameras. Trigger rule: class in trigger_classes AND confidence >=
min_confidence AND per-(camera, class) cooldown expired. Image mode writes
raw/ masked/ annotated/ trees per camera plus an atomically-renamed metadata
JSON; clip mode keeps a JPEG-compressed ring pre-buffer per camera (bounded
memory) and writes mp4 via cv2.VideoWriter.
"""
from __future__ import annotations

import json
import logging
import os
import threading
import time
from collections import deque
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

logger = logging.getLogger(__name__)

MAX_BUFFER_BYTES = 500 * 1024 * 1024  # reference snapshot_saver.py:27


class SnapshotSaver:
    def __init__(
        self,
        output_dir: str = "clips",
        enabled: bool = True,
        save_mode: str = "image",
        trigger_classes: Optional[List[str]] = None,
        min_confidence: float = 0.30,
        cooldown_seconds: float = 45.0,
        save_annotated: bool = True,
        clip_duration: float = 10.0,
        pre_buffer_seconds: float = 5.0,
        fps: float = 30.0,
        jpeg_quality: int = 85,
        face_masker=None,
        notify_callback=None,
        alert_zones: Optional[Dict[str, List[Dict[str, Any]]]] = None,
        post_buffer_seconds: float = 0.0,
        post_motion_extend: bool = False,
        max_post_seconds: float = 30.0,
        dedup_tracks: bool = False,
    ):
        self.output_dir = Path(output_dir)
        self.enabled = enabled
        self.save_mode = save_mode
        self.trigger_classes = set(trigger_classes or [])
        self.min_confidence = min_confidence
        self.cooldown_seconds = cooldown_seconds
        self.save_annotated = save_annotated
        self.clip_duration = clip_duration
        self.pre_buffer_seconds = pre_buffer_seconds
        self.fps = fps
        self.jpeg_quality = jpeg_quality
        self.face_masker = face_masker
        # detection-trigger notifications (the reference's planned
        # "Email/SMS notifications on trigger", SNAPSHOT_FEATURE.md
        # "Future Enhancements"): called with a structured event after a
        # successful save — the snapshot cooldown already bounds the rate
        self.notify_callback = notify_callback
        # alert zones (another planned item in the same list: "save only
        # when detection in specific area"): camera_id -> polygons in the
        # collision-zone schema [{name, points: [[x, y], ...]}]. When a
        # camera has zones, a detection only triggers if its bbox center
        # lies inside one; cameras without zones keep the plain rule.
        self.alert_zones = dict(alert_zones or {})
        # true pre+post clip recording. The reference saves the pre-buffer
        # only and says so in a comment ("for full pre+post recording,
        # you'd need to continue recording after detection",
        # snapshot_saver.py:548-550); post_buffer_seconds > 0 builds that:
        # the clip stays open collecting post-trigger frames and finalizes
        # at the deadline. post_motion_extend pushes the deadline while
        # detections keep arriving (the planned "motion detection for clip
        # post-buffer"), bounded by max_post_seconds.
        self.post_buffer_seconds = float(post_buffer_seconds)
        self.post_motion_extend = bool(post_motion_extend)
        self.max_post_seconds = float(max_post_seconds)
        # track-aware dedup (needs `tracking.enabled`): a detection that
        # carries a track_id triggers once per track — one event per animal
        # VISIT instead of one per (class, cooldown window). Two coyotes
        # arriving together produce two events (per-class cooldown would
        # merge them); one coyote loitering for ten minutes produces one
        # (per-class cooldown would re-fire every cooldown_seconds). Track
        # ids are per-camera monotonic and never reused, so a returning
        # animal (new id after tracking.max_age missed frames) is a new
        # visit. Untracked detections keep the class-cooldown rule.
        self.dedup_tracks = bool(dedup_tracks)
        # tentative->confirmed hand-off: a new animal's first min_hits-1
        # frames carry no track_id yet, so its very first save fires via
        # the CLASS cooldown; when its track confirms moments later, the
        # track-keyed path must treat that save as THIS track's event (one
        # event per visit) instead of firing a second one. Each class save
        # leaves one claim; the first track of that class to confirm within
        # the grace window consumes it silently. A second animal arriving
        # together finds the claim gone and fires its own event.
        self.track_confirm_grace = 5.0   # seconds; >= min_hits/fps
        self._pending_class_claims: Dict[Tuple[str, str], float] = {}
        self._pending_lock = threading.Lock()
        self._pending_clips: Dict[str, Dict[str, Any]] = {}
        self._pending_bytes = 0  # post-frame bytes across all open clips
        self._writer_threads: List[threading.Thread] = []
        self._retention_thread: Optional[threading.Thread] = None
        self._retention_stop = threading.Event()

        self._cooldown_lock = threading.Lock()
        self._last_save: Dict[Tuple[str, str], float] = {}
        self._buffer_lock = threading.Lock()
        self._buffers: Dict[str, deque] = {}
        self._buffer_bytes = 0

        self.snapshots_saved = 0
        self.clips_saved = 0
        self.triggers_suppressed = 0

    # -- trigger rule ------------------------------------------------------------
    def should_save(self, detections: List[Dict[str, Any]],
                    camera_id: str = "cam") -> Optional[Dict[str, Any]]:
        """Return the triggering detection, or None
        (reference snapshot_saver.py:209-245)."""
        if not self.enabled or cv2 is None:
            return None
        now = time.time()
        for det in detections:
            # class/conf/zone gates all run BEFORE the cooldown stamp: an
            # ineligible detection must not consume the cooldown window
            if not self._trigger_eligible(camera_id, det):
                continue
            track_id = det.get("track_id") if self.dedup_tracks else None
            if track_id is not None:
                key = (camera_id, f"track:{track_id}")
                claim = (camera_id, det.get("class_name", ""))
                with self._cooldown_lock:
                    if key in self._last_save:   # this animal already saved
                        self.triggers_suppressed += 1
                        continue
                    self._last_save[key] = now
                    self._prune_track_stamps(now)
                    # first confirmation after a pre-confirmation (class
                    # keyed) save: that save WAS this animal's event —
                    # consume the claim and stay silent instead of firing
                    # a second event for the same visit
                    ts = self._pending_class_claims.get(claim)
                    if ts is not None and now - ts <= self.track_confirm_grace:
                        del self._pending_class_claims[claim]
                        self.triggers_suppressed += 1
                        continue
            else:
                key = (camera_id, det.get("class_name", ""))
                with self._cooldown_lock:
                    last = self._last_save.get(key, 0.0)
                    if now - last < self.cooldown_seconds:
                        self.triggers_suppressed += 1
                        continue
                    self._last_save[key] = now
                    if self.dedup_tracks:
                        # likely a tentative track (no id yet): leave a
                        # claim for its confirmation to consume
                        self._pending_class_claims[key] = now
            return det
        return None

    def _prune_track_stamps(self, now: float, cap: int = 4096) -> None:
        """Track stamps are write-once per id (ids never recur), so the
        dict grows with every tracked visit — enforce a hard cap by
        evicting the OLDEST track stamps first (class-cooldown keys are
        few and never evicted). Age alone was a no-op when >cap stamps
        accumulated within the horizon, yet rebuilt the dict on every
        save; oldest-first keeps the prune O(n log n) only when the cap
        is actually crossed and can't evict a recent (likely still live)
        track. Caller holds _cooldown_lock. Stale claims ride along."""
        if len(self._last_save) <= cap:
            return
        track_keys = [k for k in self._last_save
                      if isinstance(k[1], str) and k[1].startswith("track:")]
        excess = len(self._last_save) - cap
        if excess > 0 and track_keys:
            track_keys.sort(key=lambda k: self._last_save[k])
            for k in track_keys[:excess]:
                del self._last_save[k]
        if len(self._pending_class_claims) > 256:   # abandoned claims
            self._pending_class_claims = {
                k: ts for k, ts in self._pending_class_claims.items()
                if now - ts <= self.track_confirm_grace}

    def _trigger_eligible(self, camera_id: str, det: Dict[str, Any]) -> bool:
        """Class + confidence + alert-zone gates (everything in the
        trigger rule EXCEPT the cooldown)."""
        name = det.get("class_name", "")
        if self.trigger_classes and name not in self.trigger_classes:
            return False
        if det.get("confidence", 0.0) < self.min_confidence:
            return False
        return self._in_alert_zone(camera_id, det)

    def _in_alert_zone(self, camera_id: str, det: Dict[str, Any]) -> bool:
        zones = self.alert_zones.get(camera_id)
        if not zones:
            return True
        bb = det.get("bbox") or {}
        try:
            center = ((float(bb["x1"]) + float(bb["x2"])) / 2.0,
                      (float(bb["y1"]) + float(bb["y2"])) / 2.0)
        except (KeyError, TypeError, ValueError):
            return False
        from telescope_cam_detection_tpu.pipeline.collision import (
            point_in_polygon)
        return any(point_in_polygon(center, z.get("points") or [])
                   for z in zones)

    # -- clip pre-buffer -----------------------------------------------------------
    def add_frame_to_buffer(self, camera_id: str, frame: np.ndarray,
                            timestamp: float) -> None:
        """JPEG-compressed ring buffer (~10x memory saving; reference
        snapshot_saver.py:141-207), bounded globally at MAX_BUFFER_BYTES."""
        if not self.enabled or self.save_mode != "clip" or cv2 is None:
            return
        ok, buf = cv2.imencode(
            ".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, self.jpeg_quality])
        if not ok:
            return
        data = buf.tobytes()
        maxlen = max(int(self.pre_buffer_seconds * self.fps), 1)
        with self._buffer_lock:
            ring = self._buffers.get(camera_id)
            if ring is None or ring.maxlen != maxlen:
                if ring is not None:  # settings changed: release old bytes
                    self._buffer_bytes -= sum(len(d) for _, d in ring)
                ring = deque(maxlen=maxlen)
                self._buffers[camera_id] = ring
            if len(ring) == ring.maxlen and ring:
                self._buffer_bytes -= len(ring[0][1])
            ring.append((timestamp, data))
            self._buffer_bytes += len(data)
            while self._buffer_bytes > MAX_BUFFER_BYTES and ring:
                _, old = ring.popleft()
                self._buffer_bytes -= len(old)
        # feed an open pending clip's post-trigger frames; finalize at the
        # (possibly extended) deadline, or early if post frames across all
        # open clips exceed the same byte budget that bounds the ring
        finalize = False
        with self._pending_lock:
            pending = self._pending_clips.get(camera_id)
            if pending is not None:
                pending["post"].append((timestamp, data))
                self._pending_bytes += len(data)
                finalize = (timestamp >= pending["deadline"]
                            or timestamp >= pending["hard_deadline"]
                            or self._pending_bytes > MAX_BUFFER_BYTES)
                if self._pending_bytes > MAX_BUFFER_BYTES:
                    logger.warning(
                        "[%s] post-trigger frames hit the %d MB budget; "
                        "finalizing clip early", camera_id,
                        MAX_BUFFER_BYTES // (1024 * 1024))
        if finalize:
            self._finalize_clip(camera_id)

    # -- products -------------------------------------------------------------------
    def process_detections(self, camera_id: str, frame: np.ndarray,
                           detections: List[Dict[str, Any]]) -> Optional[str]:
        """Check the trigger and save a snapshot or clip. Returns the saved
        path (or None)."""
        # while this camera's clip is still recording: trigger-ELIGIBLE
        # detections extend the deadline (the planned "motion detection
        # for clip post-buffer" — an unrelated class or out-of-zone
        # detection must not balloon the clip), capped at
        # max_post_seconds; new triggers are absorbed WITHOUT consuming a
        # class's cooldown window (the open clip is already capturing the
        # event on video, and the class can trigger normally afterwards)
        with self._pending_lock:
            recording = camera_id in self._pending_clips
        if recording:
            if self.post_motion_extend and any(
                    self._trigger_eligible(camera_id, d)
                    for d in detections):
                now = time.time()
                with self._pending_lock:
                    p = self._pending_clips.get(camera_id)
                    if p is not None:
                        p["deadline"] = min(now + self.post_buffer_seconds,
                                            p["hard_deadline"])
            return None
        trigger = self.should_save(detections, camera_id)
        if trigger is None:
            return None
        if self.save_mode == "clip":
            path = self.save_clip(camera_id, frame, detections, trigger)
        else:
            path = self.save_snapshot(camera_id, frame, detections, trigger)
        if path is not None:
            self._notify(camera_id, trigger, detections, path)
        return path

    def _notify(self, camera_id: str, trigger: Dict[str, Any],
                detections: List[Dict[str, Any]], path: str) -> None:
        if self.notify_callback is None:
            return
        counts: Dict[str, int] = {}
        for d in detections:
            name = d.get("class_name", "?")
            counts[name] = counts.get(name, 0) + 1
        try:
            self.notify_callback({
                # class name in the event key so the alerter's
                # per-(camera, event) rate limit is per-class, matching
                # the cooldown's granularity
                "event": f"detection:{trigger.get('class_name', 'det')}",
                "camera_id": camera_id,
                "class_name": trigger.get("class_name"),
                "confidence": trigger.get("confidence"),
                "species": trigger.get("species"),
                "species_confidence": trigger.get("species_confidence"),
                "detection_counts": counts,
                "save_mode": self.save_mode,
                "path": path,
                "timestamp": time.time(),
            })
        except Exception:
            logger.exception("[%s] snapshot notification failed", camera_id)

    def save_snapshot(self, camera_id: str, frame: np.ndarray,
                      detections: List[Dict[str, Any]],
                      trigger: Dict[str, Any]) -> Optional[str]:
        """raw/ + masked/ + annotated/ + atomic metadata JSON
        (reference snapshot_saver.py:289-462)."""
        if cv2 is None:
            return None
        ts = time.time()
        stamp = time.strftime("%Y%m%d_%H%M%S", time.localtime(ts))
        name = f"{camera_id}_{trigger.get('class_name', 'det')}_{stamp}_{int((ts % 1) * 1000):03d}"
        base = self.output_dir / camera_id
        try:
            raw_dir = base / "raw"
            raw_dir.mkdir(parents=True, exist_ok=True)
            raw_path = raw_dir / f"{name}.jpg"
            cv2.imwrite(str(raw_path), frame,
                        [cv2.IMWRITE_JPEG_QUALITY, self.jpeg_quality])

            if self.face_masker is not None:
                masked_dir = base / "masked"
                masked_dir.mkdir(parents=True, exist_ok=True)
                masked = self.face_masker.mask_frame(frame,
                                                     detections=detections)
                cv2.imwrite(str(masked_dir / f"{name}.jpg"), masked,
                            [cv2.IMWRITE_JPEG_QUALITY, self.jpeg_quality])

            if self.save_annotated:
                from telescope_cam_detection_tpu.utils.visualization import (
                    draw_detections)
                ann_dir = base / "annotated"
                ann_dir.mkdir(parents=True, exist_ok=True)
                annotated = draw_detections(frame, detections)
                cv2.imwrite(str(ann_dir / f"{name}.jpg"), annotated,
                            [cv2.IMWRITE_JPEG_QUALITY, self.jpeg_quality])

            self._write_metadata(base / f"{name}.json", camera_id, ts,
                                 detections, trigger, str(raw_path))
            self.snapshots_saved += 1
            logger.info("[%s] snapshot saved: %s", camera_id, name)
            return str(raw_path)
        except (OSError, cv2.error):
            logger.exception("[%s] snapshot save failed", camera_id)
            return None

    def save_clip(self, camera_id: str, frame: np.ndarray,
                  detections: List[Dict[str, Any]],
                  trigger: Dict[str, Any]) -> Optional[str]:
        """Pre-buffer + trigger frame -> mp4 (reference
        snapshot_saver.py:464-576). With post_buffer_seconds > 0 the clip
        instead stays OPEN collecting post-trigger frames (true pre+post
        recording — the limitation the reference's own comment concedes)
        and finalizes from add_frame_to_buffer; this call returns None and
        the notification fires at finalize time."""
        if cv2 is None:
            return None
        ts = time.time()
        stamp = time.strftime("%Y%m%d_%H%M%S", time.localtime(ts))
        name = f"{camera_id}_{trigger.get('class_name', 'det')}_{stamp}"
        with self._buffer_lock:
            ring = list(self._buffers.get(camera_id, ()))
        h, w = frame.shape[:2]
        ok, buf = cv2.imencode(
            ".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, self.jpeg_quality])
        trigger_jpeg = buf.tobytes() if ok else None
        if self.post_buffer_seconds > 0:
            with self._pending_lock:
                if camera_id in self._pending_clips:
                    return None  # already recording this camera
                self._pending_clips[camera_id] = {
                    "name": name, "ts": ts, "shape": (h, w),
                    "trigger": dict(trigger),
                    "detections": list(detections),
                    "pre": ring,
                    "post": ([(ts, trigger_jpeg)] if trigger_jpeg else []),
                    "deadline": ts + self.post_buffer_seconds,
                    "hard_deadline": ts + self.max_post_seconds,
                }
            logger.info("[%s] clip recording opened: %s (+%.1fs post)",
                        camera_id, name, self.post_buffer_seconds)
            return None
        frames = ring + ([(ts, trigger_jpeg)] if trigger_jpeg else [])
        return self._write_clip(camera_id, name, ts, (h, w), frames,
                                detections, trigger)

    def _write_clip(self, camera_id: str, name: str, ts: float,
                    shape: Tuple[int, int],
                    frames: List[Tuple[float, bytes]],
                    detections: List[Dict[str, Any]],
                    trigger: Dict[str, Any]) -> Optional[str]:
        h, w = shape
        base = self.output_dir / camera_id
        path = base / f"{name}.mp4"
        try:
            base.mkdir(parents=True, exist_ok=True)
            writer = cv2.VideoWriter(
                str(path), cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h))
            written = 0
            for _, jpeg in frames:
                img = cv2.imdecode(np.frombuffer(jpeg, np.uint8),
                                   cv2.IMREAD_COLOR)
                if img is not None and img.shape[:2] == (h, w):
                    writer.write(img)
                    written += 1
            writer.release()
            self._write_metadata(base / f"{name}.json", camera_id, ts,
                                 detections, trigger, str(path))
            self.clips_saved += 1
            logger.info("[%s] clip saved: %s (%d frames)",
                        camera_id, name, written)
            return str(path)
        except (OSError, cv2.error):
            logger.exception("[%s] clip save failed", camera_id)
            return None

    def _finalize_clip(self, camera_id: str, wait: bool = False) -> None:
        """Hand the finished clip to a writer thread: decoding hundreds of
        JPEGs + mp4 encode must not stall the detection-processing thread
        that called add_frame_to_buffer (the webhook alerter applies the
        same discipline to POSTs)."""
        with self._pending_lock:
            pending = self._pending_clips.pop(camera_id, None)
            if pending is not None:
                self._pending_bytes -= sum(len(d) for _, d in pending["post"])
                self._writer_threads = [t for t in self._writer_threads
                                        if t.is_alive()]
        if pending is None:
            return

        def _write():
            path = self._write_clip(
                camera_id, pending["name"], pending["ts"], pending["shape"],
                pending["pre"] + pending["post"], pending["detections"],
                pending["trigger"])
            if path is not None:
                self._notify(camera_id, pending["trigger"],
                             pending["detections"], path)

        t = threading.Thread(target=_write, daemon=True,
                             name=f"clip-writer-{camera_id}")
        with self._pending_lock:
            self._writer_threads.append(t)
        t.start()
        if wait:
            t.join(timeout=30.0)

    def close(self) -> None:
        """Finalize any clips still recording, wait for writers, stop the
        retention thread (system shutdown)."""
        with self._pending_lock:
            open_cams = list(self._pending_clips)
        for camera_id in open_cams:
            self._finalize_clip(camera_id, wait=True)
        with self._pending_lock:
            writers = list(self._writer_threads)
        for t in writers:
            t.join(timeout=30.0)
        if self._retention_thread is not None:
            self._retention_stop.set()
            self._retention_thread.join(timeout=5.0)
            self._retention_thread = None

    def _write_metadata(self, path: Path, camera_id: str, ts: float,
                        detections, trigger, media_path: str) -> None:
        """Atomic write via temp + rename (reference snapshot_saver.py:433-438)."""
        meta = {
            "camera_id": camera_id,
            "timestamp": ts,
            "datetime": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(ts)),
            "trigger_class": trigger.get("class_name"),
            "trigger_confidence": trigger.get("confidence"),
            "media_path": media_path,
            "detections": [self._clean_detection(d) for d in detections],
        }
        tmp = path.with_suffix(".json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(tmp, path)

    @staticmethod
    def _clean_detection(det: Dict[str, Any]) -> Dict[str, Any]:
        keep = {}
        for key in ("class_id", "class_name", "confidence", "bbox", "species",
                    "species_confidence", "taxonomic_level", "time_of_day"):
            if key in det:
                val = det[key]
                if isinstance(val, (np.floating, np.integer)):
                    val = val.item()
                keep[key] = val
        return keep

    # -- maintenance -------------------------------------------------------------
    def cleanup_old_files(self, max_age_days: float = 30.0,
                          unmasked_max_age_days: Optional[float] = None,
                          ) -> int:
        """Delete products older than max_age_days
        (reference snapshot_saver.py:664-724 — defined there but never
        called; here the retention thread schedules it).

        unmasked_max_age_days: separate (shorter) window for the UNMASKED
        raw/ tree — the privacy retention policy the reference's own best
        practices recommend ("delete unmasked clips after investigation
        period", PRIVACY_MASKING.md) but never implement. Masked/
        annotated/ products and clips keep the default window."""
        now = time.time()
        cutoff = now - max_age_days * 86400
        raw_cutoff = (now - unmasked_max_age_days * 86400
                      if unmasked_max_age_days is not None else cutoff)
        removed = 0
        if not self.output_dir.exists():
            return 0
        for p in self.output_dir.rglob("*"):
            if not p.is_file():
                continue
            limit = raw_cutoff if "raw" in p.parent.parts[-1:] else cutoff
            if p.stat().st_mtime < limit:
                try:
                    p.unlink()
                    removed += 1
                except OSError:
                    pass
        return removed

    # -- scheduled retention -----------------------------------------------------
    def start_retention(self, max_age_days: float = 30.0,
                        unmasked_max_age_days: Optional[float] = None,
                        interval_hours: float = 6.0) -> None:
        """Background thread running cleanup_old_files on a cadence (runs
        once immediately so restarts don't defer an overdue sweep)."""
        if self._retention_thread is not None:
            return
        self._retention_stop.clear()

        def _loop():
            while True:
                removed = self.cleanup_old_files(max_age_days,
                                                 unmasked_max_age_days)
                if removed:
                    logger.info("retention sweep removed %d product(s) "
                                "(default %.1fd, unmasked %s)", removed,
                                max_age_days,
                                f"{unmasked_max_age_days:.1f}d"
                                if unmasked_max_age_days is not None
                                else "same")
                if self._retention_stop.wait(interval_hours * 3600.0):
                    return

        self._retention_thread = threading.Thread(
            target=_loop, name="snapshot-retention", daemon=True)
        self._retention_thread.start()

    def update_settings(self, settings: Dict[str, Any]) -> List[str]:
        """Hot-reload (reference snapshot_saver.py:606-662)."""
        updated = []
        mapping = {
            "enabled": "enabled", "save_mode": "save_mode",
            "min_confidence": "min_confidence",
            "cooldown_seconds": "cooldown_seconds",
            "save_annotated": "save_annotated",
            "clip_duration": "clip_duration",
            "pre_buffer_seconds": "pre_buffer_seconds", "fps": "fps",
            "post_buffer_seconds": "post_buffer_seconds",
            "post_motion_extend": "post_motion_extend",
            "max_post_seconds": "max_post_seconds",
            "dedup_tracks": "dedup_tracks",
        }
        for key, attr in mapping.items():
            if key in settings and getattr(self, attr) != settings[key]:
                setattr(self, attr, settings[key])
                updated.append(key)
        if "trigger_classes" in settings:
            new = set(settings["trigger_classes"] or [])
            if new != self.trigger_classes:
                self.trigger_classes = new
                updated.append("trigger_classes")
        if "alert_zones" in settings:
            new_zones = dict(settings["alert_zones"] or {})
            if new_zones != self.alert_zones:
                self.alert_zones = new_zones
                updated.append("alert_zones")
        return updated

    def get_stats(self) -> Dict[str, Any]:
        with self._buffer_lock:
            buffered = {cam: len(ring) for cam, ring in self._buffers.items()}
            buffer_mb = self._buffer_bytes / 1e6
        return {
            "enabled": self.enabled,
            "save_mode": self.save_mode,
            "snapshots_saved": self.snapshots_saved,
            "clips_saved": self.clips_saved,
            "triggers_suppressed": self.triggers_suppressed,
            "buffered_frames": buffered,
            "buffer_mb": round(buffer_mb, 1),
            "clips_recording": self.clips_recording_now(),
        }

    def clips_recording_now(self) -> List[str]:
        with self._pending_lock:
            return sorted(self._pending_clips)
