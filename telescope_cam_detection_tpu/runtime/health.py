"""Camera health monitoring and auto-restart.

Counterpart of reference ``src/camera_health_monitor.py:40-528``: a monitor
thread samples each capture's stats, computes a composite 0-100 health score,
classifies healthy/degraded/failed/restarting, and triggers the system's
restart callback with exponential backoff and attempt caps.
"""
from __future__ import annotations

import logging
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

logger = logging.getLogger(__name__)

STATUS_HEALTHY = "healthy"
STATUS_DEGRADED = "degraded"
STATUS_FAILED = "failed"
STATUS_RESTARTING = "restarting"


@dataclass
class CameraHealthMetrics:
    camera_id: str
    connected: bool = False
    fps: float = 0.0
    last_frame_age: float = float("inf")
    consecutive_errors: int = 0
    restart_attempts: int = 0
    last_restart_time: float = 0.0
    status: str = STATUS_HEALTHY
    health_score: float = 100.0
    issues: List[str] = field(default_factory=list)
    # one restart_exhausted alert per failure episode (reset on recovery)
    restart_exhausted_alerted: bool = False


class CameraHealthMonitor:
    def __init__(
        self,
        captures: Dict[str, Any],
        restart_callback: Optional[Callable[[str], bool]] = None,
        check_interval_seconds: float = 10.0,
        min_fps: float = 5.0,
        max_frame_age_seconds: float = 30.0,
        max_consecutive_errors: int = 5,
        auto_restart: bool = True,
        max_restart_attempts: int = 10,
        restart_cooldown_seconds: float = 300.0,
        backoff_multiplier: float = 2.0,
        initial_backoff_seconds: float = 5.0,
        enabled: bool = True,
        alert_callback: Optional[Callable[[Dict[str, Any]], None]] = None,
    ):
        self.captures = captures
        self.restart_callback = restart_callback
        self.check_interval = check_interval_seconds
        self.min_fps = min_fps
        self.max_frame_age = max_frame_age_seconds
        self.max_consecutive_errors = max_consecutive_errors
        self.auto_restart = auto_restart
        self.max_restart_attempts = max_restart_attempts
        self.restart_cooldown = restart_cooldown_seconds
        self.backoff_multiplier = backoff_multiplier
        self.initial_backoff = initial_backoff_seconds
        self.enabled = enabled
        # alert hooks — the reference declares these but ships TODO stubs
        # (camera_health_monitor.py alert-hook block); here they are real:
        # called with a structured event dict on every status TRANSITION
        # and restart outcome. Must be non-blocking (WebhookAlerter queues).
        self.alert_callback = alert_callback

        self._metrics: Dict[str, CameraHealthMetrics] = {
            cid: CameraHealthMetrics(cid) for cid in captures}
        self._metrics_lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._running = threading.Event()
        self.total_restarts = 0

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> None:
        if not self.enabled or (self._thread and self._thread.is_alive()):
            return
        self._running.set()
        self._thread = threading.Thread(target=self._loop,
                                        name="health-monitor", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running.clear()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    # -- monitoring ------------------------------------------------------------
    def _loop(self) -> None:
        while self._running.is_set():
            try:
                for cam_id in list(self.captures):
                    self._check_camera(cam_id)
            except Exception:
                logger.exception("health check failed")
            # interruptible sleep
            end = time.time() + self.check_interval
            while self._running.is_set() and time.time() < end:
                time.sleep(0.2)

    def _check_camera(self, cam_id: str) -> None:
        cap = self.captures.get(cam_id)
        if cap is None:
            return
        stats = cap.get_stats()
        now = time.time()
        with self._metrics_lock:
            m = self._metrics.setdefault(cam_id, CameraHealthMetrics(cam_id))
            m.connected = stats.get("connected", False)
            m.fps = stats.get("fps", 0.0)
            last = stats.get("last_frame_time", 0.0)
            m.last_frame_age = now - last if last else float("inf")
            m.consecutive_errors = stats.get("consecutive_failures", 0)
            m.issues = []
            score = 100.0
            if not m.connected:
                m.issues.append("disconnected")
                score -= 50
            if m.fps < self.min_fps:
                m.issues.append(f"low fps ({m.fps:.1f})")
                score -= 20
            if m.last_frame_age > self.max_frame_age:
                m.issues.append(f"stale frames ({m.last_frame_age:.0f}s)")
                score -= 20
            if m.consecutive_errors >= self.max_consecutive_errors:
                m.issues.append(f"{m.consecutive_errors} consecutive errors")
                score -= 10
            m.health_score = max(score, 0.0)
            prev_status = m.status
            if m.status != STATUS_RESTARTING:
                if m.health_score >= 80 and not m.issues:
                    m.status = STATUS_HEALTHY
                    if now - m.last_restart_time > self.restart_cooldown:
                        m.restart_attempts = 0  # cooldown resets the counter
                elif m.health_score >= 50:
                    m.status = STATUS_DEGRADED
                else:
                    m.status = STATUS_FAILED
            should_restart = (self.auto_restart
                              and m.status == STATUS_FAILED
                              and m.restart_attempts < self.max_restart_attempts)
            exhausted = (m.status == STATUS_FAILED
                         and m.restart_attempts >= self.max_restart_attempts)
            event = None
            if m.status != prev_status:
                event = self._event("status_change", m,
                                    prev_status=prev_status)
            elif exhausted and not m.restart_exhausted_alerted:
                m.restart_exhausted_alerted = True
                event = self._event("restart_exhausted", m)
            if m.status == STATUS_HEALTHY:
                m.restart_exhausted_alerted = False
        if event is not None:
            self._alert(event)
        if should_restart:
            self._attempt_restart(cam_id)

    def _backoff_delay(self, attempts: int) -> float:
        return self.initial_backoff * (self.backoff_multiplier ** attempts)

    # -- alert hooks ------------------------------------------------------------
    @staticmethod
    def _event(kind: str, m: CameraHealthMetrics, **extra) -> Dict[str, Any]:
        ev = {
            "event": kind,
            "camera_id": m.camera_id,
            "status": m.status,
            "health_score": m.health_score,
            "issues": list(m.issues),
            "restart_attempts": m.restart_attempts,
            "timestamp": time.time(),
        }
        ev.update(extra)
        return ev

    def _alert(self, event: Dict[str, Any]) -> None:
        if self.alert_callback is None:
            return
        try:
            self.alert_callback(event)
        except Exception:
            logger.exception("alert callback failed (%s)", event.get("event"))

    def _attempt_restart(self, cam_id: str) -> None:
        with self._metrics_lock:
            m = self._metrics[cam_id]
            delay = self._backoff_delay(m.restart_attempts)
            m.status = STATUS_RESTARTING
            m.restart_attempts += 1
            m.last_restart_time = time.time()
        logger.warning("[%s] unhealthy; restarting after %.0fs backoff "
                       "(attempt %d/%d)", cam_id, delay,
                       m.restart_attempts, self.max_restart_attempts)
        end = time.time() + delay
        while self._running.is_set() and time.time() < end:
            time.sleep(0.2)
        ok = False
        if self.restart_callback is not None and self._running.is_set():
            try:
                ok = bool(self.restart_callback(cam_id))
            except Exception:
                logger.exception("[%s] restart callback failed", cam_id)
        with self._metrics_lock:
            m = self._metrics[cam_id]
            m.status = STATUS_HEALTHY if ok else STATUS_FAILED
            event = self._event(
                "restart_success" if ok else "restart_failed", m)
        self._alert(event)
        if ok:
            self.total_restarts += 1
            logger.info("[%s] restart successful", cam_id)

    # -- reporting ---------------------------------------------------------------
    def get_health_summary(self) -> Dict[str, Any]:
        with self._metrics_lock:
            cameras = {
                cid: {
                    "status": m.status,
                    "health_score": m.health_score,
                    "connected": m.connected,
                    "fps": m.fps,
                    "last_frame_age": (None if m.last_frame_age == float("inf")
                                       else round(m.last_frame_age, 1)),
                    "restart_attempts": m.restart_attempts,
                    "issues": list(m.issues),
                }
                for cid, m in self._metrics.items()
            }
        statuses = [c["status"] for c in cameras.values()]
        overall = STATUS_HEALTHY
        if any(s == STATUS_FAILED for s in statuses):
            overall = STATUS_FAILED
        elif any(s in (STATUS_DEGRADED, STATUS_RESTARTING) for s in statuses):
            overall = STATUS_DEGRADED
        return {"overall": overall, "cameras": cameras,
                "total_restarts": self.total_restarts}
