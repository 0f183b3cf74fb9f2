"""Camera health monitor: scoring, status transitions, auto-restart with
backoff (reference camera_health_monitor.py semantics)."""
import time

import pytest

from telescope_cam_detection_tpu.runtime.health import (
    STATUS_DEGRADED,
    STATUS_FAILED,
    STATUS_HEALTHY,
    CameraHealthMonitor,
)


class FakeCapture:
    def __init__(self, connected=True, fps=30.0, fresh=True, errors=0):
        self.connected = connected
        self.fps = fps
        self.fresh = fresh
        self.errors = errors

    def get_stats(self):
        return {
            "connected": self.connected,
            "fps": self.fps,
            "last_frame_time": time.time() if self.fresh else time.time() - 999,
            "consecutive_failures": self.errors,
        }


def test_healthy_camera_scores_100():
    cap = FakeCapture()
    mon = CameraHealthMonitor({"cam1": cap}, enabled=True)
    mon._check_camera("cam1")
    summary = mon.get_health_summary()
    assert summary["overall"] == STATUS_HEALTHY
    assert summary["cameras"]["cam1"]["health_score"] == 100.0
    assert summary["cameras"]["cam1"]["issues"] == []


def test_degraded_and_failed_classification():
    low_fps = FakeCapture(fps=1.0)
    mon = CameraHealthMonitor({"cam1": low_fps}, auto_restart=False)
    mon._check_camera("cam1")
    assert mon.get_health_summary()["cameras"]["cam1"]["status"] == STATUS_DEGRADED

    dead = FakeCapture(connected=False, fps=0.0, fresh=False)
    mon2 = CameraHealthMonitor({"cam1": dead}, auto_restart=False)
    mon2._check_camera("cam1")
    cam = mon2.get_health_summary()["cameras"]["cam1"]
    assert cam["status"] == STATUS_FAILED
    assert "disconnected" in cam["issues"]
    assert mon2.get_health_summary()["overall"] == STATUS_FAILED


def test_auto_restart_invoked_with_backoff():
    dead = FakeCapture(connected=False, fps=0.0, fresh=False)
    restarts = []

    def restart(cam_id):
        restarts.append(cam_id)
        dead.connected = True
        dead.fps = 30.0
        dead.fresh = True
        return True

    mon = CameraHealthMonitor({"cam1": dead}, restart_callback=restart,
                              auto_restart=True, initial_backoff_seconds=0.05,
                              check_interval_seconds=0.1)
    mon._running.set()
    mon._check_camera("cam1")  # triggers restart (with tiny backoff)
    mon._running.clear()
    assert restarts == ["cam1"]
    assert mon.total_restarts == 1
    mon._check_camera("cam1")  # now healthy again
    assert mon.get_health_summary()["cameras"]["cam1"]["status"] == STATUS_HEALTHY


def test_restart_attempt_cap():
    dead = FakeCapture(connected=False, fps=0.0, fresh=False)
    restarts = []

    def restart(cam_id):
        restarts.append(cam_id)
        return False  # never recovers

    mon = CameraHealthMonitor({"cam1": dead}, restart_callback=restart,
                              auto_restart=True, max_restart_attempts=2,
                              initial_backoff_seconds=0.01)
    mon._running.set()
    for _ in range(5):
        mon._check_camera("cam1")
    mon._running.clear()
    assert len(restarts) == 2  # capped
    assert mon.get_health_summary()["cameras"]["cam1"]["restart_attempts"] == 2


def test_backoff_delay_exponential():
    mon = CameraHealthMonitor({}, initial_backoff_seconds=5,
                              backoff_multiplier=2)
    assert mon._backoff_delay(0) == 5
    assert mon._backoff_delay(1) == 10
    assert mon._backoff_delay(3) == 40
