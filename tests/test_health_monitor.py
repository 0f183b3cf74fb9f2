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


# -- alert hooks (the reference declares these as TODO stubs; ours are real) --

def test_alert_on_status_transitions_and_restart_outcome():
    dead = FakeCapture(connected=False, fps=0.0, fresh=False)
    events = []

    def restart(cam_id):
        dead.connected = True
        dead.fps = 30.0
        dead.fresh = True
        return True

    mon = CameraHealthMonitor({"cam1": dead}, restart_callback=restart,
                              auto_restart=True,
                              initial_backoff_seconds=0.01,
                              alert_callback=events.append)
    mon._running.set()
    mon._check_camera("cam1")   # healthy -> failed, restart succeeds
    mon._check_camera("cam1")   # healthy again: no new event
    mon._running.clear()
    kinds = [e["event"] for e in events]
    assert kinds == ["status_change", "restart_success"]
    assert events[0]["prev_status"] == STATUS_HEALTHY
    assert events[0]["status"] == STATUS_FAILED
    assert events[0]["camera_id"] == "cam1"
    assert "disconnected" in events[0]["issues"]
    assert events[1]["status"] == STATUS_HEALTHY


def test_alert_restart_exhausted_fires_once_per_episode():
    dead = FakeCapture(connected=False, fps=0.0, fresh=False)
    events = []
    mon = CameraHealthMonitor({"cam1": dead},
                              restart_callback=lambda cid: False,
                              auto_restart=True, max_restart_attempts=1,
                              initial_backoff_seconds=0.01,
                              alert_callback=events.append)
    mon._running.set()
    for _ in range(4):
        mon._check_camera("cam1")
    mon._running.clear()
    kinds = [e["event"] for e in events]
    # failed once, one failed restart, then exhausted exactly ONCE
    assert kinds == ["status_change", "restart_failed", "restart_exhausted"]


def test_alert_callback_failure_never_breaks_monitoring():
    dead = FakeCapture(connected=False, fps=0.0, fresh=False)

    def bad_callback(event):
        raise RuntimeError("alert sink down")

    mon = CameraHealthMonitor({"cam1": dead}, auto_restart=False,
                              alert_callback=bad_callback)
    mon._check_camera("cam1")  # must not raise
    assert mon.get_health_summary()["cameras"]["cam1"]["status"] == STATUS_FAILED


def test_webhook_alerter_posts_and_rate_limits():
    import http.server
    import json as json_mod
    import threading

    from telescope_cam_detection_tpu.utils.alerts import WebhookAlerter

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append(json_mod.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/hook"
        alerter = WebhookAlerter(url, min_interval_seconds=60.0,
                                 timeout_seconds=5.0)
        alerter.start()
        ev = {"event": "status_change", "camera_id": "cam1",
              "status": STATUS_FAILED}
        alerter(ev)
        alerter(ev)   # same camera+event inside the window: rate-limited
        alerter({"event": "restart_failed", "camera_id": "cam1"})
        deadline = time.time() + 10
        while len(received) < 2 and time.time() < deadline:
            time.sleep(0.05)
        alerter.stop()
        assert [r["event"] for r in received] == ["status_change",
                                                 "restart_failed"]
        assert alerter.stats["sent"] == 2
        assert alerter.stats["rate_limited"] == 1
    finally:
        srv.shutdown()


def test_webhook_alerter_rejects_non_http_url():
    from telescope_cam_detection_tpu.utils.alerts import (
        WebhookAlerter, build_alerter)
    with pytest.raises(ValueError):
        WebhookAlerter("file:///etc/passwd")
    assert build_alerter(None) is None
    assert build_alerter({}) is None
