"""External stream watchdog: journald-native freshness source.

Reference scripts/stream_watchdog.py:66-118 greps journalctl text output for
camera activity markers; this build reads the JSON export (exact
__REALTIME_TIMESTAMP, no year-boundary patching) keyed on the per-camera
"[camera_id] ..." log prefix, fed by the capture heartbeat
(runtime/capture.py CAPTURE_HEARTBEAT_SECONDS).
"""
import json
import logging
import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import stream_watchdog as wd  # noqa: E402

from telescope_cam_detection_tpu import constants as C  # noqa: E402
from telescope_cam_detection_tpu.runtime.capture import (  # noqa: E402
    SyntheticStreamCapture)


def _journal(lines):
    """Fake subprocess.run returning the given journal records."""
    out = "\n".join(json.dumps(rec) for rec in lines)

    def run(cmd, capture_output=True, text=True, timeout=10):
        assert cmd[0] == "journalctl" and "-o" in cmd
        return types.SimpleNamespace(returncode=0, stdout=out, stderr="")

    return run


def _rec(cam, ts_s, msg="capture alive: 120 frames, 2.0 fps"):
    return {"MESSAGE": f"[{cam}] {msg}",
            "__REALTIME_TIMESTAMP": str(int(ts_s * 1e6))}


def test_journald_last_activity_per_camera():
    run = _journal([
        _rec("cam1", 1000.0),
        _rec("cam2", 1010.0),
        _rec("cam1", 1050.0),                      # newer wins
        {"MESSAGE": "no bracket marker here",
         "__REALTIME_TIMESTAMP": "2000000000"},    # ignored
        {"MESSAGE": "[cam3] reconnecting after 3 failures",
         "__REALTIME_TIMESTAMP": str(int(1040.0 * 1e6))},
        {"MESSAGE": "[] empty id", "__REALTIME_TIMESTAMP": "1"},  # ignored
        {"garbage": True},                          # no MESSAGE: ignored
        # the REAL app log format: asctime/level/logger prefix BEFORE the
        # camera marker (main.py logging format) — must still parse
        {"MESSAGE": "2026-08-16 10:00:00,123 INFO "
                    "telescope_cam_detection_tpu.runtime.capture: "
                    "[cam4] capture alive: 120 frames, 2.0 fps",
         "__REALTIME_TIMESTAMP": str(int(1060.0 * 1e6))},
    ])
    last = wd.journald_last_activity("svc", _run=run)
    assert last == {"cam1": pytest.approx(1050.0),
                    "cam2": pytest.approx(1010.0),
                    "cam3": pytest.approx(1040.0),
                    "cam4": pytest.approx(1060.0)}


def test_journald_last_activity_unreadable():
    def bad_run(cmd, capture_output=True, text=True, timeout=10):
        return types.SimpleNamespace(returncode=1, stdout="", stderr="denied")
    assert wd.journald_last_activity("svc", _run=bad_run) is None

    def raising_run(cmd, **kw):
        raise OSError("no journalctl")
    assert wd.journald_last_activity("svc", _run=raising_run) is None


def test_journald_skips_malformed_json():
    def run(cmd, capture_output=True, text=True, timeout=10):
        out = "{not json}\n" + json.dumps(_rec("cam1", 500.0))
        return types.SimpleNamespace(returncode=0, stdout=out, stderr="")
    assert wd.journald_last_activity("svc", _run=run) == {
        "cam1": pytest.approx(500.0)}


def test_capture_heartbeat_log(caplog, monkeypatch):
    from queue import Queue
    cap = SyntheticStreamCapture(Queue(maxsize=4), camera_id="camX",
                                 width=64, height=48)
    cap._heartbeat_t = 0.0  # force the interval to have elapsed
    frame = np.zeros((48, 64, 3), np.uint8)
    with caplog.at_level(logging.INFO,
                         logger="telescope_cam_detection_tpu.runtime.capture"):
        cap._emit(frame)
    msgs = [r.getMessage() for r in caplog.records]
    assert any(m.startswith("[camX] capture alive:") for m in msgs), msgs
    # next emit within the interval stays quiet
    caplog.clear()
    with caplog.at_level(logging.INFO,
                         logger="telescope_cam_detection_tpu.runtime.capture"):
        cap._emit(frame)
    assert not any("capture alive" in r.getMessage()
                   for r in caplog.records)
