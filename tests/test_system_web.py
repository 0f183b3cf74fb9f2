"""Full-system integration: synthetic cameras -> whole pipeline -> web plane.

The hermetic end-to-end test the reference never had (its tests need live
cameras + CUDA; SURVEY §4). Boots TelescopeDetectionSystem from a config with
synthetic cameras and a tiny random-weight model, then exercises REST, the
WebSocket detections stream, and the MJPEG feed over real sockets.
"""
import http.client
import json
import socket
import textwrap
import time

import numpy as np
import pytest

from telescope_cam_detection_tpu.system import TelescopeDetectionSystem
from telescope_cam_detection_tpu.utils import wsproto


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sys")
    port = _free_port()
    cfg = textwrap.dedent(f"""
        cameras:
          - id: cam1
            name: Synth One
            protocol: synthetic
            target_width: 128
            target_height: 128
            fps: 20
            enabled: true
          - id: cam2
            name: Synth Two
            protocol: synthetic
            target_width: 128
            target_height: 128
            fps: 20
            enabled: true
        detection:
          detector_type: yolox
          yolox:
            model_name: yolox-nano
          input_size: [128, 128]
          conf_threshold: 0.0
          nms_threshold: 0.45
          wildlife_only: false
          min_box_area: 0
          max_detections: 10
          use_two_stage: false
          batching:
            enabled: true
            max_batch_size: 4
            max_batch_wait_ms: 30.0
        performance:
          frame_queue_size: 2
          detection_queue_size: 10
          empty_frame_filter:
            enabled: false
          sparse_detection:
            enabled: false
        motion_filter:
          enabled: false
        time_of_day_filter:
          enabled: true
          confidence_penalty: 0.3
        snapshots:
          enabled: true
          save_mode: image
          output_dir: {tmp}/clips
          trigger_classes: []
          min_confidence: 0.99
        web:
          host: 127.0.0.1
          port: {port}
        camera_health:
          enabled: true
          check_interval_seconds: 1
          auto_restart: false
    """)
    cfg_path = tmp / "config.yaml"
    cfg_path.write_text(cfg)

    sys_obj = TelescopeDetectionSystem(str(cfg_path), load_weights=False)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    # shrink the device program for test speed
    sys_obj.start(block=False)
    # wait for the web server socket
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
            conn.request("GET", "/health")
            conn.getresponse().read()
            break
        except OSError:
            time.sleep(0.2)
    yield sys_obj, port
    sys_obj.stop()


def _get(port, path, headers=None, timeout=30):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("GET", path, headers=headers or {})
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp.status, body


def _post(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", path)
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp.status, body


def test_health_endpoint(system):
    _, port = system
    status, body = _get(port, "/health")
    assert status == 200
    data = json.loads(body)
    assert data["status"] in ("healthy", "warning", "critical")
    assert len(data["cameras"]) == 2
    assert "alerts" in data


def test_cameras_and_stats(system):
    _, port = system
    status, body = _get(port, "/cameras")
    assert status == 200
    cams = json.loads(body)["cameras"]
    assert {c["id"] for c in cams} == {"cam1", "cam2"}

    status, body = _get(port, "/stats")
    data = json.loads(body)
    assert "cam1" in data["cameras"] and "cam1" in data["engines"]
    assert data["coordinator"] is not None


def test_clips_list_legacy_redirect(system):
    # reference web_server.py:645-653: /clips_list 307-redirects to /api/clips
    _, port = system
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/clips_list")
    resp = conn.getresponse()
    resp.read()
    conn.close()
    assert resp.status == 307
    assert resp.getheader("Location") == "/api/clips"


def test_video_feed_default_camera(system):
    # reference web_server.py:833-849: bare /video/feed streams the first camera
    _, port = system
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/video/feed")
    resp = conn.getresponse()
    assert resp.status == 200
    assert "multipart/x-mixed-replace" in resp.getheader("Content-Type", "")
    conn.close()


def test_per_camera_routes(system):
    _, port = system
    status, body = _get(port, "/api/cameras/cam1/stats")
    assert status == 200
    data = json.loads(body)
    assert data["camera_id"] == "cam1"
    assert data["capture"]["is_running"]
    status, _ = _get(port, "/api/cameras/nope/stats")
    assert status == 404
    status, body = _get(port, "/api/cameras/cam1/health")
    assert status == 200
    assert json.loads(body)["status"] in (
        "healthy", "degraded", "failed", "restarting")


def test_system_stats_and_health_summary(system):
    _, port = system
    status, body = _get(port, "/api/system/stats")
    data = json.loads(body)
    assert status == 200 and "aggregate_fps" in data
    assert data["clips_recording"] == []  # REC badge source field
    status, body = _get(port, "/api/cameras/health/summary")
    assert status == 200
    assert set(json.loads(body)["cameras"]) == {"cam1", "cam2"}


def test_config_current_redacts_credentials(system):
    sys_obj, port = system
    sys_obj.config["cameras"][0]["password"] = "secret"
    try:
        status, body = _get(port, "/api/config/current")
        assert status == 200
        assert b"secret" not in body
    finally:
        sys_obj.config["cameras"][0].pop("password", None)


def test_config_reload_endpoint(system):
    _, port = system
    status, body = _post(port, "/api/config/reload")
    assert status == 200
    data = json.loads(body)
    assert data["success"] is True
    assert data["requires_restart"] == []


def test_config_reload_applies_and_diffs(system):
    """Edit the config file on disk, reload over HTTP: hot-reloadable keys
    apply; restart-required sections are reported, not applied."""
    sys_obj, port = system
    path = sys_obj.config_path
    original = open(path).read()
    try:
        modified = original.replace("conf_threshold: 0.0",
                                    "conf_threshold: 0.11")
        modified = modified.replace("input_size: [128, 128]",
                                    "input_size: [256, 256]")
        with open(path, "w") as f:
            f.write(modified)
        status, body = _post(port, "/api/config/reload")
        data = json.loads(body)
        assert data["success"] is True
        assert any("conf_threshold" in r for r in data["reloaded"])
        assert "detection.input_size" in data["requires_restart"]
        # engine picked up the new threshold
        assert sys_obj.engines["cam1"].get_settings()["conf_threshold"] == 0.11
    finally:
        with open(path, "w") as f:
            f.write(original)
        _post(port, "/api/config/reload")


def test_config_reload_rejects_invalid(system):
    sys_obj, port = system
    path = sys_obj.config_path
    original = open(path).read()
    try:
        with open(path, "w") as f:
            f.write(original.replace("conf_threshold: 0.0",
                                     "conf_threshold: 7.5"))
        status, body = _post(port, "/api/config/reload")
        data = json.loads(body)
        assert data["success"] is False
        assert any("conf_threshold" in e for e in data["errors"])
        # live config untouched
        assert sys_obj.config["detection"]["conf_threshold"] == 0.0
    finally:
        with open(path, "w") as f:
            f.write(original)


def test_clips_traversal_guard(system):
    _, port = system
    status, _ = _get(port, "/api/clips/../../etc/passwd")
    assert status in (403, 404)
    status, body = _get(port, "/api/clips")
    assert status == 200


def test_detections_flow_and_websocket(system):
    _, port = system
    sock = socket.create_connection(("127.0.0.1", port), timeout=60)
    key = "dGhlIHNhbXBsZSBub25jZQ=="
    sock.sendall((f"GET /ws/detections HTTP/1.1\r\nHost: x\r\n"
                  f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                  f"Sec-WebSocket-Key: {key}\r\n"
                  f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += sock.recv(4096)
    assert b"101" in resp.split(b"\r\n")[0]
    assert wsproto.accept_key(key).encode() in resp

    reader = wsproto.FrameReader(sock.makefile("rb"))
    messages = []
    deadline = time.time() + 90
    while time.time() < deadline and len(messages) < 3:
        frame = reader.read_frame()
        if frame is None:
            break
        opcode, payload = frame
        if opcode == wsproto.OP_TEXT:
            messages.append(json.loads(payload))
    sock.close()
    assert messages, "no websocket messages received"
    types = {m["type"] for m in messages}
    assert types & {"detections", "status", "heartbeat"}
    det_msgs = [m for m in messages if m["type"] == "detections"]
    if det_msgs:  # random weights at conf 0 should produce some
        m = det_msgs[0]
        assert m["camera_id"] in ("cam1", "cam2")
        assert "total_latency_ms" in m
        assert all("bbox" in d for d in m["detections"])


def test_mjpeg_stream(system):
    _, port = system
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/video/feed/cam1")
    resp = conn.getresponse()
    assert resp.status == 200
    assert "multipart/x-mixed-replace" in resp.getheader("Content-Type")
    data = b""
    deadline = time.time() + 30
    while time.time() < deadline and data.count(b"--frame") < 2:
        chunk = resp.read1(65536)
        if not chunk:
            break
        data += chunk
    conn.close()
    assert data.count(b"--frame") >= 2
    assert b"\xff\xd8" in data  # JPEG SOI marker


def test_index_and_static(system):
    _, port = system
    status, body = _get(port, "/")
    assert status == 200 and b"Wildlife Detection" in body
    status, body = _get(port, "/app.js")
    assert status == 200 and b"DetectionApp" in body
    status, _ = _get(port, "/nonexistent")
    assert status == 404


def test_profiler_cpu_endpoint(system):
    _, port = system
    status, body = _get(port, "/api/profiler/cpu?seconds=0.3&top=5",
                        timeout=60)
    assert status == 200
    data = json.loads(body)
    assert data["success"] is True
    assert data["samples"] > 10
    assert isinstance(data["own"], list) and isinstance(data["total"], list)
    assert len(data["own"]) <= 5


def test_profiler_trace_endpoint(system, tmp_path):
    sys_obj, port = system
    # client-supplied dir is IGNORED: traces land in the server-side path
    sys_obj.web_server.trace_dir = tmp_path / "server_traces"
    # The trace round-trips the relay-backed device; under full-suite load
    # on this 1-core host it can exceed the default client timeout.
    status, body = _get(port,
                        f"/api/profiler/trace?seconds=0.2&dir={tmp_path}/evil",
                        timeout=180)
    assert status == 200
    data = json.loads(body)
    assert data["success"] is True
    import pathlib
    assert data["trace_dir"] == str(tmp_path / "server_traces")
    assert not (tmp_path / "evil").exists()
    assert any(pathlib.Path(data["trace_dir"]).rglob("*"))  # trace files exist


@pytest.mark.slow  # captures a real jax.profiler trace (~35s on 1 core)
def test_profiler_trace_requires_token_when_set(system, monkeypatch):
    _, port = system
    monkeypatch.setenv("TELESCOPE_CLIPS_TOKEN", "sekrit")
    status, _ = _get(port, "/api/profiler/trace?seconds=0.1")
    assert status == 401
    status, _ = _get(port, "/api/profiler/trace?seconds=0.1",
                     headers={"Authorization": "Bearer sekrit"},
                     timeout=180)
    assert status == 200


def test_camera_restart_endpoint(system):
    sys_obj, port = system
    status, body = _post(port, "/api/cameras/cam2/restart")
    assert status == 200
    data = json.loads(body)
    assert data["success"] is True
    # pipeline is functional after restart
    assert sys_obj.captures["cam2"].get_stats()["is_running"]


def test_prometheus_metrics_endpoint(system):
    _, port = system
    status, body = _get(port, "/metrics")
    assert status == 200
    text = body.decode()
    assert "# TYPE tcd_camera_fps gauge" in text
    assert 'tcd_camera_connected{camera="cam1"}' in text
    assert "tcd_uptime_seconds" in text
    assert "tcd_coordinator_frames_total" in text
    # every sample line parses as `name{labels} value` with a numeric value
    for line in text.strip().splitlines():
        if line.startswith("#"):
            continue
        float(line.rsplit(" ", 1)[1])


def test_stats_history_endpoint(system):
    _, port = system
    status, body = _get(port, "/api/system/stats/history")
    assert status == 200
    data = json.loads(body)
    assert data["interval_seconds"] > 0
    samples = data["samples"]
    assert len(samples) >= 1  # first sample lands at server start
    s = samples[-1]
    assert {"t", "fps", "cameras", "queue"} <= set(s)
    assert "cam1" in s["cameras"] and "cam2" in s["cameras"]
    # minutes filter: everything is recent, so a wide window keeps all
    # (the ring may gain samples between requests, never lose them)
    status, body = _get(port, "/api/system/stats/history?minutes=60")
    assert len(json.loads(body)["samples"]) >= len(samples)
    # ... and a zero-width window drops them (tolerate a sample landing in
    # the same 100 ms as the request: t rounds to 0.1 s)
    status, body = _get(port, "/api/system/stats/history?minutes=0.000001")
    assert len(json.loads(body)["samples"]) <= 1
    # malformed minutes falls back to the full ring
    status, body = _get(port, "/api/system/stats/history?minutes=bogus")
    assert status == 200 and len(json.loads(body)["samples"]) >= 1


def test_zone_editor_endpoints(system):
    sys_obj, port = system
    # initially: all cameras present, no live zones
    status, body = _get(port, "/api/zones")
    assert status == 200
    zones = json.loads(body)["zones"]
    assert set(zones) == {"cam1", "cam2"}

    # set zones for cam1
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    payload = json.dumps({"camera_id": "cam1", "zones": [
        {"name": "gate", "points": [[10, 10], [100, 10], [100, 100]]},
        {"name": "bad", "points": [[1, 1]]},          # < 3 points: dropped
    ]})
    conn.request("POST", "/api/zones", body=payload,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    assert resp.status == 200 and data["success"], data
    assert [z["name"] for z in data["zones"]] == ["gate"]

    # live detector attached to the processor and visible via GET
    assert sys_obj.processors["cam1"].collision_detector is not None
    _, body = _get(port, "/api/zones")
    assert json.loads(body)["zones"]["cam1"][0]["name"] == "gate"

    # clearing removes the detector
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/api/zones",
                 body=json.dumps({"camera_id": "cam1", "zones": []}),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse(); resp.read(); conn.close()
    assert sys_obj.processors["cam1"].collision_detector is None

    # unknown camera -> 404; malformed body -> 400
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/api/zones",
                 body=json.dumps({"camera_id": "nope",
                                  "zones": [{"name": "z",
                                             "points": [[0, 0], [1, 0],
                                                        [1, 1]]}]}),
                 headers={"Content-Type": "application/json"})
    assert conn.getresponse().status == 404
    conn.close()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/api/zones", body="{}",
                 headers={"Content-Type": "application/json"})
    assert conn.getresponse().status == 400
    conn.close()


def test_reload_reports_compiled_keys_as_restart_required(system):
    """Keys baked into the compiled program/coordinator (transfer mode,
    delta knobs, batching) must surface in requires_restart, not vanish
    into a 'successful' no-op reload."""
    sys_obj, port = system
    path = sys_obj.config_path
    original = open(path).read()
    try:
        modified = original.replace(
            "detection:",
            "detection:\n  transfer: delta\n  readback_topk: 32", 1)
        modified = modified.replace("max_batch_size: 4", "max_batch_size: 2")
        # classifier precision is baked into the model build (quantized
        # matmul graph), so flipping it must demand a restart too
        modified += ("\nspecies_classification:\n  inat_classifier:\n"
                     "    precision: int8\n")
        with open(path, "w") as f:
            f.write(modified)
        status, body = _post(port, "/api/config/reload")
        data = json.loads(body)
        assert data["success"] is True
        need = set(data["requires_restart"])
        assert "detection.transfer" in need
        assert "detection.readback_topk" in need
        assert "detection.batching" in need
        assert "species_classification.inat_classifier.precision" in need
    finally:
        with open(path, "w") as f:
            f.write(original)
        _post(port, "/api/config/reload")


def test_zone_editor_sanitizes_names_and_caps(system):
    sys_obj, port = system
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/api/zones", body=json.dumps({
        "camera_id": "cam2",
        "zones": [{"name": "<script>alert(1)</script> gate!",
                   "points": [[0, 0], [50, 0], [50, 50]]}]}),
        headers={"Content-Type": "application/json"})
    data = json.loads(conn.getresponse().read()); conn.close()
    assert data["success"]
    name = data["zones"][0]["name"]
    assert "<" not in name and ">" not in name and "!" not in name
    assert "gate" in name
    # caps: too many zones / too many points are rejected outright
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/api/zones", body=json.dumps({
        "camera_id": "cam2",
        "zones": [{"name": f"z{i}", "points": [[0, 0], [1, 0], [1, 1]]}
                  for i in range(65)]}),
        headers={"Content-Type": "application/json"})
    data = json.loads(conn.getresponse().read()); conn.close()
    assert not data["success"] and "too many zones" in data["error"]
    # NaN/Infinity coordinates are rejected (python json accepts the tokens;
    # they would poison strict JSON.parse clients on every later GET)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/api/zones", body=json.dumps({
        "camera_id": "cam2",
        "zones": [{"name": "bad", "points": [[float("nan"), 0], [50, 0],
                                             [50, 50]]}]}),
        headers={"Content-Type": "application/json"})
    data = json.loads(conn.getresponse().read()); conn.close()
    assert not data["success"] and "non-finite" in data["error"]
    # cleanup
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/api/zones",
                 body=json.dumps({"camera_id": "cam2", "zones": []}),
                 headers={"Content-Type": "application/json"})
    conn.getresponse().read(); conn.close()


def test_reload_camera_overrides_hot_not_restart(system):
    """Changing only a camera's detection_overrides (e.g. adding
    class_size_constraints) hot-reloads through the engines; it must NOT be
    reported as a cameras restart (the reference only flags id/ip/count
    changes, main.py:608-617)."""
    sys_obj, port = system
    path = sys_obj.config_path
    original = open(path).read()
    try:
        modified = original.replace(
            "  - id: cam1\n",
            "  - id: cam1\n"
            "    detection_overrides:\n"
            "      class_size_constraints:\n"
            "        bird:\n"
            "          max: 6000\n")
        with open(path, "w") as f:
            f.write(modified)
        status, body = _post(port, "/api/config/reload")
        data = json.loads(body)
        assert data["success"] is True
        assert any("class_size_constraints" in r for r in data["reloaded"])
        assert "cameras" not in data["requires_restart"]
        s = sys_obj.engines["cam1"].get_settings()
        assert s["class_size_constraints"] == {"bird": {"max": 6000}}
    finally:
        with open(path, "w") as f:
            f.write(original)
        _post(port, "/api/config/reload")
