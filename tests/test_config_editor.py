"""Web config editor (the reference's planned Web UI Config Editor,
docs/features/HOT_RELOAD_CONFIG.md Issue #81): /api/config/file (raw YAML,
token-gated), /api/config/validate (dry run + diff viewer), and
/api/config/save (atomic write + hot reload). Unit tests cover the
diff/preview/save semantics on TelescopeDetectionSystem; route tests run a
real WebServer over sockets.
"""
import http.client
import json
import socket
import textwrap
import time

import pytest

from telescope_cam_detection_tpu.system import (
    TelescopeDetectionSystem, _diff_configs)


# --------------------------------------------------------------------- diff

def test_diff_scalar_added_removed():
    old = {"detection": {"conf_threshold": 0.3, "gone": 1}}
    new = {"detection": {"conf_threshold": 0.5, "fresh": 2}}
    changes = {c["key"]: c for c in _diff_configs(old, new)}
    assert changes["detection.conf_threshold"]["change"] == "changed"
    assert changes["detection.conf_threshold"]["old"] == 0.3
    assert changes["detection.fresh"]["change"] == "added"
    assert changes["detection.gone"]["change"] == "removed"


def test_diff_lists_by_index():
    old = {"cameras": [{"id": "a"}, {"id": "b"}]}
    new = {"cameras": [{"id": "a"}, {"id": "c"}, {"id": "d"}]}
    keys = {c["key"] for c in _diff_configs(old, new)}
    assert keys == {"cameras[1].id", "cameras[2]"}


def test_diff_redacts_credentials():
    old = {"cameras": [{"id": "a", "password": "hunter2"}]}
    new = {"cameras": [{"id": "a", "password": "hunter3", "username": "u"}]}
    changes = {c["key"]: c for c in _diff_configs(old, new)}
    pw = changes["cameras[0].password"]
    assert pw["change"] == "changed"  # the CHANGE is visible...
    assert "hunter" not in json.dumps(changes)  # ...the values never are
    assert changes["cameras[0].username"]["new"] == "***"


# ------------------------------------------------------------ system methods

def _write_cfg(path, conf=0.3):
    path.write_text(_cfg_text(conf))


def _cfg_text(conf=0.3):
    return textwrap.dedent(f"""
        cameras:
          - id: cam1
            protocol: synthetic
            target_width: 64
            target_height: 64
            enabled: true
        detection:
          detector_type: yolox
          yolox: {{model_name: yolox-nano}}
          input_size: [64, 64]
          conf_threshold: {conf}
          use_two_stage: false
          batching: {{enabled: true, max_batch_size: 2}}
        web: {{host: 127.0.0.1, port: 18995}}
        snapshots: {{enabled: false}}
    """)


@pytest.fixture()
def system(tmp_path):
    cfg = tmp_path / "config.yaml"
    _write_cfg(cfg)
    sys_obj = TelescopeDetectionSystem(str(cfg), load_weights=False)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    yield sys_obj, cfg
    sys_obj.stop()


def test_preview_reports_diff_without_applying(system):
    sys_obj, cfg = system
    res = sys_obj.preview_config(_cfg_text(conf=0.9))
    assert res["valid"] is True and not res["errors"]
    assert any(c["key"] == "detection.conf_threshold" and c["new"] == 0.9
               for c in res["changes"])
    # dry run: nothing applied
    assert sys_obj.config["detection"]["conf_threshold"] == 0.3
    assert "conf_threshold: 0.3" in cfg.read_text()


def test_preview_rejects_bad_yaml_and_bad_values(system):
    sys_obj, _ = system
    res = sys_obj.preview_config("a: {unclosed\n")
    assert res["valid"] is False and "YAML parse error" in res["errors"][0]
    res = sys_obj.preview_config("- just\n- a\n- list\n")
    assert res["valid"] is False
    res = sys_obj.preview_config(_cfg_text(conf=7.0))
    assert res["valid"] is False
    assert any("conf_threshold" in e for e in res["errors"])


def test_save_applies_and_rewrites_file(system):
    sys_obj, cfg = system
    res = sys_obj.save_config(_cfg_text(conf=0.7))
    assert res["success"] is True and res["saved"] is True
    assert sys_obj.config["detection"]["conf_threshold"] == 0.7
    assert "conf_threshold: 0.7" in cfg.read_text()
    assert sys_obj.engines["cam1"].get_settings()["conf_threshold"] == 0.7
    assert any(c["key"] == "detection.conf_threshold"
               for c in res["changes"])


def test_save_rejected_leaves_file_untouched(system):
    sys_obj, cfg = system
    before = cfg.read_text()
    res = sys_obj.save_config(_cfg_text(conf=9.0))
    assert res["success"] is False and res["saved"] is False
    assert cfg.read_text() == before
    assert sys_obj.config["detection"]["conf_threshold"] == 0.3


# ------------------------------------------------------------------- routes

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture()
def served_system(tmp_path, monkeypatch):
    monkeypatch.setenv("TELESCOPE_CLIPS_TOKEN", "sekrit")
    port = _free_port()
    cfg = tmp_path / "config.yaml"
    cfg.write_text(_cfg_text().replace("port: 18995", f"port: {port}"))
    sys_obj = TelescopeDetectionSystem(str(cfg), load_weights=False)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    sys_obj.web_server.start()
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
            conn.request("GET", "/health")
            conn.getresponse().read()
            break
        except OSError:
            time.sleep(0.2)
    yield sys_obj, cfg, port
    sys_obj.web_server.stop()
    sys_obj.stop()


def _req(port, method, path, body=None, token=None):
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None,
                 headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, (json.loads(data) if data else {})


def test_editor_routes_require_token(served_system):
    _, _, port = served_system
    assert _req(port, "GET", "/api/config/file")[0] == 401
    assert _req(port, "POST", "/api/config/validate",
                {"text": "a: 1"})[0] == 401
    assert _req(port, "POST", "/api/config/save", {"text": "a: 1"})[0] == 401


def test_editor_full_cycle_over_http(served_system):
    sys_obj, cfg, port = served_system
    status, got = _req(port, "GET", "/api/config/file", token="sekrit")
    assert status == 200 and "conf_threshold: 0.3" in got["text"]

    proposed = got["text"].replace("conf_threshold: 0.3",
                                   "conf_threshold: 0.45")
    status, res = _req(port, "POST", "/api/config/validate",
                       {"text": proposed}, token="sekrit")
    assert status == 200 and res["valid"] is True
    assert any(c["key"] == "detection.conf_threshold"
               for c in res["changes"])
    # validate is a dry run
    assert sys_obj.config["detection"]["conf_threshold"] == 0.3

    status, res = _req(port, "POST", "/api/config/save",
                       {"text": proposed}, token="sekrit")
    assert status == 200 and res["success"] is True
    assert sys_obj.config["detection"]["conf_threshold"] == 0.45
    assert "conf_threshold: 0.45" in cfg.read_text()

    status, res = _req(port, "POST", "/api/config/save",
                       {"text": "cameras: 5"}, token="sekrit")
    assert status == 422 and res["success"] is False
    assert "conf_threshold: 0.45" in cfg.read_text()  # file untouched


def test_admin_token_stricter_than_clips(monkeypatch):
    """No configured token: clips stay public-with-warning (reference
    posture) but the editor — which can rewrite config.yaml and read
    inline credentials — must refuse."""
    from telescope_cam_detection_tpu.server.web import WebServer
    monkeypatch.delenv("TELESCOPE_CLIPS_TOKEN", raising=False)
    ws = WebServer()
    assert ws.verify_clips_token(None) is True
    assert ws.verify_admin_token(None) is False
    assert ws.verify_admin_token("Bearer anything") is False
    monkeypatch.setenv("TELESCOPE_CLIPS_TOKEN", "t0k")
    assert ws.verify_admin_token("Bearer t0k") is True
    assert ws.verify_admin_token("Bearer wrong") is False


def test_save_rolls_back_file_on_reload_rejection(tmp_path):
    """A config that passes static validation but is rejected at the
    reload stage (bad weights path) must not persist: the previous
    config.yaml is restored so the next restart still boots."""
    cfg = tmp_path / "config.yaml"
    _write_cfg(cfg)
    sys_obj = TelescopeDetectionSystem(str(cfg), load_weights=True)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    try:
        before = cfg.read_text()
        bad = _cfg_text().replace(
            "yolox: {model_name: yolox-nano}",
            "yolox: {model_name: yolox-nano, "
            "weights: /nonexistent/nope.msgpack}")
        res = sys_obj.save_config(bad)
        assert res["success"] is False and res["saved"] is False
        assert any("restored" in w for w in res.get("warnings", []))
        assert cfg.read_text() == before
    finally:
        sys_obj.stop()


def test_save_preserves_file_mode(system):
    import os
    sys_obj, cfg = system
    os.chmod(cfg, 0o644)
    res = sys_obj.save_config(_cfg_text(conf=0.8))
    assert res["success"] is True
    assert (os.stat(cfg).st_mode & 0o777) == 0o644


def test_editor_page_served(served_system):
    _, _, port = served_system
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/config_editor")
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    assert resp.status == 200 and b"Config editor" in body
