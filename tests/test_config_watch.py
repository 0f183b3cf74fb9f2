"""Automatic config hot-reload (system.hot_reload — the reference's
planned-but-unbuilt file watching, docs/features/HOT_RELOAD_CONFIG.md).

Unit tests drive ConfigFileWatcher directly with a stub callback; the
wiring test runs a real TelescopeDetectionSystem and proves an edit to
config.yaml lands in a live engine without touching the REST endpoint.
"""
import textwrap
import threading
import time

import pytest

from telescope_cam_detection_tpu.runtime.config_watch import ConfigFileWatcher
from telescope_cam_detection_tpu.system import TelescopeDetectionSystem


class _Recorder:
    def __init__(self, result=None, raise_n=0):
        self.calls = 0
        self.event = threading.Event()
        self.result = result if result is not None else {
            "success": True, "reloaded": [], "requires_restart": []}
        self.raise_n = raise_n

    def __call__(self):
        self.calls += 1
        self.event.set()
        if self.raise_n:
            self.raise_n -= 1
            raise RuntimeError("injected reload failure")
        return self.result


def _wait(predicate, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(0.02)
    return False


def test_file_change_triggers_one_reload(tmp_path):
    cfg = tmp_path / "config.yaml"
    cfg.write_text("a: 1\n")
    rec = _Recorder()
    w = ConfigFileWatcher([str(cfg)], rec, poll_interval=0.05)
    w.start()
    try:
        time.sleep(0.2)
        assert rec.calls == 0  # no change, no reload
        cfg.write_text("a: 2\n")
        assert _wait(lambda: rec.calls >= 1)
        time.sleep(0.3)  # stable file must not re-trigger
        assert rec.calls == 1
    finally:
        w.stop()


def test_deleted_then_recreated_file_triggers(tmp_path):
    cfg = tmp_path / "config.yaml"
    cfg.write_text("a: 1\n")
    rec = _Recorder()
    w = ConfigFileWatcher([str(cfg)], rec, poll_interval=0.05)
    w.start()
    try:
        cfg.unlink()
        new = tmp_path / "config.yaml.tmp"
        new.write_text("a: 2\n")
        new.rename(cfg)  # rename-into-place, the atomic-writer pattern
        assert _wait(lambda: rec.calls >= 1)
    finally:
        w.stop()


def test_mark_clean_suppresses_own_write(tmp_path):
    """A caller that wrote the file through the reload path itself (the
    web editor's save) rebaselines the watcher so no redundant reload
    fires."""
    cfg = tmp_path / "config.yaml"
    cfg.write_text("a: 1\n")
    rec = _Recorder()
    w = ConfigFileWatcher([str(cfg)], rec, poll_interval=0.05)
    w.start()
    try:
        cfg.write_text("a: 2\n")
        w.mark_clean()
        time.sleep(0.5)
        assert rec.calls == 0
        cfg.write_text("a: 3\n")  # a REAL later edit still triggers
        assert _wait(lambda: rec.calls >= 1)
    finally:
        w.stop()


def test_watches_missing_file_until_created(tmp_path):
    """Watching a not-yet-existing path (the preferred credentials
    location) must register its later creation as a change."""
    cfg = tmp_path / "config.yaml"
    cfg.write_text("a: 1\n")
    creds = tmp_path / "camera_credentials.yaml"  # does not exist
    rec = _Recorder()
    w = ConfigFileWatcher([str(cfg), str(creds)], rec, poll_interval=0.05)
    w.start()
    try:
        time.sleep(0.2)
        assert rec.calls == 0
        creds.write_text("credentials: {}\n")
        assert _wait(lambda: rec.calls >= 1)
    finally:
        w.stop()


def test_periodic_only_mode(tmp_path):
    rec = _Recorder()
    w = ConfigFileWatcher([], rec, poll_interval=0.05,
                          auto_reload_interval=0.15)
    w.start()
    try:
        assert _wait(lambda: rec.calls >= 2)
    finally:
        w.stop()


def test_callback_exception_keeps_watching(tmp_path):
    cfg = tmp_path / "config.yaml"
    cfg.write_text("a: 1\n")
    rec = _Recorder(raise_n=1)
    w = ConfigFileWatcher([str(cfg)], rec, poll_interval=0.05)
    w.start()
    try:
        cfg.write_text("a: 2\n")
        assert _wait(lambda: rec.calls >= 1)
        cfg.write_text("a: 3\n")
        assert _wait(lambda: rec.calls >= 2)  # thread survived the raise
        assert w.get_stats()["reload_failures"] == 1
    finally:
        w.stop()


def test_rejected_reload_counted(tmp_path):
    cfg = tmp_path / "config.yaml"
    cfg.write_text("a: 1\n")
    rec = _Recorder(result={"success": False, "errors": ["bad yaml"]})
    w = ConfigFileWatcher([str(cfg)], rec, poll_interval=0.05)
    w.start()
    try:
        cfg.write_text("a: {\n")
        assert _wait(lambda: rec.calls >= 1)
        assert _wait(lambda: w.get_stats()["reload_failures"] >= 1)
    finally:
        w.stop()


# --------------------------------------------------------------- system wiring

def _write_cfg(path, conf=0.3, hot_reload=True):
    path.write_text(textwrap.dedent(f"""
        system:
          hot_reload:
            enabled: {str(hot_reload).lower()}
            poll_interval_seconds: 0.05
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
        web: {{host: 127.0.0.1, port: 18997}}
        snapshots: {{enabled: false}}
    """))


def test_system_builds_and_applies_watched_edit(tmp_path):
    cfg = tmp_path / "config.yaml"
    _write_cfg(cfg, conf=0.3)
    sys_obj = TelescopeDetectionSystem(str(cfg), load_weights=True)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    try:
        assert sys_obj.config_watcher is not None
        assert str(cfg) in sys_obj.config_watcher.paths
        sys_obj.config_watcher.start()
        engine = sys_obj.engines["cam1"]
        assert engine.get_settings()["conf_threshold"] == pytest.approx(0.3)
        _write_cfg(cfg, conf=0.55)
        assert _wait(lambda: engine.get_settings()["conf_threshold"]
                     == pytest.approx(0.55), timeout=10.0)
    finally:
        sys_obj.config_watcher.stop()
        sys_obj.stop()


def test_system_disabled_by_default(tmp_path):
    cfg = tmp_path / "config.yaml"
    _write_cfg(cfg, hot_reload=False)
    sys_obj = TelescopeDetectionSystem(str(cfg), load_weights=True)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    try:
        assert sys_obj.config_watcher is None
    finally:
        sys_obj.stop()


def test_validation_rejects_bad_poll_interval(tmp_path):
    cfg = tmp_path / "config.yaml"
    cfg.write_text(textwrap.dedent("""
        system: {hot_reload: {enabled: true, poll_interval_seconds: 0}}
        cameras:
          - {id: cam1, protocol: synthetic, enabled: true}
        detection: {detector_type: yolox}
    """))
    sys_obj = TelescopeDetectionSystem(str(cfg), load_weights=False)
    sys_obj.load_config()
    with pytest.raises(ValueError, match="poll_interval_seconds"):
        sys_obj.validate_config()
