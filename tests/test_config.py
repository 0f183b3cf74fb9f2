import os
import textwrap

import pytest

from telescope_cam_detection_tpu.config import (
    load_config,
    merge_camera_detection_config,
    validate_config,
    validate_model_files,
)
from telescope_cam_detection_tpu.config.loader import merge_stage2_preprocessing


def _minimal_config():
    return {
        "cameras": [
            {"id": "cam1", "name": "A", "ip": "192.168.1.2", "protocol": "rtsp-tcp",
             "target_width": 1920, "target_height": 1080, "enabled": True},
        ],
        "detection": {
            "detector_type": "yolox",
            "yolox": {"model_name": "yolox-s", "weights": "models/yolox_s.msgpack"},
            "input_size": [640, 640],
            "conf_threshold": 0.25,
            "nms_threshold": 0.45,
            "min_box_area": 20,
            "max_detections": 300,
        },
        "web": {"host": "0.0.0.0", "port": 8000},
        "performance": {"frame_queue_size": 2, "detection_queue_size": 10},
    }


def test_validate_minimal_ok():
    assert validate_config(_minimal_config()) == []


def test_validate_catches_bad_values():
    cfg = _minimal_config()
    cfg["detection"]["conf_threshold"] = 1.5
    cfg["detection"]["detector_type"] = "frcnn"
    cfg["cameras"].append({"id": "cam1", "ip": "10.0.0.1"})  # duplicate id
    cfg["web"]["port"] = 99999
    errors = validate_config(cfg)
    joined = "\n".join(errors)
    assert "conf_threshold" in joined
    assert "detector_type" in joined
    assert "duplicate" in joined
    assert "port" in joined


def test_validate_class_overrides():
    cfg = _minimal_config()
    cfg["detection"]["class_confidence_overrides"] = {"person": 2.0}
    errors = validate_config(cfg)
    assert any("person" in e for e in errors)


def test_validate_missing_cameras():
    assert any("camera" in e for e in validate_config({}))


def test_load_config_merges_credentials(tmp_path):
    cfg_dir = tmp_path / "config"
    cfg_dir.mkdir()
    (cfg_dir / "config.yaml").write_text(textwrap.dedent("""
        cameras:
          - id: cam1
            ip: 192.168.1.2
        detection:
          detector_type: yolox
    """))
    (tmp_path / "camera_credentials.yaml").write_text(textwrap.dedent("""
        credentials:
          cam1:
            username: admin
            password: hunter2
    """))
    cfg = load_config(str(cfg_dir / "config.yaml"))
    assert cfg["cameras"][0]["username"] == "admin"
    assert cfg["cameras"][0]["password"] == "hunter2"


def test_load_config_missing_file():
    with pytest.raises(FileNotFoundError):
        load_config("/nonexistent/config.yaml")


def test_merge_camera_detection_config():
    global_det = {
        "conf_threshold": 0.15,
        "min_box_area": 20,
        "class_confidence_overrides": {"person": 0.75, "bird": 0.55},
    }
    cam = {"detection_overrides": {
        "conf_threshold": 0.25,
        "class_confidence_overrides": {"person": 0.80, "cat": 0.65},
    }}
    merged = merge_camera_detection_config(global_det, cam)
    assert merged["conf_threshold"] == 0.25
    assert merged["min_box_area"] == 20
    assert merged["class_confidence_overrides"] == {
        "person": 0.80, "bird": 0.55, "cat": 0.65}
    # global untouched
    assert global_det["conf_threshold"] == 0.15
    assert global_det["class_confidence_overrides"]["person"] == 0.75


def test_merge_stage2_preprocessing():
    sc = {"preprocessing": {"crop_padding_percent": 20, "min_crop_size": 64}}
    cam = {"stage2_preprocessing": {"crop_padding_percent": 40}}
    merged = merge_stage2_preprocessing(sc, cam)
    assert merged["crop_padding_percent"] == 40
    assert merged["min_crop_size"] == 64


def test_validate_model_files(tmp_path):
    cfg = _minimal_config()
    cfg["detection"]["yolox"]["weights"] = str(tmp_path / "missing.msgpack")
    errors = validate_model_files(cfg, base_dir=str(tmp_path))
    assert errors
    (tmp_path / "missing.msgpack").write_bytes(b"x")
    assert validate_model_files(cfg, base_dir=str(tmp_path)) == []


def test_example_configs_validate():
    """Every shipped example config parses and passes validation
    (reference ships examples/config_*.yaml; ours must stay loadable)."""
    import glob
    import os
    import yaml
    from telescope_cam_detection_tpu.config.loader import validate_config
    root = os.path.join(os.path.dirname(__file__), "..", "examples")
    paths = sorted(glob.glob(os.path.join(root, "config_*.yaml")))
    assert len(paths) == 5, paths
    for p in paths:
        with open(p) as f:
            cfg = yaml.safe_load(f)
        errors = validate_config(cfg)
        assert errors == [], f"{os.path.basename(p)}: {errors}"


@pytest.mark.skipif(not os.path.exists("/root/reference/config"),
                    reason="upstream reference tree not present")
def test_upstream_reference_configs_validate():
    """Byte-compat pin: the upstream project's OWN shipped configs must
    parse and pass OUR validation unmodified (the YAML schema is a
    compatibility surface). Skipped where the reference checkout is
    absent (CI)."""
    import glob
    import yaml
    from telescope_cam_detection_tpu.config.loader import validate_config
    paths = sorted(glob.glob("/root/reference/config/*.yaml*"))
    checked = 0
    for p in paths:
        if "credentials" in p:
            continue
        with open(p) as f:
            cfg = yaml.safe_load(f)
        if not isinstance(cfg, dict) or "cameras" not in cfg:
            continue
        errors = validate_config(cfg)
        assert errors == [], f"{os.path.basename(p)}: {errors}"
        checked += 1
    assert checked >= 1, paths


def test_validate_class_size_constraints():
    """detection.class_size_constraints (reference main.py:251-270): mapping
    of class -> {min/max int >= 0}, min <= max; also per-camera overrides."""
    cfg = _minimal_config()
    cfg["detection"]["class_size_constraints"] = {
        "bird": {"max": 8000}, "bear": {"min": 5000},
        "dog": {"min": 1000, "max": 90000}}
    assert validate_config(cfg) == []

    cfg["detection"]["class_size_constraints"] = {"bird": [1, 2]}
    assert any("class_size_constraints.bird" in e for e in validate_config(cfg))

    cfg["detection"]["class_size_constraints"] = {"bird": {"min": -5}}
    assert any("must be an int >= 0" in e for e in validate_config(cfg))

    cfg["detection"]["class_size_constraints"] = {"bird": {"min": 2.5}}
    assert any("must be an int >= 0" in e for e in validate_config(cfg))

    cfg["detection"]["class_size_constraints"] = {"bird": {"min": 10, "max": 5}}
    assert any("min (10) > max (5)" in e for e in validate_config(cfg))

    cfg["detection"].pop("class_size_constraints")
    cfg["cameras"][0]["detection_overrides"] = {
        "class_size_constraints": {"person": {"min": "big"}}}
    errs = validate_config(cfg)
    assert any("cameras[0].detection_overrides.class_size_constraints.person"
               in e for e in errs)


def test_merge_class_size_constraints():
    """Per-class merge with camera precedence (reference main.py:1027-1032)."""
    global_det = {"conf_threshold": 0.25,
                  "class_size_constraints": {"bird": {"max": 8000},
                                             "bear": {"min": 5000}}}
    camera = {"id": "cam1", "detection_overrides": {
        "class_size_constraints": {"bird": {"max": 6000},
                                   "person": {"min": 4000}}}}
    merged = merge_camera_detection_config(global_det, camera)
    assert merged["class_size_constraints"] == {
        "bird": {"max": 6000},          # camera wins
        "bear": {"min": 5000},          # global preserved
        "person": {"min": 4000},        # camera-only added
    }
    # global dict untouched
    assert global_det["class_size_constraints"]["bird"] == {"max": 8000}
