"""Config loading, validation, and per-camera merge.

The YAML schema is a byte-compatible surface with the reference
(``config/config.yaml`` + gitignored ``camera_credentials.yaml``); semantics
mirror ``main.py:106-346`` (load/validate) and ``main.py:941-1034``
(three-level precedence: global detection -> per-camera detection_overrides /
stage2_preprocessing). The implementation is new: declarative range specs
instead of imperative if-chains, and it returns structured errors so the
hot-reload endpoint can report them.
"""
from __future__ import annotations

import copy
import logging
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import yaml

logger = logging.getLogger(__name__)


class ConfigError(ValueError):
    """Raised when a config fails validation. ``.errors`` holds all messages."""

    def __init__(self, errors: List[str]):
        super().__init__("; ".join(errors))
        self.errors = errors


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def credentials_candidate_paths(config_path: str) -> list:
    """Both locations load_config considers for camera_credentials.yaml,
    in precedence order: the repo root next to config/, then the config
    dir itself. (File watchers must watch BOTH — the preferred one may
    not exist yet and existence is re-resolved on every load.)"""
    path = Path(config_path)
    candidates = [str(path.parent.parent / "camera_credentials.yaml"),
                  str(path.parent / "camera_credentials.yaml")]
    return list(dict.fromkeys(candidates))


def resolve_credentials_path(config_path: str) -> str:
    """Default camera_credentials.yaml location for a given config path:
    the repo root next to config/, falling back to the config dir itself."""
    candidates = credentials_candidate_paths(config_path)
    for cand in candidates:
        if Path(cand).exists():
            return cand
    return candidates[-1]


def load_config(
    config_path: str = "config/config.yaml",
    credentials_path: Optional[str] = None,
) -> Dict[str, Any]:
    """Load config YAML and merge per-camera credentials.

    Credentials live in a separate gitignored file keyed by camera id:
      camera_credentials.yaml: {credentials: {cam1: {username, password}}}
    (reference main.py:106-141).
    """
    path = Path(config_path)
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {config_path}")
    with open(path) as f:
        config = yaml.safe_load(f) or {}

    if credentials_path is None:
        credentials_path = resolve_credentials_path(config_path)

    merge_credentials(config, credentials_path)
    return config


def merge_credentials(config: Dict[str, Any], credentials_path: str) -> None:
    """In-place merge of camera_credentials.yaml into config['cameras']
    (inline username/password in the config win — setdefault semantics)."""
    creds = {}
    if Path(credentials_path).exists():
        with open(credentials_path) as f:
            cred_doc = yaml.safe_load(f) or {}
        creds = cred_doc.get("credentials", cred_doc) or {}

    cams = config.get("cameras") or []
    if not isinstance(cams, list):
        return  # malformed; validate_config reports it
    for cam in cams:
        if not isinstance(cam, dict):
            continue
        cam_creds = creds.get(cam.get("id"), {})
        if cam_creds:
            cam.setdefault("username", cam_creds.get("username"))
            cam.setdefault("password", cam_creds.get("password"))


# ---------------------------------------------------------------------------
# Validation
# ---------------------------------------------------------------------------

# (section, key) -> (type(s), lo, hi) — inclusive numeric ranges, None = open.
_RANGE_SPECS: Tuple[Tuple[Tuple[str, ...], type, Optional[float], Optional[float]], ...] = (
    (("detection", "conf_threshold"), float, 0.0, 1.0),
    (("detection", "nms_threshold"), float, 0.0, 1.0),
    (("detection", "min_box_area"), float, 0.0, None),
    (("detection", "max_detections"), int, 1, 10000),
    (("detection", "batching", "max_batch_size"), int, 1, 64),
    (("detection", "batching", "max_batch_wait_ms"), float, 0.0, 1000.0),
    (("detection", "batching", "pipeline_depth"), int, 1, 8),
    (("species_classification", "confidence_threshold"), float, 0.0, 1.0),
    (("species_classification", "preprocessing", "crop_padding_percent"), float, 0.0, 200.0),
    (("species_classification", "preprocessing", "min_crop_size"), int, 1, 4096),
    (("web", "port"), int, 1, 65535),
    (("web", "mjpeg_fps"), float, 1, 120),
    (("web", "jpeg_quality"), int, 1, 100),
    (("performance", "frame_queue_size"), int, 1, 1000),
    (("performance", "detection_queue_size"), int, 1, 1000),
    (("performance", "history_size"), int, 1, 100000),
    (("performance", "queue_health", "warning_threshold"), float, 0.0, 1.0),
    (("performance", "queue_health", "critical_threshold"), float, 0.0, 1.0),
    (("performance", "empty_frame_filter", "min_motion_area"), float, 0.0, None),
    (("performance", "empty_frame_filter", "threshold"), float, 0.0, 255.0),
    (("performance", "sparse_detection", "keyframe_interval"), int, 1, 1000),
    (("motion_filter", "history"), int, 1, 100000),
    (("motion_filter", "var_threshold"), float, 0.0, None),
    (("motion_filter", "min_motion_area"), float, 0.0, None),
    (("time_of_day_filter", "confidence_penalty"), float, 0.0, 1.0),
    (("snapshots", "min_confidence"), float, 0.0, 1.0),
    (("snapshots", "cooldown_seconds"), float, 0.0, None),
    (("snapshots", "clip_duration"), float, 0.1, 3600.0),
    (("snapshots", "pre_buffer_seconds"), float, 0.0, 3600.0),
    (("snapshots", "fps"), float, 1, 120),
    (("camera_health", "check_interval_seconds"), float, 0.1, None),
    (("camera_health", "min_fps"), float, 0.0, None),
    (("camera_health", "max_restart_attempts"), int, 0, 10000),
    (("camera_health", "alerts", "min_interval_seconds"), float, 0.0, None),
    (("camera_health", "alerts", "timeout_seconds"), float, 0.1, 300.0),
    (("snapshots", "notifications", "min_interval_seconds"), float, 0.0, None),
    (("snapshots", "notifications", "timeout_seconds"), float, 0.1, 300.0),
    (("snapshots", "post_buffer_seconds"), float, 0.0, 3600.0),
    (("snapshots", "max_post_seconds"), float, 0.0, 3600.0),
    (("snapshots", "retention", "max_age_days"), float, 0.01, None),
    (("snapshots", "retention", "unmasked_max_age_days"), float, 0.01, None),
    (("snapshots", "retention", "interval_hours"), float, 0.1, 168.0),
    (("system", "hot_reload", "poll_interval_seconds"), float, 0.05, 3600.0),
    (("system", "hot_reload", "auto_reload_interval_seconds"), float, 0.0, None),
)

_VALID_DETECTORS = ("yolox", "rtdetr")
_VALID_PROTOCOLS = ("rtsp", "rtsp-tcp", "onvif", "h265", "neolink", "file", "synthetic")
_VALID_SAVE_MODES = ("image", "clip")
_VALID_ENHANCEMENT = ("none", "clahe", "realesrgan", "auto")
_VALID_MASK_STYLES = ("gaussian_blur", "pixelate", "black_box", "adaptive_blur")
_VALID_TRANSFERS = ("auto", "device", "host", "yuv420", "delta")
_VALID_DELTA_PAYLOADS = ("rgb", "yuv420")
_VALID_GATES = ("none", "device")
_VALID_IMPLS = ("auto", "xla", "pallas")
# detector/classifier precision: int8 = W8A8 dynamic quantization on the
# MXU (models/common.QuantConv2D, ops/quant.py); the same float checkpoint
# serves any of these — quantization happens at dispatch
_VALID_DET_PRECISION = ("fp32", "bf16", "bfloat16", "int8")
_VALID_CLS_PRECISION = ("fp32", "bf16", "bfloat16", "int8")


def _check_size_constraints(errors: List[str], prefix: str, constraints: Any) -> None:
    """Validate a class_size_constraints block (reference main.py:251-270):
    mapping of class name -> {min?: int>=0, max?: int>=0} with min <= max."""
    if constraints is None:
        return
    if not isinstance(constraints, dict):
        errors.append(f"{prefix} must be a mapping of class name -> constraints")
        return
    for cls, block in constraints.items():
        if not isinstance(block, dict):
            errors.append(f"{prefix}.{cls} must be a mapping with 'min'/'max'")
            continue
        for bound in ("min", "max"):
            if bound in block and (
                    not isinstance(block[bound], int)
                    or isinstance(block[bound], bool)
                    or block[bound] < 0):
                errors.append(
                    f"{prefix}.{cls}.{bound} must be an int >= 0, "
                    f"got {block[bound]!r}")
        if (isinstance(block.get("min"), int) and isinstance(block.get("max"), int)
                and not isinstance(block["min"], bool)
                and not isinstance(block["max"], bool)
                and block["min"] > block["max"]):
            errors.append(f"{prefix}.{cls}: min ({block['min']}) > "
                          f"max ({block['max']})")


def _lookup(config: Dict[str, Any], path: Tuple[str, ...]):
    node: Any = config
    for key in path:
        if not isinstance(node, dict) or key not in node:
            return None
        node = node[key]
    return node


def _check_threshold_block(errors: List[str], prefix: str, overrides: Any) -> None:
    if overrides is None:
        return
    if not isinstance(overrides, dict):
        errors.append(f"{prefix} must be a mapping of class name -> threshold")
        return
    for cls, thr in overrides.items():
        if not isinstance(thr, (int, float)) or not (0.0 <= float(thr) <= 1.0):
            errors.append(f"{prefix}.{cls} must be in [0, 1], got {thr!r}")


def validate_config(config: Dict[str, Any]) -> List[str]:
    """Validate a config dict; returns a list of error strings (empty = ok).

    Covers the same checks as reference main.py:147-346: camera uniqueness and
    required fields, detector selection, numeric ranges, per-class override
    ranges (global and per-camera), queue sizes, motion/snapshot/privacy
    settings.
    """
    errors: List[str] = []

    cameras = config.get("cameras")
    if not cameras or not isinstance(cameras, list):
        errors.append("cameras: at least one camera must be configured")
        cameras = []
    seen_ids = set()
    for i, cam in enumerate(cameras):
        if not isinstance(cam, dict):
            errors.append(f"cameras[{i}] must be a mapping")
            continue
        cam_id = cam.get("id")
        if not cam_id:
            errors.append(f"cameras[{i}]: missing required field 'id'")
        elif cam_id in seen_ids:
            errors.append(f"cameras[{i}]: duplicate camera id {cam_id!r}")
        else:
            seen_ids.add(cam_id)
        proto = cam.get("protocol", "rtsp-tcp")
        if proto not in _VALID_PROTOCOLS:
            errors.append(
                f"cameras[{i}]: invalid protocol {proto!r} (valid: {_VALID_PROTOCOLS})")
        if proto not in ("file", "synthetic") and not cam.get("ip") and not cam.get("url"):
            errors.append(f"cameras[{i}]: missing 'ip' (or explicit 'url')")
        for dim_key in ("target_width", "target_height"):
            dim = cam.get(dim_key)
            if dim is not None and (not isinstance(dim, int) or not 16 <= dim <= 8192):
                errors.append(f"cameras[{i}].{dim_key} must be an int in [16, 8192]")
        ov = cam.get("detection_overrides") or {}
        if ov:
            ct = ov.get("conf_threshold")
            if ct is not None and not (0.0 <= float(ct) <= 1.0):
                errors.append(f"cameras[{i}].detection_overrides.conf_threshold out of [0,1]")
            _check_threshold_block(
                errors, f"cameras[{i}].detection_overrides.class_confidence_overrides",
                ov.get("class_confidence_overrides"))
            _check_size_constraints(
                errors, f"cameras[{i}].detection_overrides.class_size_constraints",
                ov.get("class_size_constraints"))

    detection = config.get("detection", {}) or {}
    det_type = detection.get("detector_type", "yolox")
    if det_type not in _VALID_DETECTORS:
        errors.append(f"detection.detector_type must be one of {_VALID_DETECTORS}, got {det_type!r}")
    input_size = detection.get("input_size")
    if input_size is not None:
        if (not isinstance(input_size, (list, tuple)) or len(input_size) != 2
                or not all(isinstance(v, int) and 32 <= v <= 8192 for v in input_size)):
            errors.append("detection.input_size must be [height, width] ints in [32, 8192]")
    _check_threshold_block(errors, "detection.class_confidence_overrides",
                           detection.get("class_confidence_overrides"))
    _check_size_constraints(errors, "detection.class_size_constraints",
                            detection.get("class_size_constraints"))

    transfer = detection.get("transfer")
    if transfer is not None and transfer not in _VALID_TRANSFERS:
        errors.append(
            f"detection.transfer must be one of {_VALID_TRANSFERS}, got {transfer!r}")
    payload = detection.get("delta_payload")
    if payload is not None and payload not in _VALID_DELTA_PAYLOADS:
        errors.append(f"detection.delta_payload must be one of "
                      f"{_VALID_DELTA_PAYLOADS}, got {payload!r}")
    gates = detection.get("gates")
    if gates is not None and gates not in _VALID_GATES:
        errors.append(f"detection.gates must be one of {_VALID_GATES}, "
                      f"got {gates!r}")
    nms_impl = detection.get("nms_impl")
    if nms_impl is not None and nms_impl not in _VALID_IMPLS:
        errors.append(f"detection.nms_impl must be one of {_VALID_IMPLS}, "
                      f"got {nms_impl!r}")
    artifact_dir = detection.get("artifact_dir")
    if artifact_dir:
        # AOT artifacts freeze the PLAIN program variants (runtime/aot.py
        # scope): the stateful features live in the host runtime + traced
        # program, so they cannot serve from a frozen graph
        if (detection.get("gates") or "none") == "device":
            errors.append("detection.artifact_dir cannot serve "
                          "gates: device (HBM gate state is runtime-managed)")
        if (detection.get("transfer") or "auto") in ("delta", "yuv420"):
            errors.append("detection.artifact_dir cannot serve "
                          f"transfer: {detection.get('transfer')} "
                          "(host-side codec state)")
        if (detection.get("mesh_devices") or 0) > 1:
            errors.append("detection.artifact_dir is single-chip "
                          "(exported programs carry no mesh shardings)")
        if _lookup(config, ("species_classification", "fused")):
            errors.append("detection.artifact_dir cannot serve the fused "
                          "Stage-2 classifier (requires device gates)")
    precision = detection.get("precision")
    if precision is not None and precision not in _VALID_DET_PRECISION:
        errors.append(f"detection.precision must be one of "
                      f"{_VALID_DET_PRECISION}, got {precision!r}")
    if precision == "int8" and detection.get("detector_type", "yolox") != "yolox":
        errors.append("detection.precision: int8 is only implemented for "
                      "the yolox detector family (conv W8A8); rtdetr's "
                      "attention/sampling path serves fp32/bf16")
    cls_precision = _lookup(
        config, ("species_classification", "inat_classifier", "precision"))
    if cls_precision is not None and cls_precision not in _VALID_CLS_PRECISION:
        errors.append(
            "species_classification.inat_classifier.precision must be one "
            f"of {_VALID_CLS_PRECISION}, got {cls_precision!r}")

    for path, typ, lo, hi in _RANGE_SPECS:
        val = _lookup(config, path)
        if val is None:
            continue
        dotted = ".".join(path)
        if not isinstance(val, (int, float)) or isinstance(val, bool):
            errors.append(f"{dotted} must be numeric, got {type(val).__name__}")
            continue
        if lo is not None and val < lo:
            errors.append(f"{dotted} = {val} below minimum {lo}")
        if hi is not None and val > hi:
            errors.append(f"{dotted} = {val} above maximum {hi}")

    qh = _lookup(config, ("performance", "queue_health")) or {}
    if qh and isinstance(qh.get("warning_threshold"), (int, float)) \
            and isinstance(qh.get("critical_threshold"), (int, float)) \
            and qh["warning_threshold"] > qh["critical_threshold"]:
        errors.append("performance.queue_health.warning_threshold exceeds critical_threshold")

    blur = _lookup(config, ("performance", "empty_frame_filter", "blur_size"))
    if blur is not None and (not isinstance(blur, int) or blur < 1 or blur % 2 == 0):
        errors.append("performance.empty_frame_filter.blur_size must be a positive odd int")
    blur = _lookup(config, ("motion_filter", "motion_blur_size"))
    if blur is not None and (not isinstance(blur, int) or blur < 1 or blur % 2 == 0):
        errors.append("motion_filter.motion_blur_size must be a positive odd int")

    snaps = config.get("snapshots", {}) or {}
    mode = snaps.get("save_mode", "image")
    if mode not in _VALID_SAVE_MODES:
        errors.append(f"snapshots.save_mode must be one of {_VALID_SAVE_MODES}, got {mode!r}")

    enh = _lookup(config, ("species_classification", "enhancement", "method"))
    if enh is not None and enh not in _VALID_ENHANCEMENT:
        errors.append(
            f"species_classification.enhancement.method must be one of {_VALID_ENHANCEMENT}")

    style = _lookup(config, ("privacy", "mask_style"))
    if style is not None and style not in _VALID_MASK_STYLES:
        errors.append(f"privacy.mask_style must be one of {_VALID_MASK_STYLES}")

    _validate_collision(errors, config)
    _validate_tracking(errors, config)

    return errors


def _validate_zone_list(errors: List[str], zones, where: str) -> None:
    if not isinstance(zones, list):
        errors.append(f"{where} must be a list of zones")
        return
    for i, zone in enumerate(zones):
        here = f"{where}[{i}]"
        if not isinstance(zone, dict):
            errors.append(f"{here}: must be a mapping with points")
            continue
        pts = zone.get("points")
        if not isinstance(pts, list) or len(pts) < 3:
            errors.append(f"{here}: needs >= 3 [x, y] points")
            continue
        for p in pts:
            if (not isinstance(p, (list, tuple)) or len(p) != 2
                    or not all(isinstance(v, (int, float)) for v in p)):
                errors.append(f"{here}: points must be [x, y] numbers")
                break


def _validate_tracking(errors: List[str], config: Dict[str, Any]) -> None:
    tc = config.get("tracking")
    if tc is None:
        return
    if not isinstance(tc, dict):
        errors.append("tracking must be a mapping")
        return
    iou = tc.get("iou_min", 0.3)
    if not isinstance(iou, (int, float)) or not 0.0 < iou <= 1.0:
        errors.append("tracking.iou_min must be in (0, 1]")
    for key, lo in (("max_age", 0), ("min_hits", 1), ("max_tracks", 1)):
        val = tc.get(key)
        if val is not None and (not isinstance(val, int)
                                or isinstance(val, bool) or val < lo):
            errors.append(f"tracking.{key} must be an integer >= {lo}")


def _validate_collision(errors: List[str], config: Dict[str, Any]) -> None:
    cc = config.get("collision_detection")
    if cc:
        if not isinstance(cc, dict):
            errors.append("collision_detection must be a mapping")
        else:
            _validate_zone_list(errors, cc.get("zones") or [],
                                "collision_detection.zones")
            thr = cc.get("danger_threshold", 50.0)
            if not isinstance(thr, (int, float)) or thr < 0:
                errors.append(
                    "collision_detection.danger_threshold must be >= 0")
    az = (config.get("snapshots") or {}).get("alert_zones")
    if az is not None:
        if not isinstance(az, dict):
            errors.append("snapshots.alert_zones must map camera_id -> "
                          "zone list")
        else:
            for cam_id, zones in az.items():
                _validate_zone_list(errors, zones,
                                    f"snapshots.alert_zones.{cam_id}")


def validate_model_files(config: Dict[str, Any], base_dir: str = ".") -> List[str]:
    """Check that model weights / taxonomy files referenced by the config
    exist on disk (reference main.py:348-427). Returns error strings."""
    errors: List[str] = []
    detection = config.get("detection", {}) or {}
    det_type = detection.get("detector_type", "yolox")

    def _exists(rel: Optional[str]) -> bool:
        return bool(rel) and (os.path.isabs(rel) and os.path.exists(rel)
                              or os.path.exists(os.path.join(base_dir, rel)))

    section = detection.get(det_type) or detection.get("model") or {}
    weights = section.get("weights")
    if weights and not _exists(weights):
        errors.append(f"detection.{det_type}.weights not found: {weights}")

    sc = config.get("species_classification", {}) or {}
    if sc.get("enabled") and detection.get("use_two_stage"):
        tax = (sc.get("inat_classifier") or {}).get("taxonomy_file")
        if tax and not _exists(tax):
            errors.append(f"species_classification.inat_classifier.taxonomy_file not found: {tax}")
    return errors


# ---------------------------------------------------------------------------
# Per-camera merge (three-level precedence)
# ---------------------------------------------------------------------------

def merge_camera_detection_config(
    global_detection: Dict[str, Any], camera: Dict[str, Any]
) -> Dict[str, Any]:
    """Merge per-camera ``detection_overrides`` on top of the global
    ``detection`` section (reference main.py:941-1034).

    Scalar overrides replace; ``class_confidence_overrides`` and
    ``class_size_constraints`` merge per-class (camera wins; reference
    main.py:1012-1032). The result is the effective detection config for that
    camera's engine.
    """
    merged = copy.deepcopy(global_detection)
    overrides = camera.get("detection_overrides") or {}
    for key, val in overrides.items():
        if key in ("class_confidence_overrides", "class_size_constraints"):
            base = dict(merged.get(key) or {})
            base.update(copy.deepcopy(val) or {})
            merged[key] = base
        else:
            merged[key] = copy.deepcopy(val)
    return merged


def merge_stage2_preprocessing(
    global_sc: Dict[str, Any], camera: Dict[str, Any]
) -> Dict[str, Any]:
    """Per-camera stage2_preprocessing overrides on top of
    species_classification.preprocessing (reference main.py:1036-1060)."""
    merged = copy.deepcopy((global_sc or {}).get("preprocessing") or {})
    merged.setdefault("crop_padding_percent", 20)
    merged.setdefault("min_crop_size", 64)
    merged.update(camera.get("stage2_preprocessing") or {})
    return merged
