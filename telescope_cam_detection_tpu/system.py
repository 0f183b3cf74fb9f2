"""System orchestrator: config -> components -> lifecycle.

Counterpart of reference ``main.py:44-1840`` (TelescopeDetectionSystem):
loads and validates config, builds the shared coordinator + per-camera
pipelines (capture -> engine -> processor), fault-tolerant startup (failed
cameras are skipped, the rest run), graceful shutdown, per-camera restart,
and REST-driven hot reload with reloaded/requires-restart diffing.
"""
from __future__ import annotations

import logging
import os
import queue
import tempfile
import threading
import time
from typing import Any, Dict, List, Optional

from telescope_cam_detection_tpu import constants as C
from telescope_cam_detection_tpu.config.loader import (
    load_config,
    merge_camera_detection_config,
    credentials_candidate_paths,
    merge_credentials,
    merge_stage2_preprocessing,
    resolve_credentials_path,
    validate_config,
    validate_model_files,
)
from telescope_cam_detection_tpu.pipeline.enhancement import ImageEnhancer
from telescope_cam_detection_tpu.pipeline.face_mask import (
    FaceMasker,
    FaceMaskingCache,
)
from telescope_cam_detection_tpu.pipeline.filters import (
    EmptyFrameFilter,
    MotionFilter,
)
from telescope_cam_detection_tpu.pipeline.species import SpeciesClassifier
from telescope_cam_detection_tpu.pipeline.time_of_day import TimeOfDayFilter
from telescope_cam_detection_tpu.pipeline.two_stage import (
    TwoStageDetectionPipeline,
)
from telescope_cam_detection_tpu.runtime.capture import create_stream_capture
from telescope_cam_detection_tpu.runtime.coordinator import (
    SharedInferenceCoordinator,
)
from telescope_cam_detection_tpu.runtime.engine import InferenceEngine
from telescope_cam_detection_tpu.runtime.health import CameraHealthMonitor
from telescope_cam_detection_tpu.runtime.memory import MemoryManager
from telescope_cam_detection_tpu.runtime.processor import DetectionProcessor
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram,
    FilterSettings,
    ProgramSpec,
)
from telescope_cam_detection_tpu.runtime.snapshot import SnapshotSaver
from telescope_cam_detection_tpu.server.web import WebServer

logger = logging.getLogger(__name__)

# settings that cannot hot-reload (reference main.py:604-651), extended with
# this framework's compiled-into-the-program keys: anything baked into
# ProgramSpec or the coordinator at build time must be reported as
# requires-restart, not silently ignored by a "successful" reload
RESTART_REQUIRED_KEYS = (
    "cameras", "detection.detector_type", "detection.yolox",
    "detection.rtdetr", "detection.input_size", "detection.device",
    "detection.use_two_stage", "web",
    "detection.transfer", "detection.delta_tile", "detection.delta_threshold",
    "detection.delta_refresh_tiles", "detection.delta_payload",
    "detection.readback_topk", "detection.precision",
    "detection.mesh_devices", "detection.nms_threshold",
    "detection.batching", "detection.gates", "detection.artifact_dir",
    "species_classification.fused",
    "species_classification.fused_max_crops",
    "species_classification.inat_classifier.precision",
    # built at init, not rebuilt by reload (the reference silently ignores
    # these on reload; flagging beats ignoring)
    "privacy",
    "system.hot_reload",
    "snapshots.notifications",
    "tracking.enabled",
)

# compiled into the fused program ONLY when gates='device' (hot-reloadable
# host-side otherwise)
GATED_RESTART_KEYS = (
    "performance.empty_frame_filter.blur_size",
    "motion_filter.motion_blur_size",
)

_REDACT_KEYS = frozenset(("password", "username"))


def _redact(val: Any) -> Any:
    """Strip credential values from a config subtree for diff reporting."""
    if isinstance(val, dict):
        return {k: "***" if k in _REDACT_KEYS else _redact(v)
                for k, v in val.items()}
    if isinstance(val, list):
        return [_redact(v) for v in val]
    return val


def _mask(key_leaf: str, val: Any) -> Any:
    return "***" if key_leaf in _REDACT_KEYS else _redact(val)


def _diff_configs(old: Any, new: Any, prefix: str = "") -> List[Dict[str, Any]]:
    """Dotted-key diff of two config trees (the editor's diff viewer).
    Dicts recurse by key, lists by index; credential values are masked in
    the report (a changed password shows as *** -> ***, never the value)."""
    if isinstance(old, dict) and isinstance(new, dict):
        changes: List[Dict[str, Any]] = []
        for k in sorted(set(old) | set(new), key=str):
            key = f"{prefix}.{k}" if prefix else str(k)
            if k not in old:
                changes.append({"key": key, "change": "added",
                                "new": _mask(k, new[k])})
            elif k not in new:
                changes.append({"key": key, "change": "removed",
                                "old": _mask(k, old[k])})
            else:
                changes += _diff_configs(old[k], new[k], key)
        return changes
    if isinstance(old, list) and isinstance(new, list):
        changes = []
        for i in range(max(len(old), len(new))):
            key = f"{prefix}[{i}]"
            if i >= len(old):
                changes.append({"key": key, "change": "added",
                                "new": _redact(new[i])})
            elif i >= len(new):
                changes.append({"key": key, "change": "removed",
                                "old": _redact(old[i])})
            else:
                changes += _diff_configs(old[i], new[i], key)
        return changes
    if old != new:
        leaf = prefix.rsplit(".", 1)[-1].split("[")[0]
        return [{"key": prefix, "change": "changed",
                 "old": _mask(leaf, old), "new": _mask(leaf, new)}]
    return []


class TelescopeDetectionSystem:
    def __init__(self, config_path: str = "config/config.yaml",
                 load_weights: bool = True):
        self.config_path = config_path
        self.load_weights = load_weights
        self.config: Dict[str, Any] = {}

        self.detection_queue: Optional[queue.Queue] = None
        self.program: Optional[DetectorProgram] = None
        self.coordinator: Optional[SharedInferenceCoordinator] = None
        self.memory_manager: Optional[MemoryManager] = None
        self.snapshot_saver: Optional[SnapshotSaver] = None
        self.species_classifier: Optional[SpeciesClassifier] = None
        self.face_masker: Optional[FaceMasker] = None
        self.face_mask_cache: Optional[FaceMaskingCache] = None
        self.health_monitor: Optional[CameraHealthMonitor] = None
        self.alerter = None  # WebhookAlerter when camera_health.alerts set
        self.snapshot_notifier = None  # WebhookAlerter for snapshot triggers
        self.web_server: Optional[WebServer] = None
        self.config_watcher = None  # ConfigFileWatcher when system.hot_reload

        self.captures: Dict[str, Any] = {}
        self.engines: Dict[str, InferenceEngine] = {}
        self.processors: Dict[str, DetectionProcessor] = {}
        self.frame_queues: Dict[str, queue.Queue] = {}
        self.inference_queues: Dict[str, queue.Queue] = {}
        self.motion_filters: Dict[str, MotionFilter] = {}
        self.time_filters: Dict[str, TimeOfDayFilter] = {}
        self.trackers: Dict[str, Any] = {}  # MultiObjectTracker per camera

        self._shutdown_lock = threading.RLock()
        self._restart_lock = threading.RLock()
        self._reload_lock = threading.RLock()
        self._started = False

    # ---------------------------------------------------------------- config
    def load_config(self) -> None:
        self.config = load_config(self.config_path)

    def validate_config(self) -> None:
        errors = validate_config(self.config)
        if errors:
            raise ValueError("invalid config: " + "; ".join(errors))

    def validate_model_files(self) -> List[str]:
        return validate_model_files(self.config)

    # ---------------------------------------------------------------- build
    def initialize_components(self) -> None:
        cfg = self.config
        perf = cfg.get("performance", {}) or {}
        detection = cfg.get("detection", {}) or {}

        self.detection_queue = queue.Queue(
            maxsize=perf.get("detection_queue_size", 10))

        # privacy
        privacy = cfg.get("privacy", {}) or {}
        if privacy.get("enable_face_masking"):
            self.face_masker = FaceMasker(
                mask_style=privacy.get("mask_style", "gaussian_blur"),
                detection_backend=privacy.get("detection_backend",
                                              "opencv_haar"),
                min_face_size=privacy.get("min_face_size", 30),
                blur_strength=privacy.get("blur_strength", 25),
                pixelate_blocks=privacy.get("pixelate_blocks", 10),
                scale_factor=privacy.get("scale_factor", 1.1),
                min_neighbors=privacy.get("min_neighbors", 5),
                detect_max_dim=privacy.get("detect_max_dim", 480),
                # masking was promised by config: refuse to start without a
                # working detector rather than silently serving unmasked faces
                require_backend=True,
                # whole-body masking of person detections (the reference's
                # planned "Person detection masking", PRIVACY_MASKING.md)
                mask_person_boxes=privacy.get("mask_person_boxes", False))
            self.face_mask_cache = FaceMaskingCache(
                self.face_masker,
                detection_interval=privacy.get("live_feed_detection_interval", 5),
                camera_overrides=privacy.get("camera_overrides") or {})

        # shared detector program (+ weights)
        det_type = detection.get("detector_type", "yolox")
        model_cfg = detection.get(det_type) or detection.get("model") or {}
        input_size = detection.get("input_size", [640, 640])
        eff_cfg = perf.get("empty_frame_filter", {}) or {}
        mf_cfg_global = cfg.get("motion_filter", {}) or {}
        gates_mode = detection.get("gates", "none")
        n_lanes = len([c for c in cfg.get("cameras", [])
                       if c.get("enabled", True)]) + 1
        mesh = None
        mesh_devices = detection.get("mesh_devices", 0)
        if mesh_devices and mesh_devices > 1:
            from telescope_cam_detection_tpu.parallel.mesh import (
                DATA_AXIS, create_mesh)
            mesh = create_mesh(mesh_devices)
            logger.info("sharding inference over %d devices", mesh_devices)
            # per-stream device state (gates / delta reference frames)
            # shards its lane axis over dp — round lanes up so it divides
            dp = int(mesh.shape[DATA_AXIS])
            n_lanes += (-n_lanes) % dp
        spec = ProgramSpec(
            detector_type=det_type,
            variant=model_cfg.get("model_name",
                                  "yolox-s" if det_type == "yolox"
                                  else "rtdetrv2-r18vd"),
            input_hw=(int(input_size[0]), int(input_size[1])),
            nms_threshold=detection.get("nms_threshold", 0.45),
            max_det=detection.get("max_detections", 300),
            transfer=detection.get("transfer", "auto"),
            readback_topk=detection.get("readback_topk"),
            sampling_impl=model_cfg.get("sampling_impl", "auto"),
            nms_impl=detection.get("nms_impl", "auto"),
            delta_tile=detection.get("delta_tile", 16),
            delta_threshold=detection.get("delta_threshold", 14),
            delta_refresh_tiles=detection.get("delta_refresh_tiles", 16),
            delta_payload=detection.get("delta_payload", "rgb"),
            # one device state lane per camera + one for the coordinator's
            # batch-padding frames (shared by delta transfer + device gates)
            delta_lanes=n_lanes,
            # fused motion gates (SURVEY §7): state in HBM inside the program
            gates=gates_mode,
            gate_lanes=n_lanes,
            gate_blur_size=eff_cfg.get("blur_size", 21),
            gate_motion_blur_size=mf_cfg_global.get("motion_blur_size", 21),
        )
        import jax.numpy as jnp
        precision = detection.get("precision", "fp32")
        if precision == "int8":
            # W8A8 conv path (models/common.QuantConv2D): the dtype sentinel
            # travels through the model tree; params stay float so the same
            # checkpoint serves any precision (loader validates yolox-only)
            param_dtype = "int8"
        elif precision in ("bf16", "bfloat16"):
            param_dtype = jnp.bfloat16
        else:
            param_dtype = jnp.float32
        self.program = None
        artifact_dir = detection.get("artifact_dir")
        if artifact_dir:
            # serve from a frozen jax.export artifact (the reference's
            # "load the prebuilt TensorRT engine" path,
            # yolox_detector.py:152-184). Validation already rejects
            # gates/delta/mesh/fused combinations (config/loader.py); any
            # load failure here falls back LOUDLY to the live-traced program
            # so a stale artifact never takes the service down
            try:
                from telescope_cam_detection_tpu.runtime.aot import (
                    AotDetectorProgram)
                self.program = AotDetectorProgram(artifact_dir, spec=spec)
                logger.info(
                    "serving from AOT artifact %s (batch buckets %s)",
                    artifact_dir, self.program.aot.batches)
            except Exception:
                logger.critical(
                    "AOT artifact %s failed to load — falling back to the "
                    "live-traced program (first dispatches pay compilation)",
                    artifact_dir, exc_info=True)
        if self.program is None:
            self.program = DetectorProgram(spec, param_dtype=param_dtype,
                                           mesh=mesh)
        self.program.update_filters(
            self._compute_filter_floor(detection, cfg.get("cameras") or []))
        if gates_mode == "device":
            self._apply_gate_params(eff_cfg, mf_cfg_global)
        weights = model_cfg.get("weights")
        if self.load_weights and weights:
            from telescope_cam_detection_tpu.models.convert import (
                cast_tree_like, load_variables, trees_compatible)
            loaded = load_variables(
                weights, reference_variables=self.program.variables)
            if loaded is None or not trees_compatible(
                    loaded, self.program.variables):
                # configured weights that fail to load are FATAL, like the
                # reference (its detector load_model raises after retries) —
                # silently serving random weights would emit garbage
                # detections while reporting healthy. Random init is an
                # explicit opt-in (--no-weights / no weights key).
                raise RuntimeError(
                    f"configured detector weights failed to load: {weights}")
            # fp16/fp32 checkpoints serve at the configured precision
            self.program.variables = cast_tree_like(
                loaded, self.program.variables)
            logger.info("loaded detector weights from %s", weights)
        # memory + coordinator
        self.memory_manager = MemoryManager()
        batching = detection.get("batching", {}) or {}
        if batching.get("enabled", True):
            self.coordinator = SharedInferenceCoordinator(
                self.program,
                max_batch_size=batching.get("max_batch_size", 8),
                max_batch_wait_ms=batching.get("max_batch_wait_ms", 35.0),
                enable_metrics=batching.get("enable_metrics", True),
                memory_manager=self.memory_manager,
                pipeline_depth=batching.get("pipeline_depth", 2))

        # snapshots (shared) + detection-trigger notifications (the
        # reference's planned "Email/SMS notifications on trigger" —
        # delivered as webhooks, same rate-limited async worker as the
        # camera-health alerts; snapshot cooldown bounds the event rate)
        snaps = cfg.get("snapshots", {}) or {}
        from telescope_cam_detection_tpu.utils.alerts import build_alerter
        # default min_interval 0 (the snapshot cooldown already bounds the
        # rate); user config wins
        self.snapshot_notifier = build_alerter(
            {"min_interval_seconds": 0.0,
             **(snaps.get("notifications") or {})})
        self.snapshot_saver = SnapshotSaver(
            output_dir=snaps.get("output_dir", "clips"),
            enabled=snaps.get("enabled", True),
            save_mode=snaps.get("save_mode", "image"),
            trigger_classes=snaps.get("trigger_classes") or [],
            min_confidence=snaps.get("min_confidence", 0.30),
            cooldown_seconds=snaps.get("cooldown_seconds", 45.0),
            save_annotated=snaps.get("save_annotated", True),
            clip_duration=snaps.get("clip_duration", 10.0),
            pre_buffer_seconds=snaps.get("pre_buffer_seconds", 5.0),
            fps=snaps.get("fps", 30.0),
            face_masker=self.face_masker,
            notify_callback=self.snapshot_notifier,
            alert_zones=snaps.get("alert_zones") or {},
            post_buffer_seconds=snaps.get("post_buffer_seconds", 0.0),
            post_motion_extend=snaps.get("post_motion_extend", False),
            max_post_seconds=snaps.get("max_post_seconds", 30.0),
            dedup_tracks=snaps.get("dedup_tracks", False))

        # stage 2 (shared classifier; per-camera pipelines below)
        sc = cfg.get("species_classification", {}) or {}
        if detection.get("use_two_stage") and sc.get("enabled"):
            inat = sc.get("inat_classifier", {}) or {}
            geo = sc.get("geographic_filter", {}) or {}
            # visible phase marker: the first-ever init on a remote-compile
            # backend can take minutes (cached persistently afterwards)
            logger.info("initializing species classifier (%s, %d classes)"
                        " — first compile on this backend may take minutes",
                        inat.get("model_name", "eva02-large"),
                        inat.get("num_classes", 10000))
            self.species_classifier = SpeciesClassifier(
                model_name=self._classifier_variant(inat.get("model_name", "")),
                num_classes=inat.get("num_classes", 10000),
                input_size=inat.get("input_size", 336),
                taxonomy_file=inat.get("taxonomy_file"),
                confidence_threshold=inat.get("confidence_threshold", 0.3),
                use_hierarchical=inat.get("use_hierarchical", True),
                enable_geographic_filter=geo.get("enabled", False),
                allowed_species=geo.get("allowed_species") or [],
                attn_impl=inat.get("attn_impl", "auto"),
                # "int8" routes the block matmuls through the int8 MXU
                # (2x bf16 peak on v5e); same checkpoint either way.
                # "fp32" opts out of bf16 compute entirely.
                param_dtype=(jnp.float32
                             if inat.get("precision") == "fp32"
                             else jnp.bfloat16),
                quant=("int8" if inat.get("precision") == "int8"
                       else "none"))
            weights = inat.get("weights")
            if self.load_weights and weights:
                from telescope_cam_detection_tpu.models.convert import (
                    load_variables)
                loaded = load_variables(
                    weights,
                    reference_variables=self.species_classifier.variables)
                if loaded is None:
                    # same contract as the detector path above: configured
                    # weights that fail to load are FATAL — a typo'd Stage-2
                    # path must not silently serve random-weight species
                    # labels from a "healthy" system
                    raise RuntimeError(
                        "configured classifier weights failed to load: "
                        f"{weights}")
                self.species_classifier.variables = loaded
                logger.info("loaded classifier weights from %s", weights)
        enh_global = sc.get("enhancement", {}) or {}
        enhancement_on = (enh_global.get("enabled")
                          and enh_global.get("method", "none") != "none")
        if (self.species_classifier is not None and sc.get("fused")
                and gates_mode == "device" and not enhancement_on):
            # fuse Stage-2 into the gated detector program: one dispatch,
            # one packed readback carries rows + gate aux + species top-k
            pre_global = sc.get("preprocessing") or {}
            from telescope_cam_detection_tpu.coco_constants import (
                CLASS_ID_TO_CATEGORY)
            self.program.attach_classifier(
                self.species_classifier.model,
                self.species_classifier.variables,
                input_size=self.species_classifier.input_size,
                max_crops=sc.get("fused_max_crops", 4),
                crop_padding_percent=pre_global.get(
                    "crop_padding_percent", 20),
                # device-side slot eligibility mirrors the host Stage-2
                # rules so ineligible rows never take classification slots
                classify_class_ids=list(CLASS_ID_TO_CATEGORY),
                min_crop_size=pre_global.get("min_crop_size", 64))
            logger.info("fused Stage-2 classifier into the detector program "
                        "(max %d crops/frame)", sc.get("fused_max_crops", 4))
        elif sc.get("fused"):
            if enhancement_on:
                # classifying enhanced crops requires host-side pixel work;
                # fused device results would be superseded (and paid twice)
                logger.warning("species_classification.fused is incompatible "
                               "with crop enhancement (%s); running unfused",
                               enh_global.get("method"))
            else:
                logger.warning("species_classification.fused requires "
                               "detection.gates: device and an enabled "
                               "classifier; running unfused")

        # per-camera pipelines (fault-tolerant: a broken camera config skips)
        for cam in cfg.get("cameras", []) or []:
            if not cam.get("enabled", True):
                continue
            try:
                self._initialize_camera_pipeline(cam)
            except Exception:
                logger.exception("camera %s init failed; skipping",
                                 cam.get("id"))

        # health monitor (+ alert hooks: the reference declares these but
        # ships TODO stubs — here camera_health.alerts.webhook_url enables
        # real JSON-POST delivery of status transitions / restart outcomes)
        ch = cfg.get("camera_health", {}) or {}
        if ch.get("enabled", True):
            from telescope_cam_detection_tpu.utils.alerts import build_alerter
            self.alerter = build_alerter(ch.get("alerts"))
            self.health_monitor = CameraHealthMonitor(
                self.captures,
                restart_callback=self.restart_camera,
                check_interval_seconds=ch.get("check_interval_seconds", 10),
                min_fps=ch.get("min_fps", 5),
                max_frame_age_seconds=ch.get("max_frame_age_seconds", 30),
                max_consecutive_errors=ch.get("max_consecutive_errors", 5),
                auto_restart=ch.get("auto_restart", True),
                max_restart_attempts=ch.get("max_restart_attempts", 10),
                restart_cooldown_seconds=ch.get("restart_cooldown_seconds", 300),
                backoff_multiplier=ch.get("backoff_multiplier", 2),
                initial_backoff_seconds=ch.get("initial_backoff_seconds", 5),
                alert_callback=self.alerter)

        # web server
        web = cfg.get("web", {}) or {}
        self.web_server = WebServer(
            host=web.get("host", "0.0.0.0"),
            port=web.get("port", 8000),
            detection_queue=self.detection_queue,
            cameras=cfg.get("cameras", []),
            captures=self.captures,
            engines=self.engines,
            processors=self.processors,
            coordinator=self.coordinator,
            snapshot_saver=self.snapshot_saver,
            health_monitor=self.health_monitor,
            memory_manager=self.memory_manager,
            face_mask_cache=self.face_mask_cache,
            restart_callback=self.restart_camera,
            reload_callback=self.reload_config,
            get_config=lambda: self.config,
            get_config_text=self.read_config_file,
            validate_config_callback=self.preview_config,
            save_config_callback=self.save_config,
            set_zones_callback=self.set_camera_zones,
            get_zones_callback=self.get_camera_zones,
            mjpeg_fps=web.get("mjpeg_fps", C.DEFAULT_MJPEG_FPS),
            jpeg_quality=web.get("jpeg_quality", C.DEFAULT_JPEG_QUALITY),
            clips_dir=(cfg.get("snapshots", {}) or {}).get("output_dir",
                                                           "clips"),
            queue_health=(perf.get("queue_health") or {}),
            trace_dir=web.get("trace_dir", "/tmp/tcd_traces"))

        # automatic config hot-reload (the reference's planned-but-unbuilt
        # system.hot_reload surface, docs/features/HOT_RELOAD_CONFIG.md)
        hr = ((cfg.get("system", {}) or {}).get("hot_reload", {}) or {})
        auto_interval = float(hr.get("auto_reload_interval_seconds", 0) or 0)
        if hr.get("enabled") and (hr.get("watch_files", True)
                                  or auto_interval > 0):
            from telescope_cam_detection_tpu.runtime.config_watch import (
                ConfigFileWatcher)
            # watch_files: false + auto_reload_interval > 0 is a valid
            # periodic-only mode — the watcher accepts an empty path list.
            # BOTH credential candidates are watched (existence is
            # re-resolved per load, so the preferred location may appear
            # after startup; the watcher tolerates missing files).
            paths = ([self.config_path]
                     + credentials_candidate_paths(self.config_path)
                     if hr.get("watch_files", True) else [])
            self.config_watcher = ConfigFileWatcher(
                paths,
                reload_callback=self.reload_config,
                poll_interval=float(
                    hr.get("poll_interval_seconds") or 2.0),
                auto_reload_interval=auto_interval)

    def _apply_gate_params(self, eff_cfg: Dict[str, Any],
                           mf_cfg: Dict[str, Any]) -> None:
        """Push hot-reloadable gate thresholds into the fused program
        (runtime arrays, never a recompile)."""
        self.program.update_gate_params(
            empty_threshold=eff_cfg.get("threshold", 25),
            var_threshold=mf_cfg.get("var_threshold", 16),
            learning_rate=1.0 / max(int(mf_cfg.get("history", 500)), 1),
            detect_shadows=mf_cfg.get("detect_shadows", True))

    @staticmethod
    def _compute_filter_floor(detection: Dict[str, Any],
                              cameras: List[Dict[str, Any]]) -> FilterSettings:
        """The shared device program's filters must be the LOOSEST (minimum)
        thresholds across all cameras — per-camera tightening happens in each
        engine's host-side refinement. Otherwise a camera with a lower
        override than the global value would silently lose detections the
        reference reports."""
        merged_configs = [merge_camera_detection_config(detection, cam)
                          for cam in cameras
                          if cam.get("enabled", True)] or [detection]
        conf = min(m.get("conf_threshold", 0.25) for m in merged_configs)
        min_area = min(m.get("min_box_area", 0) for m in merged_configs)
        # per-class floor: for each class named anywhere, the min across
        # cameras of that camera's effective threshold for the class (its
        # override if set, else its base conf)
        named = {cls for m in merged_configs
                 for cls in (m.get("class_confidence_overrides") or {})}
        class_floor: Dict[str, float] = {}
        for cls in named:
            class_floor[cls] = min(
                (m.get("class_confidence_overrides") or {}).get(
                    cls, m.get("conf_threshold", 0.25))
                for m in merged_configs)
        # the device wildlife mask applies only if EVERY camera wants it
        wildlife = all(m.get("wildlife_only", True) for m in merged_configs)
        # per-class size floor: the loosest (min of mins, max of maxes)
        # constraint across cameras; a camera without a constraint for the
        # class loosens the floor to unbounded on that side. Per-camera
        # exact constraints refine host-side in each engine
        # (reference inference_engine_yolox.py:523-528).
        size_named = {cls for m in merged_configs
                      for cls in (m.get("class_size_constraints") or {})}
        size_floor: Dict[str, Any] = {}
        for cls in size_named:
            blocks = [(m.get("class_size_constraints") or {}).get(cls) or {}
                      for m in merged_configs]
            lo = min(b.get("min", 0) for b in blocks)
            hi = max(b.get("max", float("inf")) for b in blocks)
            if lo > 0 or hi != float("inf"):
                size_floor[cls] = (float(lo), float(hi))
        return FilterSettings(
            conf_threshold=conf,
            class_confidence_overrides=class_floor,
            min_box_area=min_area,
            wildlife_only=wildlife,
            class_size_limits=size_floor)

    @staticmethod
    def _classifier_variant(model_name: str) -> str:
        name = (model_name or "").lower()
        for variant in ("eva02-tiny", "eva02-small", "eva02-base"):
            if variant in name:
                return variant
        return "eva02-large"

    def _initialize_camera_pipeline(self, cam: Dict[str, Any]) -> None:
        cfg = self.config
        perf = cfg.get("performance", {}) or {}
        detection = cfg.get("detection", {}) or {}
        cam_id = cam["id"]

        frame_q = self.frame_queues.get(cam_id) or queue.Queue(
            maxsize=perf.get("frame_queue_size", 2))
        infer_q = self.inference_queues.get(cam_id) or queue.Queue(maxsize=10)
        self.frame_queues[cam_id] = frame_q
        self.inference_queues[cam_id] = infer_q

        capture = create_stream_capture(cam, frame_q, perf)
        self.captures[cam_id] = capture

        merged = merge_camera_detection_config(detection, cam)

        device_gates = (getattr(self.program, "spec", None) is not None
                        and self.program.spec.gates == "device")
        eff = perf.get("empty_frame_filter", {}) or {}
        empty_filter = None
        if eff.get("enabled"):
            if device_gates:
                # fused gate: the program returns the changed-pixel count;
                # this object only applies the (hot-reloadable) threshold
                from telescope_cam_detection_tpu.pipeline.filters import (
                    DeviceEmptyFrameGate)
                empty_filter = DeviceEmptyFrameGate(
                    min_motion_area=eff.get("min_motion_area", 200))
            else:
                empty_filter = EmptyFrameFilter(
                    min_motion_area=eff.get("min_motion_area", 200),
                    blur_size=eff.get("blur_size", 21),
                    threshold=eff.get("threshold", 25))

        sparse = perf.get("sparse_detection", {}) or {}
        sparse_interval = (sparse.get("keyframe_interval", 1)
                           if sparse.get("enabled") else 1)

        two_stage = None
        if self.species_classifier is not None:
            sc = cfg.get("species_classification", {}) or {}
            pre = merge_stage2_preprocessing(sc, cam)
            enh_cfg = sc.get("enhancement", {}) or {}
            enhancer = None
            if enh_cfg.get("enabled") and enh_cfg.get("method", "none") != "none":
                clahe = enh_cfg.get("clahe", {}) or {}
                bila = enh_cfg.get("bilateral", {}) or {}
                enhancer = ImageEnhancer(
                    method=enh_cfg.get("method", "clahe"),
                    clahe_clip_limit=clahe.get("clip_limit", 2.0),
                    clahe_tile_grid=tuple(clahe.get("tile_grid_size", (8, 8))),
                    bilateral_d=bila.get("d", 9),
                    bilateral_sigma_color=bila.get("sigma_color", 75),
                    bilateral_sigma_space=bila.get("sigma_space", 75),
                    auto_luma_threshold=enh_cfg.get(
                        "auto_luma_threshold", 90.0),
                    auto_contrast_threshold=enh_cfg.get(
                        "auto_contrast_threshold", 35.0),
                    auto_night_boost=enh_cfg.get("auto_night_boost", 1.5))
            # fused Stage-2 bakes the GLOBAL preprocessing into the device
            # program; a camera whose merged stage2_preprocessing diverges
            # must classify host-side with its own settings instead of
            # silently using global-padded device crops
            pre_global = sc.get("preprocessing") or {}
            fused_matches_camera = all(
                pre.get(key, default) == pre_global.get(key, default)
                for key, default in (("crop_padding_percent", 20),
                                     ("min_crop_size", 64)))
            if (self.program is not None
                    and getattr(self.program, "_stage2", None) is not None
                    and not fused_matches_camera):
                logger.info("[%s] stage2_preprocessing overrides differ from "
                            "the fused globals; this camera classifies "
                            "host-side", cam_id)
            two_stage = TwoStageDetectionPipeline(
                species_classifier=self.species_classifier,
                enhancer=enhancer,
                crop_padding_percent=pre.get("crop_padding_percent", 20),
                min_crop_size=pre.get("min_crop_size", 64),
                confidence_threshold=(cfg.get("species_classification", {})
                                      or {}).get("confidence_threshold", 0.3),
                device_crops=sc.get("device_crops", False),
                use_fused_raw=fused_matches_camera)

        engine = InferenceEngine(
            frame_q, infer_q, camera_id=cam_id,
            program=None if self.coordinator else self.program,
            coordinator=self.coordinator,
            detection_config=merged,
            two_stage_pipeline=two_stage,
            empty_frame_filter=empty_filter,
            sparse_interval=sparse_interval)
        self.engines[cam_id] = engine

        mf_cfg = cfg.get("motion_filter", {}) or {}
        motion_filter = None
        if mf_cfg.get("enabled"):
            motion_filter = MotionFilter(
                history=mf_cfg.get("history", 500),
                var_threshold=mf_cfg.get("var_threshold", 16),
                detect_shadows=mf_cfg.get("detect_shadows", True),
                min_motion_area=mf_cfg.get("min_motion_area", 100),
                motion_blur_size=mf_cfg.get("motion_blur_size", 21),
                min_motion_ratio=mf_cfg.get("min_motion_ratio", 0.05),
                min_motion_pixels=mf_cfg.get("min_motion_pixels", 10),
                # gates='device': the fused program already scored each
                # detection against its HBM background model — the filter
                # only thresholds (backend "program")
                backend="program" if device_gates else "auto")
            self.motion_filters[cam_id] = motion_filter

        tf_cfg = cfg.get("time_of_day_filter", {}) or {}
        time_filter = None
        if tf_cfg.get("enabled"):
            time_filter = TimeOfDayFilter(
                confidence_penalty=tf_cfg.get("confidence_penalty", 0.3),
                hard_filter=tf_cfg.get("hard_filter", False),
                use_system_timezone=tf_cfg.get("use_system_timezone", True))
            self.time_filters[cam_id] = time_filter

        collision_detector = self._build_collision_detector(cam_id)

        tracker = None
        tr_cfg = cfg.get("tracking", {}) or {}
        if tr_cfg.get("enabled"):
            from telescope_cam_detection_tpu.pipeline.tracker import (
                MultiObjectTracker)
            tracker = MultiObjectTracker(
                iou_min=tr_cfg.get("iou_min", 0.3),
                max_age=tr_cfg.get("max_age", 15),
                min_hits=tr_cfg.get("min_hits", 3),
                class_consistent=tr_cfg.get("class_consistent", True),
                max_tracks=tr_cfg.get("max_tracks", 128))
            self.trackers[cam_id] = tracker

        processor = DetectionProcessor(
            infer_q, self.detection_queue, camera_id=cam_id,
            get_latest_frame=capture.get_latest_frame,
            motion_filter=motion_filter,
            time_of_day_filter=time_filter,
            snapshot_saver=self.snapshot_saver,
            collision_detector=collision_detector,
            tracker=tracker,
            history_size=perf.get("history_size", 30))
        self.processors[cam_id] = processor

    def set_camera_zones(self, cam_id: str,
                         zones: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Live zone-editor path (web POST /api/zones): replace one camera's
        danger zones in the running processor. Session-only — the response
        carries the zones as applied so the operator can persist them under
        ``collision_detection.zones`` in config.yaml."""
        processor = self.processors.get(cam_id)
        if processor is None:
            return {"success": False, "error": f"camera {cam_id} not found"}
        if len(zones or []) > 64:
            return {"success": False, "error": "too many zones (max 64)"}
        import math
        cleaned = []
        for z in zones or []:
            pts = z.get("points") or []
            if len(pts) > 256:
                return {"success": False,
                        "error": "zone has too many points (max 256)"}
            # coordinates must be finite numbers: python json accepts the
            # NaN/Infinity tokens, which would poison every later
            # /api/zones response for strict JSON.parse clients
            for p in pts:
                try:
                    ok = (len(p) == 2 and math.isfinite(float(p[0]))
                          and math.isfinite(float(p[1])))
                except (TypeError, ValueError):
                    ok = False
                if not ok:
                    return {"success": False,
                            "error": f"zone {z.get('name')!r} has a "
                                     "non-finite or malformed point"}
            # names render in the dashboard and persist into YAML — keep a
            # safe charset and bounded length (stored-XSS hardening)
            name = "".join(ch for ch in str(z.get("name", "zone"))[:64]
                           if ch.isalnum() or ch in " _.-") or "zone"
            cleaned.append(dict(z, name=name, camera_id=cam_id))
        zones = cleaned
        valid = [z for z in zones if len(z.get("points") or []) >= 3]
        if not valid:
            processor.collision_detector = None
            return {"success": True, "camera_id": cam_id, "zones": []}
        det = processor.collision_detector
        if det is None:
            cc = self.config.get("collision_detection", {}) or {}
            from telescope_cam_detection_tpu.pipeline.collision import (
                CollisionDetector)
            det = CollisionDetector(
                zones=[],
                danger_threshold=cc.get("danger_threshold", 50.0),
                predict_horizon_frames=cc.get("predict_horizon_frames", 5),
                alert_cooldown_seconds=cc.get("alert_cooldown_seconds", 5.0))
        det.set_zones(valid)
        processor.collision_detector = det
        return {"success": True, "camera_id": cam_id,
                "zones": det.zones_payload()}

    def get_camera_zones(self) -> Dict[str, Any]:
        """Live zones per camera (for the dashboard editor)."""
        out: Dict[str, Any] = {}
        for cam_id, proc in self.processors.items():
            det = getattr(proc, "collision_detector", None)
            out[cam_id] = det.zones_payload() if det is not None else []
        return out

    def _build_collision_detector(self, cam_id: str):
        """Phase-3 danger zones (config ``collision_detection``): zones
        without a camera_id apply to every camera."""
        cc = self.config.get("collision_detection", {}) or {}
        if not cc.get("enabled"):
            return None
        zones = [z for z in (cc.get("zones") or [])
                 if not z.get("camera_id") or z.get("camera_id") == cam_id]
        if not zones:
            return None
        from telescope_cam_detection_tpu.pipeline.collision import (
            CollisionDetector)
        return CollisionDetector(
            zones=zones,
            danger_threshold=cc.get("danger_threshold", 50.0),
            predict_horizon_frames=cc.get("predict_horizon_frames", 5),
            alert_cooldown_seconds=cc.get("alert_cooldown_seconds", 5.0))

    # ---------------------------------------------------------------- lifecycle
    def start(self, block: bool = True) -> None:
        """Fault-tolerant start (reference main.py:1446-1534): cameras that
        fail to connect are cleaned up and skipped."""
        with self._shutdown_lock:
            failed = []
            for cam_id, capture in list(self.captures.items()):
                if not capture.start():
                    logger.error("[%s] capture failed to start; skipping",
                                 cam_id)
                    failed.append(cam_id)
            for cam_id in failed:
                self.captures.pop(cam_id, None)
                self.engines.pop(cam_id, None)
                self.processors.pop(cam_id, None)
            if self.coordinator is not None:
                self.coordinator.start()
            for engine in self.engines.values():
                engine.start()
            for processor in self.processors.values():
                processor.start()
            if self.health_monitor is not None:
                self.health_monitor.start()
            if self.config_watcher is not None:
                self.config_watcher.start()
            # scheduled product retention (separate shorter window for the
            # unmasked raw/ tree — the privacy best practice the reference
            # documents; its cleanup_old_files is never called)
            ret = ((self.config.get("snapshots", {}) or {})
                   .get("retention") or {})
            if self.snapshot_saver is not None and ret.get("enabled"):
                self.snapshot_saver.start_retention(
                    max_age_days=ret.get("max_age_days", 30.0),
                    unmasked_max_age_days=ret.get("unmasked_max_age_days"),
                    interval_hours=ret.get("interval_hours", 6.0))
            self._started = True
            for cam_id in self.captures:
                if self.web_server:
                    self.web_server.set_camera_start_time(cam_id)
        if self.web_server is not None:
            if block:
                self.web_server.run()
            else:
                self.web_server.start()

    def stop(self) -> None:
        with self._shutdown_lock:
            if not self._started:
                return
            self._started = False
            logger.info("stopping system...")
            if self.web_server is not None:
                self.web_server.stop()
            if self.config_watcher is not None:
                self.config_watcher.stop()
            if self.health_monitor is not None:
                self.health_monitor.stop()
            for processor in self.processors.values():
                processor.stop()
            for engine in self.engines.values():
                engine.stop()
            if self.coordinator is not None:
                self.coordinator.stop()
            for capture in self.captures.values():
                capture.stop()
            if self.snapshot_saver is not None:
                self.snapshot_saver.close()  # finalize in-flight clips
            # alerters stop LAST: events from processors draining above
            # and from clip finalization must still reach the webhook
            # workers (stopping earlier silently drops the final posts)
            if self.alerter is not None:
                self.alerter.stop()
            if self.snapshot_notifier is not None:
                self.snapshot_notifier.stop()
            logger.info("system stopped")

    def restart_camera(self, camera_id: str) -> bool:
        """Stop and rebuild one camera's pipeline reusing its queues
        (reference main.py:1621-1733)."""
        with self._restart_lock:
            cam_cfg = next((c for c in self.config.get("cameras", [])
                            if c.get("id") == camera_id), None)
            if cam_cfg is None:
                logger.error("restart: unknown camera %s", camera_id)
                return False
            logger.info("[%s] restarting camera pipeline", camera_id)
            for registry in (self.processors, self.engines, self.captures):
                comp = registry.get(camera_id)
                if comp is not None:
                    try:
                        comp.stop()
                    except Exception:
                        logger.exception("[%s] stop failed", camera_id)
            time.sleep(1.0)
            try:
                self._initialize_camera_pipeline(cam_cfg)
            except Exception:
                logger.exception("[%s] rebuild failed", camera_id)
                return False
            ok = self.captures[camera_id].start()
            if ok:
                self.engines[camera_id].start()
                self.processors[camera_id].start()
                if self.web_server:
                    self.web_server.set_camera_start_time(camera_id)
            return ok

    # ---------------------------------------------------------------- hot reload
    def _prepare_weight_swaps(self, old_cfg: Dict[str, Any],
                              new_cfg: Dict[str, Any],
                              result: Dict[str, Any]):
        """Validate weights-path-only changes and return (commits, swapped):
        zero-arg callables that apply the swaps, and the model-section names
        whose weights/taxonomy keys the restart diff should ignore.

        Validation happens BEFORE anything else is applied, so a bad path
        or mismatched tree rejects the whole reload with the running system
        untouched (no half-applied config). Loaded trees are cast to the
        running trees' dtypes (serving may be bf16 while fine-tune exports
        are f32) so the swap never changes compiled argument dtypes — the
        zero-recompile guarantee."""
        commits: List[Any] = []
        swapped: set = set()
        if not self.load_weights:
            return commits, swapped
        from telescope_cam_detection_tpu.models.convert import (
            cast_tree_like, load_variables, trees_compatible)

        def prepare(new_w, current, what):
            loaded = load_variables(new_w, reference_variables=current)
            if loaded is None:
                result["errors"].append(
                    f"{what} weights failed to load: {new_w}")
                return None
            if not trees_compatible(loaded, current):
                result["errors"].append(
                    f"{what} weights {new_w} do not match the running model "
                    f"(wrong variant/classes?)")
                return None
            return cast_tree_like(loaded, current)

        detection = new_cfg.get("detection", {}) or {}
        old_det = old_cfg.get("detection", {}) or {}
        det_type = detection.get("detector_type", "yolox")
        if (self.program is not None
                and old_det.get("detector_type", "yolox") == det_type):
            new_m = dict(detection.get(det_type) or {})
            old_m = dict(old_det.get(det_type) or {})
            new_w = new_m.pop("weights", None)
            old_w = old_m.pop("weights", None)
            if new_w and new_w != old_w and new_m == old_m:
                tree = prepare(new_w, self.program.variables, "detector")
                if tree is not None:
                    def commit_det(tree=tree, new_w=new_w):
                        self.program.variables = tree
                        result["reloaded"].append(
                            f"detection.{det_type}.weights")
                        logger.info("hot-swapped detector weights from %s",
                                    new_w)
                    commits.append(commit_det)
                    swapped.add(det_type)

        # classifier: weights and taxonomy_file hot-reload together (the
        # fine-tune CLI exports both; examples/README.md workflow)
        sc_new = dict(((new_cfg.get("species_classification", {}) or {})
                       .get("inat_classifier", {}) or {}))
        sc_old = dict(((old_cfg.get("species_classification", {}) or {})
                       .get("inat_classifier", {}) or {}))
        new_w = sc_new.pop("weights", None)
        old_w = sc_old.pop("weights", None)
        new_tax = sc_new.pop("taxonomy_file", None)
        old_tax = sc_old.pop("taxonomy_file", None)
        if self.species_classifier is not None and sc_new == sc_old:
            if new_w and new_w != old_w:
                tree = prepare(new_w, self.species_classifier.variables,
                               "classifier")
                if tree is not None:
                    def commit_cls(tree=tree, new_w=new_w):
                        self.species_classifier.variables = tree
                        if self.program is not None:
                            self.program.update_classifier_weights(tree)
                        result["reloaded"].append(
                            "species_classification.inat_classifier.weights")
                        logger.info("hot-swapped classifier weights from %s",
                                    new_w)
                    commits.append(commit_cls)
                    swapped.add("inat_classifier")
            if new_tax and new_tax != old_tax:
                from telescope_cam_detection_tpu.pipeline.species import (
                    load_taxonomy)
                taxonomy = load_taxonomy(new_tax)
                if not taxonomy:
                    result["errors"].append(
                        f"taxonomy file failed to load: {new_tax}")
                else:
                    def commit_tax(taxonomy=taxonomy, new_tax=new_tax):
                        self.species_classifier.taxonomy = taxonomy
                        result["reloaded"].append(
                            "species_classification.inat_classifier"
                            ".taxonomy_file")
                        logger.info("hot-reloaded taxonomy from %s", new_tax)
                    commits.append(commit_tax)
                    swapped.add("inat_classifier")
        return commits, swapped

    def reload_config(self) -> Dict[str, Any]:
        """Re-read + validate config; apply hot-reloadable settings; report
        what needs a restart (reference main.py:429-655)."""
        with self._reload_lock:
            result: Dict[str, Any] = {"success": False, "reloaded": [],
                                      "requires_restart": [], "warnings": [],
                                      "errors": []}
            try:
                new_cfg = load_config(self.config_path)
            except (OSError, ValueError) as e:
                result["errors"].append(f"load failed: {e}")
                return result
            errors = validate_config(new_cfg)
            if errors:
                result["errors"] = errors
                return result

            old_cfg = self.config
            detection = new_cfg.get("detection", {}) or {}

            # Zero-downtime weight hot-swap, phase 1 (validate + prepare):
            # model weights are DISPATCH ARGUMENTS of the compiled programs
            # (never baked in), so a weights-path-only change swaps without
            # restart or recompile. Trees load and validate BEFORE any other
            # setting applies — a bad path rejects the whole reload with the
            # running system untouched. (The reference requires a full
            # restart for any model change, main.py:608-617.)
            swap_commits, swapped = self._prepare_weight_swaps(
                old_cfg, new_cfg, result)
            if result["errors"]:
                return result

            # engine settings (per camera merge)
            for cam in new_cfg.get("cameras", []) or []:
                engine = self.engines.get(cam.get("id"))
                if engine is None:
                    continue
                merged = merge_camera_detection_config(detection, cam)
                updated = engine.update_settings({
                    "conf_threshold": merged.get("conf_threshold", 0.25),
                    "class_confidence_overrides": merged.get(
                        "class_confidence_overrides") or {},
                    "min_box_area": merged.get("min_box_area", 0),
                    "max_detections": merged.get("max_detections", 100),
                    "wildlife_only": merged.get("wildlife_only", True),
                    "class_size_constraints": merged.get(
                        "class_size_constraints") or {},
                })
                result["reloaded"] += [f"{cam['id']}.{u}" for u in updated]
            if self.program is not None:
                self.program.update_filters(self._compute_filter_floor(
                    detection, new_cfg.get("cameras") or []))

            if self.snapshot_saver is not None:
                updated = self.snapshot_saver.update_settings(
                    new_cfg.get("snapshots", {}) or {})
                result["reloaded"] += [f"snapshots.{u}" for u in updated]
            for cam_id, mf in self.motion_filters.items():
                updated = mf.update_params(new_cfg.get("motion_filter", {}) or {})
                result["reloaded"] += [f"{cam_id}.motion.{u}" for u in updated]
            # device gates: push threshold changes into the fused program's
            # runtime param array + the per-engine area-threshold consumers
            if (self.program is not None
                    and self.program.spec.gates == "device"):
                new_eff = ((new_cfg.get("performance", {}) or {})
                           .get("empty_frame_filter", {}) or {})
                self._apply_gate_params(
                    new_eff, new_cfg.get("motion_filter", {}) or {})
                for cam_id, engine in self.engines.items():
                    gate = engine.empty_frame_filter
                    if gate is not None and hasattr(gate, "decide"):
                        updated = gate.update_params(new_eff)
                        result["reloaded"] += [f"{cam_id}.empty_gate.{u}"
                                               for u in updated]
            for cam_id, tf in self.time_filters.items():
                updated = tf.update_params(
                    new_cfg.get("time_of_day_filter", {}) or {})
                result["reloaded"] += [f"{cam_id}.tod.{u}" for u in updated]
            for cam_id, trk in self.trackers.items():
                updated = trk.update_params(
                    new_cfg.get("tracking", {}) or {})
                result["reloaded"] += [f"{cam_id}.tracking.{u}"
                                       for u in updated]

            # weight hot-swap, phase 2 (commit): in-flight batches finish
            # on the old trees; the next dispatch carries the new ones
            for commit in swap_commits:
                commit()

            # restart-required diff. Per-camera detection_overrides hot-reload
            # through the engines above, so they are stripped from the cameras
            # comparison (the reference likewise only flags id/ip/count
            # changes, main.py:608-617 — overrides reload without restart).
            def _strip_overrides(cams):
                return [{k: v for k, v in (c or {}).items()
                         if k != "detection_overrides"} for c in (cams or [])]

            def _strip_weights(node):
                return {k: v for k, v in (node or {}).items()
                        if k != "weights"}

            restart_keys = list(RESTART_REQUIRED_KEYS)
            if (self.program is not None
                    and self.program.spec.gates == "device"):
                restart_keys += GATED_RESTART_KEYS
            for dotted in restart_keys:
                node_old, node_new = old_cfg, new_cfg
                for key in dotted.split("."):
                    node_old = (node_old or {}).get(key) if isinstance(
                        node_old, dict) else None
                    node_new = (node_new or {}).get(key) if isinstance(
                        node_new, dict) else None
                if dotted == "cameras":
                    node_old = _strip_overrides(node_old)
                    node_new = _strip_overrides(node_new)
                if dotted.split(".")[-1] in swapped:
                    node_old = _strip_weights(node_old)
                    node_new = _strip_weights(node_new)
                if node_old != node_new:
                    result["requires_restart"].append(dotted)

            self.config = new_cfg  # atomic swap
            result["success"] = True
            return result

    # ------------------------------------------------------------ config editor
    # The reference's second planned-but-unbuilt surface: a web config
    # editor with validation feedback, a diff viewer, and one-click reload
    # (reference docs/features/HOT_RELOAD_CONFIG.md "Web UI Config Editor
    # (Planned)", Issue #81). Exposed via /config_editor + the
    # /api/config/file|validate|save routes (Bearer-token gated).
    def read_config_file(self) -> str:
        """Raw on-disk YAML text (token-gated at the route: the file may
        contain inline camera credentials, unlike the redacted
        /api/config/current payload)."""
        with open(self.config_path) as f:
            return f.read()

    def preview_config(self, text: str) -> Dict[str, Any]:
        """Parse + validate proposed YAML text WITHOUT applying it; returns
        {valid, errors, changes} where changes is the dotted-key diff vs the
        live config (credentials merged exactly like load_config, values
        redacted)."""
        import yaml as _yaml
        try:
            new_cfg = _yaml.safe_load(text) or {}
        except _yaml.YAMLError as e:
            return {"valid": False,
                    "errors": [f"YAML parse error: {e}"], "changes": []}
        if not isinstance(new_cfg, dict):
            return {"valid": False,
                    "errors": ["top level must be a mapping"], "changes": []}
        merge_credentials(new_cfg,
                          resolve_credentials_path(self.config_path))
        errors = validate_config(new_cfg)
        changes = _diff_configs(self.config, new_cfg)
        return {"valid": not errors, "errors": errors, "changes": changes}

    def _atomic_write_config(self, text: str) -> None:
        """tmp+rename in the config's directory (watchers and concurrent
        readers only ever see a complete document), preserving the original
        file's permission bits (mkstemp would otherwise pin 0600)."""
        cfg_path = os.path.abspath(self.config_path)
        cfg_dir = os.path.dirname(cfg_path) or "."
        fd, tmp_path = tempfile.mkstemp(
            dir=cfg_dir, prefix=".config_editor_", suffix=".yaml")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(text)
            try:
                os.chmod(tmp_path, os.stat(cfg_path).st_mode & 0o7777)
            except OSError:
                pass  # original missing/unreadable: keep mkstemp's 0600
            os.replace(tmp_path, cfg_path)
        except OSError:
            try:
                os.unlink(tmp_path)
            except OSError:
                pass
            raise

    def save_config(self, text: str) -> Dict[str, Any]:
        """Validate proposed YAML; atomically replace config.yaml; hot-reload.

        Rejected text never PERSISTS: static validation rejects before any
        write, and if the reload stage rejects (e.g. a weights path that
        exists in no checkpoint), the previous file content is restored —
        otherwise a config the running system refused would still be what
        the next restart boots from."""
        with self._reload_lock:
            preview = self.preview_config(text)
            if not preview["valid"]:
                return {"success": False, "saved": False, **preview}
            try:
                old_text = self.read_config_file()
            except OSError:
                old_text = None
            try:
                self._atomic_write_config(text)
            except OSError as e:
                return {"success": False, "saved": False, "valid": True,
                        "errors": [f"write failed: {e}"],
                        "changes": preview["changes"]}
            result = self.reload_config()
            if not result.get("success") and old_text is not None:
                try:
                    self._atomic_write_config(old_text)
                    result.setdefault("warnings", []).append(
                        "reload rejected the saved config; previous "
                        "config.yaml restored")
                except OSError as e:
                    result.setdefault("warnings", []).append(
                        f"reload rejected the saved config AND restoring "
                        f"the previous file failed: {e}")
            result["saved"] = bool(result.get("success"))
            result["changes"] = preview["changes"]
            # the watcher would otherwise re-trigger on our own write
            if self.config_watcher is not None:
                self.config_watcher.mark_clean()
            return result

    # ---------------------------------------------------------------- stats
    def get_stats(self) -> Dict[str, Any]:
        return {
            "captures": {c: cap.get_stats() for c, cap in self.captures.items()},
            "engines": {c: e.get_stats() for c, e in self.engines.items()},
            "processors": {c: p.get_stats()
                           for c, p in self.processors.items()},
            "coordinator": (self.coordinator.get_stats()
                            if self.coordinator else None),
            "memory": (self.memory_manager.get_stats()
                       if self.memory_manager else None),
        }
