"""The fused per-batch device program and its host-facing wrapper.

This is the architectural core of the TPU build (SURVEY §7): everything the
reference does between "decoded frame" and "filtered boxes" across five
Python/CUDA components (yolox_detector.preprocess/detect/postprocess,
inference_engine._post_process_detections per-class filtering) collapses into
ONE jitted XLA program with static shapes:

    uint8 frames -> fused preprocess -> detector forward -> head decode
    -> batched class-aware NMS -> per-class confidence/size/wildlife filter
    -> (B, max_det, 7) fixed-shape detections in capture-frame coordinates.

Hot-reloadable thresholds (per-class confidence, min box area, wildlife mask)
enter as RUNTIME ARRAYS, not compile-time constants, so a config hot-reload
(reference main.py:429-545) never triggers recompilation.

One program is compiled per (batch_bucket, capture_hw, input_hw) triple and
cached; the coordinator pads batches up to the bucket.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from telescope_cam_detection_tpu.coco_constants import (
    COCO_CLASSES,
    NUM_COCO_CLASSES,
    WILDLIFE_CLASSES,
    class_name,
)
from telescope_cam_detection_tpu.models import yolox as yolox_lib
from telescope_cam_detection_tpu.ops.nms import batched_nms
from telescope_cam_detection_tpu.ops.preprocess import (
    preprocess_rtdetr,
    preprocess_yolox,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class ProgramSpec:
    """Static compile-time configuration of one detector program."""
    detector_type: str = "yolox"          # "yolox" | "rtdetr"
    variant: str = "yolox-s"
    num_classes: int = NUM_COCO_CLASSES
    input_hw: Tuple[int, int] = (640, 640)
    nms_threshold: float = 0.45
    max_det: int = 300
    pre_nms_topk: int = 1000
    # Transfer policy. "auto": when capture resolution exceeds the model
    # input, bilinear-resize on host (cv2, threads) and ship input-sized
    # uint8 — 9x fewer host->device bytes at 1440p->640. On this environment
    # the device link runs ~20 MB/s (measured), so shipping full 1440p
    # frames costs ~2.2 s/batch vs ~50 ms for the entire fused compute;
    # "device" keeps the reference-style fully-fused on-device resize;
    # "yuv420" additionally packs to 4:2:0 on host (2x fewer bytes again,
    # slight chroma loss — opt-in, breaks bit-parity with the reference).
    transfer: str = "auto"                # "auto" | "device" | "host" | "yuv420"
    # RT-DETR deformable-attention sampling: "xla" gathers or the "pallas"
    # MXU kernel (ops/pallas_deform.py). Ignored for yolox.
    sampling_impl: str = "xla"


@dataclasses.dataclass
class FilterSettings:
    """Hot-reloadable stage-1 filter settings -> device arrays.

    Mirrors inference_engine_yolox._post_process_detections:479-534 semantics:
    base conf threshold, per-class overrides, min box area, per-class size
    limits, wildlife-only mask.
    """
    conf_threshold: float = 0.25
    class_confidence_overrides: Dict[str, float] = dataclasses.field(default_factory=dict)
    min_box_area: float = 0.0
    max_box_area: float = float("inf")
    wildlife_only: bool = True
    class_size_limits: Dict[str, Tuple[float, float]] = dataclasses.field(default_factory=dict)

    def to_arrays(self, num_classes: int) -> Dict[str, jnp.ndarray]:
        conf = np.full((num_classes,), self.conf_threshold, np.float32)
        for name, thr in (self.class_confidence_overrides or {}).items():
            try:
                conf[COCO_CLASSES.index(name)] = thr
            except ValueError:
                logger.warning("unknown class in confidence overrides: %s", name)
        min_area = np.full((num_classes,), max(self.min_box_area, 0.0), np.float32)
        max_area = np.full((num_classes,),
                           self.max_box_area if np.isfinite(self.max_box_area) else 1e18,
                           np.float32)
        for name, (lo, hi) in (self.class_size_limits or {}).items():
            try:
                idx = COCO_CLASSES.index(name)
                min_area[idx] = max(lo, min_area[idx])
                max_area[idx] = min(hi, max_area[idx])
            except ValueError:
                logger.warning("unknown class in size limits: %s", name)
        allowed = np.ones((num_classes,), bool)
        if self.wildlife_only and num_classes == NUM_COCO_CLASSES:
            allowed[:] = False
            for cid in WILDLIFE_CLASSES:
                allowed[cid] = True
        return {
            "class_conf": jnp.asarray(conf),
            "min_area": jnp.asarray(min_area),
            "max_area": jnp.asarray(max_area),
            "class_allowed": jnp.asarray(allowed),
        }


def _filter_rows(rows: jnp.ndarray, filt: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """(B, D, 7) NMS rows -> same shape with failing rows invalidated (-1)."""
    cls = jnp.clip(rows[..., 6].astype(jnp.int32), 0, filt["class_conf"].shape[0] - 1)
    score = rows[..., 4] * rows[..., 5]
    valid = rows[..., 5] >= 0.0
    valid &= score >= filt["class_conf"][cls]
    area = jnp.clip(rows[..., 2] - rows[..., 0], 0) * jnp.clip(rows[..., 3] - rows[..., 1], 0)
    valid &= (area >= filt["min_area"][cls]) & (area <= filt["max_area"][cls])
    valid &= filt["class_allowed"][cls]
    return jnp.where(valid[..., None], rows, -1.0)


class DetectorProgram:
    """Host-facing detector: owns model variables and a cache of jitted
    programs keyed by (batch, capture_hw). Thread-safe for concurrent
    detect_batch calls (jax dispatch is)."""

    def __init__(
        self,
        spec: ProgramSpec,
        variables: Optional[Any] = None,
        seed: int = 0,
        param_dtype=jnp.float32,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh — shards the stream-batch axis
        over the mesh's dp axis (cameras across chips) and replicates
        parameters; XLA inserts any collectives. Single-chip when None
        (the reference is single-GPU; multi-chip is the TPU scale-out,
        SURVEY §2.4)."""
        from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
        configure_jax()
        self.mesh = mesh
        self.spec = spec
        if spec.detector_type == "yolox":
            self.model = yolox_lib.build_yolox(spec.variant, spec.num_classes,
                                               dtype=param_dtype)
            if variables is None:
                logger.warning("DetectorProgram: random-init weights (no checkpoint)")
                _, variables = yolox_lib.init_yolox(
                    spec.variant, spec.num_classes, spec.input_hw, seed,
                    dtype=param_dtype)
        elif spec.detector_type == "rtdetr":
            from telescope_cam_detection_tpu.models import rtdetr as rtdetr_lib
            self.model = rtdetr_lib.build_rtdetr(
                spec.variant, spec.num_classes, dtype=param_dtype,
                sampling_impl=spec.sampling_impl)
            if variables is None:
                logger.warning("DetectorProgram: random-init weights (no checkpoint)")
                _, variables = rtdetr_lib.init_rtdetr(
                    spec.variant, spec.num_classes, spec.input_hw, seed,
                    dtype=param_dtype, sampling_impl=spec.sampling_impl)
        else:
            raise ValueError(f"unknown detector_type {spec.detector_type!r}")
        self.variables = variables
        self._filters = FilterSettings()
        self._filter_arrays = self._filters.to_arrays(spec.num_classes)
        self._compiled: Dict[Tuple[int, Tuple[int, int]], Callable] = {}
        self.stats: Dict[str, Any] = {"compilations": 0, "batches": 0,
                                      "frames": 0, "last_infer_ms": 0.0}

    # -- hot reload ---------------------------------------------------------
    def update_filters(self, settings: FilterSettings) -> None:
        """Swap filter arrays without recompiling (hot-reload path)."""
        self._filters = settings
        self._filter_arrays = settings.to_arrays(self.spec.num_classes)

    @property
    def filters(self) -> FilterSettings:
        return self._filters

    # -- transfer policy -------------------------------------------------------
    def _host_resize_active(self, capture_hw: Tuple[int, int]) -> bool:
        if self.spec.transfer == "device":
            return False
        if self.spec.transfer in ("host", "yuv420"):
            return capture_hw != self.spec.input_hw
        # auto: only when it shrinks the transfer
        return (capture_hw[0] * capture_hw[1] >
                self.spec.input_hw[0] * self.spec.input_hw[1])

    # -- program construction -------------------------------------------------
    def _build(self, batch: int, capture_hw: Tuple[int, int]) -> Callable:
        spec = self.spec
        model = self.model
        sy = capture_hw[0] / spec.input_hw[0]
        sx = capture_hw[1] / spec.input_hw[1]
        back_scale = jnp.asarray([sx, sy, sx, sy], jnp.float32)

        def program(variables, frames_u8, class_conf, min_area, max_area,
                    class_allowed):
            if spec.transfer == "yuv420":
                from telescope_cam_detection_tpu.ops.preprocess import (
                    yuv420_to_bgr)
                frames_u8 = yuv420_to_bgr(frames_u8).astype(jnp.uint8)
            if spec.detector_type == "yolox":
                x = preprocess_yolox(frames_u8, spec.input_hw)
                outs = model.apply(variables, x, train=False)
                boxes, obj, cls_probs = yolox_lib.decode_outputs(outs)
                rows = batched_nms(
                    boxes, obj, cls_probs,
                    conf_threshold=0.0,  # confidence via runtime arrays below
                    iou_threshold=spec.nms_threshold,
                    max_det=spec.max_det,
                    pre_nms_topk=spec.pre_nms_topk,
                )
            else:
                # RT-DETR is NMS-free: the model's top-k postprocess already
                # yields (B, Q, 7) rows (rtdetr.py predict)
                x = preprocess_rtdetr(frames_u8, spec.input_hw)
                rows = model.apply(variables, x, train=False,
                                   method=model.predict)
                rows = rows[:, :spec.max_det]
                if rows.shape[1] < spec.max_det:
                    pad = jnp.full((rows.shape[0],
                                    spec.max_det - rows.shape[1], 7), -1.0,
                                   rows.dtype)
                    rows = jnp.concatenate([rows, pad], axis=1)
            # scale boxes back to capture coords, then filter
            rows = rows.at[..., :4].multiply(back_scale)
            rows = _filter_rows(rows, {
                "class_conf": class_conf, "min_area": min_area,
                "max_area": max_area, "class_allowed": class_allowed})
            return rows

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from telescope_cam_detection_tpu.parallel.mesh import (
                DATA_AXIS, param_shardings, replicated)
            frames_ndim = 3 if spec.transfer == "yuv420" else 4
            frames_sh = NamedSharding(
                self.mesh, P(DATA_AXIS, *([None] * (frames_ndim - 1))))
            rep = replicated(self.mesh)
            var_sh = jax.tree.map(lambda _: rep, self.variables)
            jitted = jax.jit(
                program,
                in_shardings=(var_sh, frames_sh, rep, rep, rep, rep),
                out_shardings=NamedSharding(self.mesh, P(DATA_AXIS)))
        else:
            jitted = jax.jit(program)
        self.stats["compilations"] += 1
        logger.info("compiling detector program batch=%d capture=%s input=%s",
                    batch, capture_hw, spec.input_hw)
        return jitted

    def _get_program(self, batch: int, capture_hw: Tuple[int, int]) -> Callable:
        key = (batch, capture_hw)
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._build(batch, capture_hw)
            self._compiled[key] = fn
        return fn

    # -- inference ------------------------------------------------------------
    def dispatch_batch(self, frames: np.ndarray):
        """Asynchronously dispatch one batch: transfer + enqueue the fused
        program, return the on-device result array WITHOUT reading it back.
        Lets a caller pipeline the next batch's transfer under this batch's
        execution/readback (np.asarray the result to materialize)."""
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(f"expected (B,H,W,3) uint8 frames, got {frames.shape}")
        if self.mesh is not None:
            # the dp-sharded batch axis must divide the mesh; pad with blank
            # frames (their rows come back invalid and callers slice anyway)
            dp = self.mesh.shape.get("dp", 1)
            short = (-frames.shape[0]) % dp
            if short:
                frames = np.concatenate(
                    [frames, np.zeros((short, *frames.shape[1:]), np.uint8)])
        batch = frames.shape[0]
        capture_hw = (frames.shape[1], frames.shape[2])
        if self._host_resize_active(capture_hw):
            ih, iw = self.spec.input_hw
            try:  # cv2's SIMD resize wins (measured 3x vs our scalar C++)
                import cv2
                frames = np.stack([cv2.resize(f, (iw, ih),
                                              interpolation=cv2.INTER_LINEAR)
                                   for f in frames])
            except ImportError:
                from telescope_cam_detection_tpu.utils import native
                resized = native.resize_batch(frames, (ih, iw))
                if resized is None:
                    raise RuntimeError("host-resize needs cv2 or the native "
                                       "frameio library")
                frames = resized
        if self.spec.transfer == "yuv420":
            frames = self._pack_yuv420(frames)
        fn = self._get_program(batch, capture_hw)
        f = self._filter_arrays
        rows = fn(self.variables, jnp.asarray(frames), f["class_conf"],
                  f["min_area"], f["max_area"], f["class_allowed"])
        self.stats["batches"] += 1
        self.stats["frames"] += batch
        return rows

    @staticmethod
    def _pack_yuv420(frames: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) BGR -> (B, H*3//2, W) planar I420, FULL-range BT.601
        (matches ops.preprocess.yuv420_to_bgr; note cv2's I420 is
        studio-range, so we use our native packer or a numpy fallback)."""
        from telescope_cam_detection_tpu.utils import native
        packed = []
        for f in frames:
            out = native.bgr_to_yuv420(f)
            if out is None:
                out = _pack_yuv420_numpy(f)
            packed.append(out)
        return np.stack(packed)

    def detect_batch_rows(self, frames: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 BGR -> (B, max_det, 7) numpy rows in capture
        coords; invalid rows are all -1."""
        t0 = time.perf_counter()
        n = frames.shape[0]
        rows = np.asarray(self.dispatch_batch(frames))[:n]  # drop mesh padding
        self.stats["last_infer_ms"] = (time.perf_counter() - t0) * 1000.0
        return rows

    def detect_batch(self, frames: np.ndarray) -> List[List[Dict[str, Any]]]:
        """Detection-dict output, reference contract
        (yolox_detector._format_model_output_to_detections:222-282)."""
        rows = self.detect_batch_rows(frames)
        return [rows_to_detections(r) for r in rows]

    def detect(self, frame: np.ndarray) -> List[Dict[str, Any]]:
        return self.detect_batch(frame[None])[0]

    def warmup(self, batches: Sequence[int] = (1,),
               capture_hw: Optional[Tuple[int, int]] = None) -> None:
        hw = capture_hw or self.spec.input_hw
        for b in batches:
            self.detect_batch_rows(np.zeros((b, *hw, 3), np.uint8))

    def get_stats(self) -> Dict[str, Any]:
        return dict(self.stats)


def _pack_yuv420_numpy(frame: np.ndarray) -> np.ndarray:
    """Full-range BT.601 BGR -> planar I420 (numpy fallback packer)."""
    h, w, _ = frame.shape
    f = frame.astype(np.float32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) * 0.564 + 128.0
    v = (r - y) * 0.713 + 128.0
    out = np.empty((h * 3 // 2, w), np.uint8)
    out[:h] = np.clip(y + 0.5, 0, 255).astype(np.uint8)
    u_sub = np.clip(u[0::2, 0::2] + 0.5, 0, 255).astype(np.uint8)
    v_sub = np.clip(v[0::2, 0::2] + 0.5, 0, 255).astype(np.uint8)
    out[h:h + h // 4] = u_sub.reshape(h // 4, w)
    out[h + h // 4:] = v_sub.reshape(h // 4, w)
    return out


def rows_to_detections(rows: np.ndarray) -> List[Dict[str, Any]]:
    """(max_det, 7) device rows -> list of reference-format detection dicts:
    {class_id, class_name, confidence, bbox{x1,y1,x2,y2,width,height,area}}."""
    dets: List[Dict[str, Any]] = []
    for row in rows:
        if row[5] < 0:  # invalid marker
            continue
        x1, y1, x2, y2, obj_c, cls_c, cid = (float(v) for v in row)
        class_id = int(cid)
        w, h = x2 - x1, y2 - y1
        dets.append({
            "class_id": class_id,
            "class_name": class_name(class_id),
            "confidence": obj_c * cls_c,
            "objectness": obj_c,
            "class_confidence": cls_c,
            "bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2,
                     "width": w, "height": h, "area": w * h},
        })
    return dets
