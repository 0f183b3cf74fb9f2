"""AOT serving artifacts: freeze the fused detector program to disk.

`jax.export` serializes the traced program (StableHLO + calling
convention) so a deployment can serve WITHOUT the model-building Python
(Flax modules, decode/NMS code) on the serving host — the analog of the
reference shipping a compiled TensorRT engine
(tools/convert_yolox_to_tensorrt.py) instead of the YOLOX repo. Unlike
TensorRT engines the artifact is weight-AGNOSTIC: parameters stay call
arguments, so one artifact serves any checkpoint of the same variant and
weight hot-swap still works.

Scope: the PLAIN program variants (one blob per batch bucket) — uint8
frames in, fixed-shape detection rows out, per-class filter arrays as
runtime arguments. The delta-transfer and device-gate variants carry
host-side state machines (reference frames, gate state, lane schedules)
that belong to the framework runtime, not a frozen graph; deployments
needing those serve through DetectorProgram itself (plus
tools/warm_compile_cache.py for cold-start).

Artifact layout (a directory):
  manifest.json          spec fields, batches, shapes, jax version
  detector_b{N}.jaxexport  serialized exported program per batch bucket
  weights.msgpack        (optional, --include-weights) flax variables
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Sequence, Tuple

from telescope_cam_detection_tpu.runtime.program import DetectorDispatchTail

import jax
import numpy as np

logger = logging.getLogger(__name__)

MANIFEST = "manifest.json"
_FORMAT_VERSION = 1


def _arg_specs(program, batch: int, frames_hw: Tuple[int, int]):
    """ShapeDtypeStructs mirroring the plain dispatch_batch call layout:
    (variables, frames_u8, class_conf, min_area, max_area, class_allowed)."""
    import jax.numpy as jnp
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype),
        program.variables)
    frames_spec = jax.ShapeDtypeStruct((batch, *frames_hw, 3), jnp.uint8)
    f = program._filter_arrays
    filt = tuple(jax.ShapeDtypeStruct(np.shape(a), a.dtype)
                 for a in (f["class_conf"], f["min_area"], f["max_area"],
                           f["class_allowed"]))
    return (var_spec, frames_spec, *filt)


def export_detector(program, out_dir: str,
                    batches: Sequence[int] = (1, 4, 8),
                    capture_hw: Optional[Tuple[int, int]] = None,
                    platforms: Optional[Sequence[str]] = None,
                    include_weights: bool = False) -> Dict[str, Any]:
    """Export a DetectorProgram's plain variants; returns the manifest.

    capture_hw: frame resolution baked into the artifact. With
    ``transfer="device"`` the in-graph resize handles any capture size;
    otherwise frames must already be at the model input size (the host
    resize that dispatch_batch would do is outside the frozen graph).

    platforms: e.g. ["tpu"], ["tpu", "cpu"] for a multi-platform blob;
    default is the exporting process's backend.
    """
    spec = program.spec
    if spec.transfer == "delta":
        raise ValueError(
            "delta transfer keeps per-stream reference state on the host "
            "runtime and cannot be frozen; export with transfer='device' "
            "or 'auto'")
    if spec.transfer == "yuv420":
        raise ValueError(
            "yuv420 transfer expects host-packed planar frames produced by "
            "the runtime's dispatch path, not the (B, H, W, 3) uint8 layout "
            "an artifact serves; export with transfer='device' or 'auto'")
    if spec.gates == "device":
        raise ValueError(
            "device gates carry HBM gate state managed by the host "
            "runtime; export a gates='none' program")
    if capture_hw is not None and spec.transfer != "device":
        raise ValueError(
            f"capture_hw is only meaningful with transfer='device' (the "
            f"in-graph resize); this spec's transfer={spec.transfer!r} "
            f"serves frames already at input size {spec.input_hw}")
    frames_hw = (tuple(capture_hw) if capture_hw is not None
                 else spec.input_hw)

    os.makedirs(out_dir, exist_ok=True)
    entries = {}
    for batch in sorted(set(int(b) for b in batches)):
        fn = program._get_program(batch, frames_hw)
        exp = jax.export.export(fn, platforms=platforms)(
            *_arg_specs(program, batch, frames_hw))
        blob = exp.serialize()
        name = f"detector_b{batch}.jaxexport"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        entries[str(batch)] = {"file": name, "bytes": len(blob)}
        logger.info("exported batch-%d program: %d bytes", batch, len(blob))

    manifest = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms
        else [jax.default_backend()],
        "detector_type": spec.detector_type,
        "variant": spec.variant,
        "input_hw": list(spec.input_hw),
        "frames_hw": list(frames_hw),
        "transfer": spec.transfer,
        "max_det": spec.max_det,
        "num_classes": spec.num_classes,
        "batches": entries,
        "weights": "weights.msgpack" if include_weights else None,
    }
    if include_weights:
        from telescope_cam_detection_tpu.models.convert import save_variables
        save_variables(program.variables,
                       os.path.join(out_dir, "weights.msgpack"))
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class AotDetector:
    """Serve detection rows from an exported artifact — no model code.

    ``call(variables, frames_u8)`` picks the smallest exported batch
    bucket that fits (padding with blank frames whose rows come back
    invalid) and returns the fixed-shape rows array for the real frames.
    """

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported artifact format "
                f"{self.manifest.get('format_version')!r}")
        self._fns = {}
        for batch, entry in self.manifest["batches"].items():
            with open(os.path.join(artifact_dir, entry["file"]), "rb") as f:
                self._fns[int(batch)] = jax.export.deserialize(f.read()).call
        if not self._fns:
            raise ValueError("artifact exports no batch buckets")
        self.variables = None
        if self.manifest.get("weights"):
            from telescope_cam_detection_tpu.models.convert import (
                load_variables)
            self.variables = load_variables(
                os.path.join(artifact_dir, self.manifest["weights"]))

    @property
    def batches(self):
        return sorted(self._fns)

    def call(self, variables: Any, frames_u8: np.ndarray,
             class_conf: Any, min_area: Any, max_area: Any,
             class_allowed: Any):
        n = frames_u8.shape[0]
        fit = [b for b in self.batches if b >= n]
        if not fit:
            raise ValueError(
                f"batch {n} exceeds largest exported bucket "
                f"{self.batches[-1]}")
        bucket = fit[0]
        if bucket != n:
            pad = np.zeros((bucket - n, *frames_u8.shape[1:]), np.uint8)
            frames_u8 = np.concatenate([frames_u8, pad])
        rows = self._fns[bucket](variables, frames_u8, class_conf,
                                 min_area, max_area, class_allowed)
        return rows[:n]


class AotDetectorProgram(DetectorDispatchTail):
    """DetectorProgram-compatible serving front over an exported artifact —
    the deployment path behind config ``detection.artifact_dir`` (the analog
    of the reference loading a prebuilt TensorRT engine at startup,
    yolox_detector.py:152-184): the engines/coordinator drive the frozen
    program exactly like a live-traced one, including hot-reloadable filter
    arrays and weight hot-swap (weights stay call arguments).

    Plain-variant scope (matching export_detector): no device gates, no
    delta/yuv transfer, single chip. Host resize still applies when capture
    resolution exceeds the model input (transfer auto/host); rows scale back
    to capture coordinates on readback, so the detection contract is
    identical to the live program's.
    """

    _SCALED_MARK = "aot-rows"

    def __init__(self, artifact_dir: str, spec=None, variables=None,
                 seed: int = 0):
        from telescope_cam_detection_tpu.runtime.program import (
            FilterSettings, ProgramSpec)
        self.aot = AotDetector(artifact_dir)
        man = self.aot.manifest
        self.spec = ProgramSpec(
            detector_type=man["detector_type"], variant=man["variant"],
            num_classes=int(man["num_classes"]),
            input_hw=tuple(man["input_hw"]), max_det=int(man["max_det"]),
            transfer=man["transfer"])
        if spec is not None:
            # compiled-in fields of the configured spec must match the
            # artifact — serving a 640-program for a 1280 config would emit
            # silently wrong boxes
            for field in ("detector_type", "variant", "num_classes",
                          "input_hw", "max_det"):
                want, have = getattr(spec, field), getattr(self.spec, field)
                if tuple(np.atleast_1d(want)) != tuple(np.atleast_1d(have)):
                    raise ValueError(
                        f"artifact/config mismatch on {field}: artifact has "
                        f"{have!r}, config wants {want!r}")
        self.frames_hw = tuple(man["frames_hw"])
        if variables is None:
            variables = self.aot.variables
        if variables is None:
            # weight-agnostic artifact and no checkpoint configured: random
            # init (explicit opt-in, same warning contract as
            # DetectorProgram) — needs the model code, which this framework
            # install has even though the frozen graph doesn't
            logger.warning("AotDetectorProgram: random-init weights "
                           "(artifact bundles none, no checkpoint given)")
            if self.spec.detector_type == "yolox":
                from telescope_cam_detection_tpu.models import yolox as ylib
                _, variables = ylib.init_yolox(
                    self.spec.variant, self.spec.num_classes,
                    self.spec.input_hw, seed)
            else:
                from telescope_cam_detection_tpu.models import rtdetr as rlib
                _, variables = rlib.init_rtdetr(
                    self.spec.variant, self.spec.num_classes,
                    self.spec.input_hw, seed)
        self.variables = variables
        self.mesh = None
        self._filters = FilterSettings()
        self._filter_arrays = self._filters.to_arrays(self.spec.num_classes)
        self.stats: Dict[str, Any] = {"compilations": 0, "batches": 0,
                                      "frames": 0, "last_infer_ms": 0.0,
                                      "artifact_batches": self.aot.batches}

    # -- hot reload (same contract as DetectorProgram) -----------------------
    def update_filters(self, settings) -> None:
        self._filters = settings
        self._filter_arrays = settings.to_arrays(self.spec.num_classes)

    @property
    def filters(self):
        return self._filters

    def lane_for_stream(self, stream_id: str) -> int:
        return 0   # plain variants carry no per-stream device state

    # -- dispatch -------------------------------------------------------------
    def dispatch_batch(self, frames, lanes=None, capture_hw=None):
        if isinstance(frames, (list, tuple)):
            frames = np.stack(frames)
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(
                f"expected (B,H,W,3) uint8 frames, got {frames.shape}")
        hw = (frames.shape[1], frames.shape[2])
        if capture_hw is None:
            capture_hw = hw
        scale = None
        if self.spec.transfer == "device":
            if hw != self.frames_hw:
                raise ValueError(
                    f"device-transfer artifact is frozen for capture "
                    f"{self.frames_hw}, got {hw}")
        elif hw != self.spec.input_hw:
            import cv2
            ih, iw = self.spec.input_hw
            frames = np.stack([
                cv2.resize(f, (iw, ih), interpolation=cv2.INTER_LINEAR)
                for f in frames])
            capture_hw = hw
        if tuple(capture_hw) != self.spec.input_hw \
                and self.spec.transfer != "device":
            ch, cw = capture_hw
            ih, iw = self.spec.input_hw
            # frozen graph reports input-coord boxes; restore capture coords
            scale = np.asarray([cw / iw, ch / ih, cw / iw, ch / ih],
                               np.float32)
        f = self._filter_arrays
        rows = self.aot.call(self.variables, frames, f["class_conf"],
                             f["min_area"], f["max_area"],
                             f["class_allowed"])
        self.stats["batches"] += 1
        self.stats["frames"] += frames.shape[0]
        return (self._SCALED_MARK, rows, scale)

    def materialize(self, handle, n: int):
        _, rows, scale = handle
        rows = np.asarray(rows)[:n]
        if scale is not None:
            valid = rows[..., 5] >= 0
            rows = rows.copy()
            rows[..., :4] = np.where(valid[..., None],
                                     rows[..., :4] * scale, rows[..., :4])
        return rows, None

    def _warmup_hw(self):
        return self.frames_hw
