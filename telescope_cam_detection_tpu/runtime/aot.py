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
