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
    # slight chroma loss — opt-in, breaks bit-parity with the reference);
    # "delta" ships only changed 16x16 tiles against a device-resident
    # per-stream reference frame (ops/delta.py, runtime/delta.py) — the
    # right mode when the link is RTT/bandwidth bound and scenes are
    # quasi-static (surveillance); bounded error <= delta_threshold grey
    # levels on unsent tiles, rolling full refresh.
    transfer: str = "auto"   # "auto" | "device" | "host" | "yuv420" | "delta"
    # Compact the result readback to the top-K valid rows on device before
    # shipping (max_det rows are mostly invalid padding; K=None disables).
    # Valid rows always outrank invalid ones; within valid, score-descending.
    readback_topk: Optional[int] = None
    delta_tile: int = 16
    delta_threshold: int = 14
    delta_refresh_tiles: int = 16
    delta_lanes: int = 8                  # max concurrent streams in delta mode
    # Delta payload space: "rgb" ships raw tiles (exact reconstruction;
    # fastest when the link overlaps transfer under compute — measured best
    # on this environment's relay). "yuv420" ships planar 4:2:0 records —
    # half the bytes, for links where bandwidth (not host encode) binds;
    # same chroma tradeoff as the full-frame yuv420 mode, and mirror
    # semantics stay exact because both sides hold identical YUV bytes.
    delta_payload: str = "rgb"
    # RT-DETR deformable-attention sampling: "auto" (pallas on TPU, xla
    # elsewhere — gathers are ~24x slower on TPU at high res), "xla", or
    # "pallas" (ops/pallas_deform.py). Ignored for yolox.
    sampling_impl: str = "auto"
    # YOLOX NMS suppression backend (ops/nms.py batched_nms impl): "auto"
    # resolves to the measured winner on this hardware (xla fixpoint;
    # docs/PERFORMANCE.md NMS row). "pallas" keeps the IoU matrix
    # VMEM-resident (ops/pallas_nms.py).
    nms_impl: str = "auto"
    # Fused motion gates (SURVEY §7): "device" keeps per-lane empty-frame
    # diff state AND the MOG2 color background model resident in HBM inside
    # THIS program — one dispatch returns (rows, gate aux) and the host
    # gates cost zero CPU ms and zero extra dispatches. The reference runs
    # both as per-frame host cv2 calls (empty_frame_filter.py:51-98,
    # motion_filter.py:56-127). "none" leaves gating to the host pipeline.
    gates: str = "none"                   # "none" | "device"
    gate_lanes: int = 8                   # per-stream state lanes (gates)
    gate_blur_size: int = 21              # empty-gate Gaussian blur (static)
    gate_motion_blur_size: int = 21       # MOG2 mask cleanup blur (static)


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




def _compact_rows(rows: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, D, 7) -> (B, k, 7): keep the k best rows, valid-first then by
    score (invalid rows are all -1, so obj*cls would be +1 — mask them)."""
    valid = rows[..., 5] >= 0.0
    score = jnp.where(valid, rows[..., 4] * rows[..., 5], -1.0)
    _, order = jax.lax.top_k(score, k)
    return jnp.take_along_axis(rows, order[..., None], axis=1)

class DetectorDispatchTail:
    """Blocking-call surface shared by every detector program flavor.

    Implemented purely over the duck-typed ``dispatch_batch``/
    ``materialize`` pair plus a ``stats`` dict and ``_warmup_hw()`` hook,
    so the live-traced ``DetectorProgram`` and the frozen
    ``runtime.aot.AotDetectorProgram`` present one contract to the
    coordinator/engine without duplicating (and drifting) these tails."""

    def detect_batch_rows(self, frames: np.ndarray,
                          lanes: Optional[Sequence[int]] = None) -> np.ndarray:
        """(B, H, W, 3) uint8 BGR -> (B, max_det, 7) numpy rows in capture
        coords; invalid rows are all -1. (Gate aux, if any, is dropped —
        use detect_batch_gated to consume it.)"""
        return self.detect_batch_gated(frames, lanes=lanes)[0]

    def detect_batch_gated(
        self, frames: np.ndarray,
        lanes: Optional[Sequence[int]] = None,
        capture_hw: Optional[Tuple[int, int]] = None,
    ) -> Tuple[np.ndarray, Optional[Dict[str, np.ndarray]]]:
        """Blocking dispatch returning (rows, gate aux or None)."""
        t0 = time.perf_counter()
        n = len(frames)
        rows, aux = self.materialize(
            self.dispatch_batch(frames, lanes=lanes, capture_hw=capture_hw),
            n)
        self.stats["last_infer_ms"] = (time.perf_counter() - t0) * 1000.0
        return rows, aux

    def detect_batch(self, frames: np.ndarray,
                     lanes: Optional[Sequence[int]] = None,
                     ) -> List[List[Dict[str, Any]]]:
        """Detection-dict output, reference contract
        (yolox_detector._format_model_output_to_detections:222-282)."""
        rows = self.detect_batch_rows(frames, lanes=lanes)
        return [rows_to_detections(r) for r in rows]

    def detect(self, frame: np.ndarray) -> List[Dict[str, Any]]:
        return self.detect_batch(frame[None])[0]

    def warmup(self, batches: Sequence[int] = (1,),
               capture_hw: Optional[Tuple[int, int]] = None) -> None:
        hw = capture_hw or self._warmup_hw()
        for b in batches:
            self.detect_batch_rows(np.zeros((b, *hw, 3), np.uint8))

    def get_stats(self) -> Dict[str, Any]:
        return dict(self.stats)


class DetectorProgram(DetectorDispatchTail):
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
        # fail at STARTUP on config typos: an unknown value would otherwise
        # surface only at first dispatch, where the fail-soft coordinator
        # converts it into perpetual empty-result batches from a "healthy"
        # service
        if spec.transfer not in ("auto", "device", "host", "yuv420", "delta"):
            raise ValueError(f"unknown transfer mode {spec.transfer!r}")
        if spec.delta_payload not in ("rgb", "yuv420"):
            raise ValueError(f"unknown delta_payload {spec.delta_payload!r} "
                             "(valid: rgb, yuv420)")
        if spec.sampling_impl not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown sampling_impl {spec.sampling_impl!r}")
        if spec.nms_impl not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown nms_impl {spec.nms_impl!r}")
        if spec.gates not in ("none", "device"):
            raise ValueError(f"unknown gates mode {spec.gates!r} "
                             "(valid: none, device)")
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
        self._compiled: Dict[Tuple, Callable] = {}
        self.stats: Dict[str, Any] = {"compilations": 0, "batches": 0,
                                      "frames": 0, "last_infer_ms": 0.0,
                                      "delta_tiles_sent": 0,
                                      # synthetic blank frames added by the
                                      # mesh shard layout (zero for balanced
                                      # camera traffic — VERDICT r3 weak #4)
                                      "pad_frames": 0}
        # optional fused Stage-2 (attach_classifier): classifier model +
        # params classified INSIDE the gated program
        self._stage2: Optional[Dict[str, Any]] = None
        # stream lanes: shared registry for delta transfer AND device gates
        # (both key per-stream device state by the same lane index)
        import threading
        self._n_lanes = (spec.delta_lanes if spec.transfer == "delta"
                         else spec.gate_lanes)
        # dp size of the mesh (1 single-chip). Per-lane device state (delta
        # reference frames, gate mixtures) shards its LANE axis over dp —
        # cameras across chips, the SURVEY §2.4 scale-out — so the lane
        # count must divide evenly and every batch entry must execute on
        # the shard owning its lane's state (_shard_layout).
        if mesh is not None:
            from telescope_cam_detection_tpu.parallel.mesh import DATA_AXIS
            self._dp = int(mesh.shape[DATA_AXIS])
            if (spec.gates == "device" or spec.transfer == "delta") and \
                    self._n_lanes % self._dp:
                raise ValueError(
                    f"lanes ({self._n_lanes}) must divide the mesh dp axis "
                    f"({self._dp}) so per-stream device state shards evenly")
        else:
            self._dp = 1
        self._delta_lock = threading.RLock()   # guards lanes + device state
        self._lane_registry: Dict[str, int] = {}
        # multi-process placement cache: replicated copies of weights /
        # filter arrays as global jax.Arrays (see _mp_replicated)
        self._mp_cache: Dict[str, Tuple[Any, Any]] = {}
        if spec.gates == "device":
            # per-(frame resolution) gate state; resolutions share lanes
            self._gate_states: Dict[Tuple[int, int], Any] = {}
            self._gate_params = jnp.asarray(
                [25.0, 16.0, 1.0 / 500.0, 0.5, 1.0], jnp.float32)
        if spec.transfer == "delta":
            from telescope_cam_detection_tpu.ops.delta import tiled_shape
            self._delta_ref_shape = tiled_shape(
                spec.input_hw, spec.delta_tile, spec.delta_lanes,
                spec.delta_payload)
            self._delta_ref = None          # lazily placed on device
            self._delta_encoders: Dict[int, Any] = {}
            self._encode_pool_obj = None

    def reset_delta_state(self) -> None:
        """Drop all delta-transfer state (host mirrors + device reference):
        the next dispatch per lane is a full refresh. Used by benches to
        replay identical encoder state across passes, and available to
        operators after a camera swap."""
        with self._delta_lock:
            self._delta_encoders.clear()
            self._delta_ref = None

    def lane_for_stream(self, stream_id: str) -> int:
        """Deterministic registration-order lane for a stream (delta
        transfer and/or device gates). Shared by the coordinator and
        standalone engines so every consumer of this program agrees on lane
        ownership; wraps (with a warning) when there are more streams than
        lanes."""
        with self._delta_lock:
            lane = self._lane_registry.get(stream_id)
            if lane is None:
                lane = len(self._lane_registry) % self._n_lanes
                self._lane_registry[stream_id] = lane
                if len(self._lane_registry) > self._n_lanes:
                    logger.warning(
                        "more streams (%d) than state lanes (%d); lane %d is "
                        "shared and will thrash its per-stream device state",
                        len(self._lane_registry), self._n_lanes, lane)
            return lane

    # -- mesh (multi-chip) helpers --------------------------------------------
    def _lane_state_sharding(self):
        """NamedSharding for per-lane device state pytrees: the lane axis
        (axis 0 of every leaf) sharded over dp, so each chip holds ONLY its
        cameras' gate mixtures / delta reference frames."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from telescope_cam_detection_tpu.parallel.mesh import DATA_AXIS
        return NamedSharding(self.mesh, P(DATA_AXIS))

    # -- multi-process (multi-host) placement --------------------------------
    # A mesh whose devices span >1 jax process (jax.distributed cluster:
    # one process per host, DCN between hosts) cannot take plain host
    # numpy arrays as jitted-program arguments — every argument must be a
    # GLOBAL jax.Array each process contributes its addressable shards to.
    # These helpers build them: dp-sharded inputs from process-LOCAL data
    # (each host dispatches its own cameras' frames), replicated weights /
    # runtime thresholds from identical per-process host values, and
    # lane-sharded state from deterministic init. The serving contract in
    # parallel/distributed.py:12-16 rides on this.

    def _mp_active(self) -> bool:
        return self.mesh is not None and jax.process_count() > 1

    def _mp_from_full(self, full, sharding):
        """Full (identical-on-every-process) host value -> global Array."""
        full = np.asarray(jax.device_get(full))
        return jax.make_array_from_callback(
            full.shape, sharding, lambda idx: full[idx])

    def _mp_replicated(self, key: str, tree):
        """Replicate a pytree mesh-wide, cached by object identity: weights
        re-place only on hot swap, filter arrays only on update_filters."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        ent = self._mp_cache.get(key)
        if ent is not None and ent[0] is tree:
            return ent[1]
        rep = NamedSharding(self.mesh, P())
        placed = jax.tree.map(lambda x: self._mp_from_full(x, rep), tree)
        self._mp_cache[key] = (tree, placed)
        return placed

    def _mp_sharded(self, local) -> Any:
        """Process-local rows (this host's slice of the batch axis) ->
        global dp-sharded Array. Every process must pass the same local
        shape (balanced camera traffic — the coordinator's round-robin)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from telescope_cam_detection_tpu.parallel.mesh import DATA_AXIS
        local = np.asarray(local)
        sh = NamedSharding(self.mesh,
                           P(DATA_AXIS, *([None] * (local.ndim - 1))))
        return jax.make_array_from_process_local_data(sh, local)

    def _mp_local_rows(self, garr, sel: Optional[np.ndarray] = None,
                       n: Optional[int] = None):
        """Global batch-sharded result -> THIS process's rows (its own
        cameras), optionally un-permuted through a local sel."""
        shards = sorted(garr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        local = np.concatenate([np.asarray(s.data) for s in shards])
        if sel is not None:
            local = local[sel[:n]] if n is not None else local[sel]
        elif n is not None:
            local = local[:n]
        return local

    def _shard_layout(self, lane_list: Sequence[int]):
        """Order a batch into dp-shard layout: entries grouped by the shard
        owning their lane's state (shard = lane // (n_lanes/dp)), every
        group padded to one power-of-two length so the compiled batch shape
        stays bucketed. Caller-provided pads (lane < 0) are reused as group
        fillers before any synthetic pad is added.

        Returns (order, sel): ``order[j]`` = original position of layout
        row j (-1 = synthetic pad frame), ``sel[i]`` = layout row of
        original position i (np.int32, for un-permuting the readback).
        Balanced camera traffic at a dp-multiple bucket is the identity
        permutation with zero synthetic pads."""
        dp = self._dp
        per_shard_lanes = self._n_lanes // dp
        groups: List[List[int]] = [[] for _ in range(dp)]
        pad_positions: List[int] = []
        for pos, lane in enumerate(lane_list):
            if lane < 0:
                pad_positions.append(pos)
            else:
                groups[lane // per_shard_lanes].append(pos)
        for pos in pad_positions:  # fillers for the lightest groups
            min(groups, key=len).append(pos)
        per = max(max(len(g) for g in groups), 1)
        per = 1 << (per - 1).bit_length()   # pow2: bounded compile variants
        order: List[int] = []
        for g in groups:
            order.extend(g)
            order.extend([-1] * (per - len(g)))
        sel = np.empty(len(lane_list), np.int32)
        for j, pos in enumerate(order):
            if pos >= 0:
                sel[pos] = j
        return order, sel

    def _shard_map_gated(self, body: Callable, n_extra: int) -> Callable:
        """Wrap a gated program body (variables, gate_state, frames, lanes,
        gate_params, 4x filter arrays, *extra) in shard_map over dp: batch,
        lanes and the per-lane gate state shard over dp; everything else
        (weights, runtime thresholds) replicates. The body is embarrassingly
        parallel — each chip detects+gates its own cameras' frames against
        its own slice of the state, zero collectives in steady state (the
        TPU answer to scaling shared_inference_coordinator.py:27 beyond one
        device)."""
        from jax.sharding import PartitionSpec as P
        from telescope_cam_detection_tpu.parallel.mesh import DATA_AXIS
        dp, rep = P(DATA_AXIS), P()
        in_specs = (rep, dp, dp, dp, rep, rep, rep, rep, rep) + \
            (rep,) * n_extra
        # check_vma off: the body is collective-free (each shard gates its
        # own cameras) and its scan carries start as unvarying zeros, which
        # the varying-manual-axes checker rejects
        return jax.shard_map(body, mesh=self.mesh, in_specs=in_specs,
                             out_specs=(dp, dp), check_vma=False)

    def _shard_map_delta(self, body: Callable, gated: bool,
                         n_extra: int) -> Callable:
        """shard_map wrapper for delta-mode bodies. Ungated layout:
        (variables, ref, lanes, tile_idx, tiles, 4x filters); gated adds
        gate_state after ref and gate_lanes after lanes, plus *extra
        (fused Stage-2 weights). ref + gate state shard their lane axis,
        per-frame payloads shard the batch axis, weights replicate."""
        from jax.sharding import PartitionSpec as P
        from telescope_cam_detection_tpu.parallel.mesh import DATA_AXIS
        dp, rep = P(DATA_AXIS), P()
        if gated:
            in_specs = (rep, dp, dp, dp, dp, dp, dp, rep,
                        rep, rep, rep, rep) + (rep,) * n_extra
            out_specs = (dp, dp, dp)
        else:
            in_specs = (rep, dp, dp, dp, dp, rep, rep, rep, rep)
            out_specs = (dp, dp)
        # check_vma off — same rationale as _shard_map_gated
        return jax.shard_map(body, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    def _localize_lanes(self, lanes: jnp.ndarray) -> jnp.ndarray:
        """Inside a shard_map body: global lane ids -> this shard's local
        ids; lanes owned by other shards (and pads, lane<0) become -1 so
        their state updates drop and their rows invalidate."""
        from telescope_cam_detection_tpu.parallel.mesh import DATA_AXIS
        per = self._n_lanes // self._dp
        lo = jax.lax.axis_index(DATA_AXIS) * per
        return jnp.where((lanes >= lo) & (lanes < lo + per), lanes - lo, -1)

    def _mesh_chain_shape(self, layout_lanes: Sequence[int]) -> Tuple[int, int]:
        """Static (rounds, round_width) covering the WORST shard's gate
        chain: under shard_map every shard runs the same compiled body on
        its local slice of the layout, so the schedule must fit the busiest
        group (chain_shape quantizes per group, capped at the local batch)."""
        from telescope_cam_detection_tpu.ops.motion import chain_shape
        per = len(layout_lanes) // self._dp
        rounds = width = 1
        for s in range(self._dp):
            r, w = chain_shape(layout_lanes[s * per:(s + 1) * per])
            rounds, width = max(rounds, r), max(width, w)
        return rounds, width

    def _apply_shard_layout(self, frames, lane_list: Sequence[int],
                            pad_hw: Tuple[int, int]):
        """Reorder a batch (frames indexable by position; ndarray or list)
        into dp-shard layout. Returns (layout_frames: list, layout_lanes:
        List[int], sel) — synthetic pads are blank input-sized frames with
        lane -1 (their rows invalidate on device; they never touch state or
        fused Stage-2 slots)."""
        order, sel = self._shard_layout(lane_list)
        blank = None
        lay_frames: List[np.ndarray] = []
        lay_lanes: List[int] = []
        pads = 0
        for pos in order:
            if pos >= 0:
                lay_frames.append(frames[pos])
                lay_lanes.append(int(lane_list[pos]))
            else:
                if blank is None:
                    blank = np.zeros((*pad_hw, 3), np.uint8)
                lay_frames.append(blank)
                lay_lanes.append(-1)
                pads += 1
        self.stats["pad_frames"] += pads
        return lay_frames, lay_lanes, sel

    def _new_delta_ref(self):
        if self._mp_active():   # each process allocates only its shards
            return self._mp_from_full(
                np.zeros(self._delta_ref_shape, np.uint8),
                self._lane_state_sharding())
        ref = jnp.zeros(self._delta_ref_shape, jnp.uint8)
        if self.mesh is not None:   # lane axis sharded over dp
            ref = jax.device_put(ref, self._lane_state_sharding())
        return ref

    # -- fused Stage-2 -------------------------------------------------------
    def attach_classifier(self, model, variables, input_size: int,
                          max_crops: int = 4, top_k: int = 10,
                          crop_padding_percent: float = 20.0,
                          classify_class_ids=None,
                          min_crop_size: float = 0.0) -> None:
        """Fuse the Stage-2 species classifier INTO the gated program: the
        top `max_crops` rows are ROI-sampled from the dispatched frames and
        classified in the SAME dispatch, under ``lax.cond`` so empty frames
        skip the classifier compute entirely. One dispatch, one packed
        readback carries rows + gate aux + per-crop top-k species — the
        reference pays a second full host->device round trip per
        detection-bearing frame (two_stage_pipeline_yolox.py:475-481).

        Requires gates='device' (the packed-readback path). Classifier
        weights are a dispatch argument, so swapping them never recompiles.

        classify_class_ids / min_crop_size: host Stage-2 eligibility rules
        (CLASS_ID_TO_CATEGORY routing + minimum crop side) applied ON
        DEVICE when selecting which rows take the max_crops classification
        slots, so ineligible or invalidated rows never displace an eligible
        detection from the classified window. The selected row indices ride
        the packed readback (species_row/species_valid aux) so the host can
        map each crop's top-k back to its detection regardless of ordering.
        """
        if self.spec.gates != "device":
            raise ValueError("attach_classifier requires gates='device'")
        class_mask = None
        if classify_class_ids is not None:
            ids = [int(i) for i in classify_class_ids]
            n = max(NUM_COCO_CLASSES, (max(ids) + 1) if ids else 0)
            class_mask = np.zeros((n,), bool)
            for i in ids:
                class_mask[i] = True
        # a fine-tuned head may have fewer classes than the top-k window
        top_k = min(int(top_k), int(getattr(model, "num_classes", top_k)))
        self._stage2 = {
            "model": model, "variables": variables, "size": int(input_size),
            "max_crops": int(max_crops), "top_k": top_k,
            "pad_pct": float(crop_padding_percent),
            "class_mask": class_mask,
            "min_crop": float(min_crop_size),
        }
        self._compiled.clear()   # programs rebuild with the stage-2 tail

    def update_classifier_weights(self, variables) -> None:
        """Swap the fused Stage-2 classifier weights live: they ride every
        dispatch as an argument, so no program recompiles and in-flight
        batches finish on the old tree. No-op when Stage-2 is not fused."""
        if self._stage2 is not None:
            self._stage2["variables"] = variables

    def _stage2_tail(self, capture_hw: Tuple[int, int]) -> Callable:
        """(s2_vars, frames_bgr, rows) -> (top_p (B,C,K), top_i (B,C,K)).
        Same crop/preprocess math as SpeciesClassifier.classify_boxes_device
        (boxes_with_padding percentage padding + frame clamp; sample_crops
        half-pixel ROI bilinear; CLIP normalize)."""
        s2 = self._stage2
        model, size = s2["model"], s2["size"]
        n_crops, top_k = s2["max_crops"], s2["top_k"]
        pad = s2["pad_pct"] / 100.0
        ch, cw = capture_hw
        from telescope_cam_detection_tpu.ops.crops import sample_crops
        from telescope_cam_detection_tpu.ops.preprocess import (
            CLIP_MEAN, CLIP_STD)
        mean = np.asarray(CLIP_MEAN, np.float32)
        inv_std = 1.0 / np.asarray(CLIP_STD, np.float32)

        class_mask = s2["class_mask"]
        min_crop = s2["min_crop"]

        def tail(s2_vars, frames_bgr, rows):
            b = rows.shape[0]
            fh, fw = frames_bgr.shape[1:3]
            to_mask = np.asarray([fw / cw, fh / ch, fw / cw, fh / ch],
                                 np.float32)
            # eligibility-aware slot selection: the host filter invalidates
            # rows IN PLACE (score order, not valid-first), so taking the
            # first C slots would let invalidated or non-classifiable rows
            # displace an eligible detection from the classified window
            elig = rows[..., 5] >= 0
            if class_mask is not None:
                cls = jnp.clip(rows[..., 6].astype(jnp.int32), 0,
                               class_mask.shape[0] - 1)
                elig &= jnp.asarray(class_mask)[cls]
            if min_crop > 0:
                # capture-coord box sides, same units as the host's
                # min_crop_size gate (two_stage extract_crop operates on
                # capture-resolution frames)
                elig &= jnp.minimum(rows[..., 2] - rows[..., 0],
                                    rows[..., 3] - rows[..., 1]) >= min_crop
            sel_score = jnp.where(elig, rows[..., 4] * rows[..., 5], -1.0)
            _, order = jax.lax.top_k(sel_score, n_crops)   # (B, C)
            sel = jnp.take_along_axis(rows, order[..., None], axis=1)
            valid = jnp.take_along_axis(elig, order, axis=1)
            boxes = sel[..., :4] * to_mask               # frame coords
            x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
            bw = jnp.maximum(x2 - x1, 1.0)
            bh = jnp.maximum(y2 - y1, 1.0)
            px1 = jnp.maximum(x1 - bw * pad / 2, 0.0)
            py1 = jnp.maximum(y1 - bh * pad / 2, 0.0)
            px2 = jnp.minimum(x2 + bw * pad / 2, float(fw))
            py2 = jnp.minimum(y2 + bh * pad / 2, float(fh))
            bidx = jnp.broadcast_to(
                jnp.arange(b, dtype=jnp.float32)[:, None], (b, n_crops))
            flat = jnp.stack([bidx, px1, py1, px2, py2],
                             axis=-1).reshape(b * n_crops, 5)

            def classify(_):
                crops = sample_crops(frames_bgr, flat, (size, size))
                x = crops[..., ::-1] * (1.0 / 255.0)
                x = (x - mean) * inv_std
                logits = model.apply(s2_vars, x, train=False)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                p, i = jax.lax.top_k(probs, top_k)
                return p, i

            def skip(_):
                return (jnp.zeros((b * n_crops, top_k), jnp.float32),
                        jnp.zeros((b * n_crops, top_k), jnp.int32))

            # empty frames skip the classifier compute entirely
            top_p, top_i = jax.lax.cond(jnp.any(valid), classify, skip, None)
            return (top_p.reshape(b, n_crops, top_k),
                    top_i.reshape(b, n_crops, top_k),
                    order, valid)

        return tail

    # -- device gate state ---------------------------------------------------
    def _gate_state_for(self, frame_hw: Tuple[int, int]):
        """Lazily-allocated per-resolution gate state ((L, h, w) lanes);
        call under self._delta_lock."""
        state = self._gate_states.get(frame_hw)
        if state is None:
            from telescope_cam_detection_tpu.ops.motion import init_gate_state
            state = init_gate_state(frame_hw, self._n_lanes)
            if self._mp_active():
                # deterministic init: every process holds the same full
                # value; each contributes its own lane shards
                sh = self._lane_state_sharding()
                state = jax.tree.map(
                    lambda x: self._mp_from_full(x, sh), state)
            elif self.mesh is not None:
                sh = self._lane_state_sharding()
                state = jax.tree.map(lambda x: jax.device_put(x, sh), state)
            self._gate_states[frame_hw] = state
            logger.info("allocated device gate state %s x %d lanes",
                        frame_hw, self._n_lanes)
        return state

    def reset_gate_state(self) -> None:
        """Drop all device gate state: every lane relearns its background
        (used after camera swaps and by benches replaying traces)."""
        with self._delta_lock:
            self._gate_states.clear()

    def update_gate_params(self, empty_threshold: Optional[float] = None,
                           var_threshold: Optional[float] = None,
                           learning_rate: Optional[float] = None,
                           shadow_tau: Optional[float] = None,
                           detect_shadows: Optional[bool] = None) -> None:
        """Hot-reload gate thresholds — runtime arrays, never a recompile
        (mirrors the reference's motion_filter.update_params:187-244 and
        empty-filter settings)."""
        vals = np.asarray(self._gate_params, np.float32).copy()
        for idx, v in ((0, empty_threshold), (1, var_threshold),
                       (2, learning_rate), (3, shadow_tau)):
            if v is not None:
                vals[idx] = float(v)
        if detect_shadows is not None:
            vals[4] = 1.0 if detect_shadows else 0.0
        self._gate_params = jnp.asarray(vals)

    def _encode_pool(self):
        if self._encode_pool_obj is None:
            from concurrent.futures import ThreadPoolExecutor
            self._encode_pool_obj = ThreadPoolExecutor(
                max_workers=min(self.spec.delta_lanes, 8),
                thread_name_prefix="delta-encode")
        return self._encode_pool_obj

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
        if self.spec.transfer in ("host", "yuv420", "delta"):
            return capture_hw != self.spec.input_hw
        # auto: only when it shrinks the transfer
        return (capture_hw[0] * capture_hw[1] >
                self.spec.input_hw[0] * self.spec.input_hw[1])

    # -- program construction -------------------------------------------------
    def _detect_core(self, capture_hw: Tuple[int, int]) -> Callable:
        """The shared fused detect path: (variables, frames_bgr_u8, filter
        arrays) -> (B, D, 7) rows in capture coords, filtered + compacted.
        Closed over by every program variant (plain/delta x gated/ungated)."""
        spec = self.spec
        model = self.model
        sy = capture_hw[0] / spec.input_hw[0]
        sx = capture_hw[1] / spec.input_hw[1]
        back_scale = np.asarray([sx, sy, sx, sy], np.float32)

        def core(variables, frames_u8, class_conf, min_area, max_area,
                 class_allowed):
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
                    impl=spec.nms_impl,
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
            if spec.readback_topk and spec.readback_topk < spec.max_det:
                rows = _compact_rows(rows, spec.readback_topk)
            return rows

        return core

    def _gate_aux(self, capture_hw: Tuple[int, int],
                  chain: Tuple[int, int] = (0, 0)) -> Callable:
        """Fused-gate tail: run both motion gates against per-lane state and
        score the final rows' boxes against the MOG2 mask, all in the same
        XLA program. Outputs are scaled to CAPTURE-resolution pixel units so
        host thresholds (min_motion_area, min_motion_pixels) apply
        unchanged. The gate/mask resolution is the DISPATCHED frame
        resolution (input_hw after host resize, or capture_hw in device
        transfer), derived from the traced shape."""
        spec = self.spec
        from telescope_cam_detection_tpu.ops.motion import (
            batch_bbox_motion_stats, gate_step)
        ch, cw = capture_hw

        s2_tail = (self._stage2_tail(capture_hw)
                   if self._stage2 is not None else None)

        def tail(gate_state, frames_bgr, lanes, gate_params, rows,
                 s2_vars=None):
            fh, fw = frames_bgr.shape[1:3]
            to_mask = np.asarray([fw / cw, fh / ch, fw / cw, fh / ch],
                                 np.float32)
            px_scale = (ch * cw) / (fh * fw)
            new_state, g = gate_step(
                gate_state, frames_bgr, lanes, gate_params,
                blur_size=spec.gate_blur_size,
                motion_blur_size=spec.gate_motion_blur_size,
                rounds=chain[0], round_width=chain[1])
            ratios, pixels = batch_bbox_motion_stats(
                g["masks"], rows[..., :4] * to_mask)
            # pack rows + gate aux (+ fused Stage-2 results) into ONE
            # array: every device->host buffer pays a relay round trip, so
            # the gated readback must stay a SINGLE transfer like the
            # ungated one (6 separate buffers measured +600 ms/batch)
            b = rows.shape[0]
            parts = [
                rows.reshape(b, -1),
                ratios,
                pixels * px_scale,
                (g["motion_area"] * px_scale)[:, None],
                g["initialized"].astype(jnp.float32)[:, None],
                g["mean_luma"][:, None],
            ]
            if s2_tail is not None:
                top_p, top_i, s2_row, s2_valid = s2_tail(
                    s2_vars, frames_bgr, rows)
                parts += [top_p.reshape(b, -1),
                          top_i.astype(jnp.float32).reshape(b, -1),
                          s2_row.astype(jnp.float32),
                          s2_valid.astype(jnp.float32)]
            packed = jnp.concatenate(parts, axis=1)
            return new_state, packed

        return tail

    _GATED_MARK = "gated-packed"
    _ROWS_MARK = "rows-permuted"   # mesh shard-layout rows + sel un-permute

    def _unpack_gated(self, packed: np.ndarray):
        """(n, D*7 + 2D + 3 [+ 2*C*K + 2*C]) packed readback ->
        (rows, aux)."""
        spec = self.spec
        d = (spec.readback_topk
             if spec.readback_topk and spec.readback_topk < spec.max_det
             else spec.max_det)
        n = packed.shape[0]
        rows = packed[:, :d * 7].reshape(n, d, 7)
        aux = {
            "motion_ratio": packed[:, d * 7:d * 8],
            "motion_pixels": packed[:, d * 8:d * 9],
            "motion_area": packed[:, d * 9],
            "initialized": packed[:, d * 9 + 1] > 0.5,
            "mean_luma": packed[:, d * 9 + 2],
        }
        if self._stage2 is not None:
            c, k = self._stage2["max_crops"], self._stage2["top_k"]
            off = d * 9 + 3
            aux["species_prob"] = packed[:, off:off + c * k].reshape(n, c, k)
            aux["species_id"] = packed[
                :, off + c * k:off + 2 * c * k].reshape(n, c, k).astype(
                    np.int32)
            off2 = off + 2 * c * k
            aux["species_row"] = packed[:, off2:off2 + c].astype(np.int32)
            aux["species_valid"] = packed[:, off2 + c:off2 + 2 * c] > 0.5
        return rows, aux

    def _build(self, batch: int, capture_hw: Tuple[int, int],
               chain: Tuple[int, int] = (0, 0)) -> Callable:
        spec = self.spec
        core = self._detect_core(capture_hw)

        def to_bgr(frames_u8):
            if spec.transfer == "yuv420":
                from telescope_cam_detection_tpu.ops.preprocess import (
                    yuv420_to_bgr)
                return yuv420_to_bgr(frames_u8).astype(jnp.uint8)
            return frames_u8

        def program(variables, frames_u8, class_conf, min_area, max_area,
                    class_allowed):
            return core(variables, to_bgr(frames_u8), class_conf, min_area,
                        max_area, class_allowed)

        if spec.gates == "device":
            gate_tail = self._gate_aux(capture_hw, chain)
            meshed = self.mesh is not None

            def gated_program(variables, gate_state, frames_u8, lanes,
                              gate_params, class_conf, min_area,
                              max_area, class_allowed, *s2):
                # under a mesh this body runs PER SHARD (shard_map): lanes
                # localize to this shard's slice of the state, foreign/pad
                # entries become -1 (state update dropped, rows invalid)
                if meshed:
                    lanes = self._localize_lanes(lanes)
                frames_bgr = to_bgr(frames_u8)
                rows = core(variables, frames_bgr, class_conf, min_area,
                            max_area, class_allowed)
                # padding entries (lane<0) must never surface detections or
                # take fused Stage-2 classification slots (their frames are
                # blank or foreign-shard garbage)
                rows = jnp.where((lanes >= 0)[:, None, None], rows, -1.0)
                return gate_tail(gate_state, frames_bgr, lanes,
                                 gate_params, rows, *s2)

            if meshed:
                gated_program = self._shard_map_gated(
                    gated_program, n_extra=(1 if self._stage2 is not None
                                            else 0))
            jitted = jax.jit(gated_program, donate_argnums=(1,))
            self.stats["compilations"] += 1
            logger.info("compiling gated detector program batch=%d "
                        "capture=%s input=%s mesh=%s", batch, capture_hw,
                        spec.input_hw, meshed)
            return jitted

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

    def _get_program(self, batch: int, capture_hw: Tuple[int, int],
                     chain: Tuple[int, int] = (0, 0)) -> Callable:
        key = (batch, capture_hw, chain)
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._build(batch, capture_hw, chain)
            self._compiled[key] = fn
        return fn

    def _build_delta(self, batch: int, capture_hw: Tuple[int, int],
                     k: int, chain: Tuple[int, int] = (0, 0)) -> Callable:
        """Delta-mode program: reconstruct frames from tile deltas against the
        donated device reference buffer, then the standard fused detect (and,
        with gates='device', the fused motion gates — the reconstructed
        frames never leave the device)."""
        spec = self.spec
        core = self._detect_core(capture_hw)
        from telescope_cam_detection_tpu.ops.delta import apply_tile_deltas

        def reconstruct(ref, lanes, tile_idx, tiles):
            return apply_tile_deltas(
                ref, lanes, tile_idx, tiles, spec.input_hw,
                payload=spec.delta_payload, tile=spec.delta_tile)

        meshed = self.mesh is not None
        if spec.gates == "device":
            gate_tail = self._gate_aux(capture_hw, chain)

            # lanes: per-frame delta-encoder lanes (single-chip pads share a
            # real lane — tiles must scatter into the reference buffer;
            # under a mesh pads stay -1 and their scatters drop);
            # gate_lanes: the same list with padding entries as -1 so the
            # gate schedule drops them instead of chaining them into
            # sequential rounds
            def gated_program(variables, ref, gate_state, lanes,
                              gate_lanes, tile_idx, tiles, gate_params,
                              class_conf, min_area, max_area,
                              class_allowed, *s2):
                if meshed:
                    lanes = self._localize_lanes(lanes)
                    gate_lanes = self._localize_lanes(gate_lanes)
                    # pad/foreign entries must not scatter tiles anywhere:
                    # negative lane indices normalize to the LAST local
                    # lane, so route their tile slots to the drop index
                    tile_idx = jnp.where((lanes >= 0)[:, None], tile_idx,
                                         ref.shape[1])
                new_ref, frames_u8 = reconstruct(ref, lanes, tile_idx,
                                                 tiles)
                rows = core(variables, frames_u8, class_conf, min_area,
                            max_area, class_allowed)
                rows = jnp.where((gate_lanes >= 0)[:, None, None],
                                 rows, -1.0)
                new_state, packed = gate_tail(gate_state, frames_u8,
                                              gate_lanes, gate_params,
                                              rows, *s2)
                return new_ref, new_state, packed

            if meshed:
                gated_program = self._shard_map_delta(
                    gated_program, gated=True,
                    n_extra=(1 if self._stage2 is not None else 0))
            jitted = jax.jit(gated_program, donate_argnums=(1, 2))
            self.stats["compilations"] += 1
            logger.info("compiling gated delta detector program batch=%d "
                        "capture=%s input=%s K=%d mesh=%s", batch,
                        capture_hw, spec.input_hw, k, meshed)
            return jitted

        def program(variables, ref, lanes, tile_idx, tiles, class_conf,
                    min_area, max_area, class_allowed):
            if meshed:
                lanes = self._localize_lanes(lanes)
                tile_idx = jnp.where((lanes >= 0)[:, None], tile_idx,
                                     ref.shape[1])
            new_ref, frames_u8 = reconstruct(ref, lanes, tile_idx, tiles)
            rows = core(variables, frames_u8, class_conf, min_area,
                        max_area, class_allowed)
            if meshed:  # pad/foreign entries must not surface detections
                rows = jnp.where((lanes >= 0)[:, None, None], rows, -1.0)
            return new_ref, rows

        if meshed:
            program = self._shard_map_delta(program, gated=False, n_extra=0)
        jitted = jax.jit(program, donate_argnums=(1,))
        self.stats["compilations"] += 1
        logger.info("compiling delta detector program batch=%d capture=%s "
                    "input=%s K=%d", batch, capture_hw, spec.input_hw, k)
        return jitted

    def _get_delta_program(self, batch: int, capture_hw: Tuple[int, int],
                           k: int, chain: Tuple[int, int] = (0, 0)
                           ) -> Callable:
        key = ("delta", batch, capture_hw, k, chain)
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._build_delta(batch, capture_hw, k, chain)
            self._compiled[key] = fn
        return fn

    def reset_delta(self) -> None:
        """Force a clean full refresh on the next delta dispatch: device
        execution errors surface at READBACK under pipelined callers (JAX
        dispatch is async), at which point the host mirrors may be ahead of
        the device reference buffer. Resetting both sides restores the
        mirror contract."""
        with self._delta_lock:
            for enc in self._delta_encoders.values():
                enc.reset()
            self._delta_ref = None

    def _resize_one(self, frame: np.ndarray) -> np.ndarray:
        ih, iw = self.spec.input_hw
        try:  # cv2's SIMD resize wins (measured 3x vs our scalar C++)
            import cv2
            return cv2.resize(frame, (iw, ih),
                              interpolation=cv2.INTER_LINEAR)
        except ImportError:
            from telescope_cam_detection_tpu.utils import native
            resized = native.resize_batch(frame[None], (ih, iw))
            if resized is None:
                raise RuntimeError("host-resize needs cv2 or the native "
                                   "frameio library")
            return resized[0]

    def _dispatch_delta_list(self, frames, capture_hw, lanes):
        """List-of-frames delta dispatch: resize runs INSIDE the per-lane
        encoder workers (cv2 releases the GIL, so lanes resize+encode
        concurrently) and capture-res frames are never stacked into a
        batch array. Entries may mix capture resolution with
        already-input-sized frames (coordinator padding)."""
        if not frames:
            raise ValueError("empty batch")
        input_hw = self.spec.input_hw
        for f in frames:
            if f.ndim != 3 or f.shape[-1] != 3:
                raise ValueError(
                    f"expected (H,W,3) uint8 frames, got {f.shape}")
        if capture_hw is None:
            capture_hw = next((tuple(f.shape[:2]) for f in frames
                               if tuple(f.shape[:2]) != input_hw), input_hw)
        rows = self._dispatch_delta(frames, tuple(capture_hw), lanes,
                                    resize_hw=input_hw)
        self.stats["batches"] += 1
        self.stats["frames"] += len(frames)
        return rows

    def _dispatch_delta(self, frames,
                        capture_hw: Tuple[int, int],
                        lanes: Optional[Sequence[int]],
                        resize_hw: Optional[Tuple[int, int]] = None):
        """Delta-mode dispatch: encode tile deltas per frame (host mirror),
        ship tiles only, reconstruct+detect on device. frames are already
        host-resized to input_hw (ndarray path), or resize_hw is set and
        any frame not already at that size is resized inside its lane's
        encode worker (list path)."""
        from telescope_cam_detection_tpu.runtime.delta import (
            DeltaEncoder, pack_batch)
        spec = self.spec
        gate_lanes = list(lanes) if lanes is not None else [0] * len(frames)
        if len(gate_lanes) != len(frames):
            raise ValueError("lanes length != batch")
        if any(l < -1 or l >= spec.delta_lanes for l in gate_lanes):
            raise ValueError(f"lane out of range (delta_lanes={spec.delta_lanes})")
        if self._mp_active():
            if spec.gates == "device":
                raise NotImplementedError(
                    "multi-process gated delta serving is not supported "
                    "yet: run device gates per host (each host its own "
                    "program) or gates='none' across hosts")
            return self._dispatch_delta_mp(frames, capture_hw, gate_lanes,
                                           resize_hw)
        sel = None
        if self.mesh is not None:
            # group by the shard owning each lane's reference-frame slice;
            # pads KEEP lane -1 (the body routes their tile scatters to the
            # drop slot and invalidates their rows), so no encoder runs and
            # no shared "__pad__" lane is needed
            frames, gate_lanes, sel = self._apply_shard_layout(
                frames, gate_lanes, spec.input_hw)
            lane_list = gate_lanes
        elif any(l < 0 for l in gate_lanes):
            # -1 marks batch padding: single-chip, the delta encoder still
            # needs a real lane (tiles must scatter somewhere), so pads share
            # one dedicated encoder lane — but the GATE schedule sees -1 and
            # drops them, so pads never chain into sequential gate rounds or
            # touch gate state
            pad_lane = self.lane_for_stream("__pad__")
            lane_list = [l if l >= 0 else pad_lane for l in gate_lanes]
        else:
            lane_list = gate_lanes
        with self._delta_lock:
            for lane in set(l for l in lane_list if l >= 0):
                if lane not in self._delta_encoders:
                    self._delta_encoders[lane] = DeltaEncoder(
                        spec.input_hw, tile=spec.delta_tile,
                        threshold=spec.delta_threshold,
                        refresh_tiles=spec.delta_refresh_tiles,
                        payload=spec.delta_payload)
            # encode lanes concurrently: encoders are per-lane state, so only
            # same-lane ordering matters (preserved within each lane's list)
            by_lane: Dict[int, List[int]] = {}
            encoded: List[Any] = [None] * len(frames)
            empty_encode = (np.zeros((0,), np.int32), np.zeros((0,), np.uint8))
            for pos, lane in enumerate(lane_list):
                if lane < 0:   # mesh pad: ships zero tiles
                    encoded[pos] = empty_encode
                else:
                    by_lane.setdefault(lane, []).append(pos)

            def encode_lane(lane: int) -> None:
                enc = self._delta_encoders[lane]
                for pos in by_lane[lane]:
                    f = frames[pos]
                    if resize_hw is not None and f.shape[:2] != resize_hw:
                        f = self._resize_one(f)
                    encoded[pos] = enc.encode(f)

            if len(by_lane) > 1:
                pool = self._encode_pool()
                list(pool.map(encode_lane, by_lane))
            elif by_lane:
                encode_lane(next(iter(by_lane)))
            num_tiles = self._delta_ref_shape[1]
            lanes_a, idx_a, tiles_a, k = pack_batch(
                encoded, lane_list, num_tiles, spec.delta_tile,
                payload=spec.delta_payload)
            if self._delta_ref is None:
                self._delta_ref = self._new_delta_ref()
            f = self._filter_arrays
            gated = spec.gates == "device"
            if gated:
                if self.mesh is not None:
                    chain = self._mesh_chain_shape(gate_lanes)
                else:
                    from telescope_cam_detection_tpu.ops.motion import (
                        chain_shape)
                    chain = chain_shape(gate_lanes)
                fn = self._get_delta_program(len(frames), capture_hw, k,
                                             chain)
            else:
                fn = self._get_delta_program(len(frames), capture_hw, k)
            try:
                if gated:
                    gs = self._gate_state_for(spec.input_hw)
                    args = [self.variables, self._delta_ref, gs,
                            jnp.asarray(lanes_a),
                            jnp.asarray(gate_lanes, jnp.int32),
                            jnp.asarray(idx_a),
                            jnp.asarray(tiles_a), self._gate_params,
                            f["class_conf"], f["min_area"], f["max_area"],
                            f["class_allowed"]]
                    if self._stage2 is not None:
                        args.append(self._stage2["variables"])
                    new_ref, new_gs, packed = fn(*args)
                    self._gate_states[spec.input_hw] = new_gs
                else:
                    new_ref, rows = fn(self.variables, self._delta_ref,
                                       jnp.asarray(lanes_a),
                                       jnp.asarray(idx_a),
                                       jnp.asarray(tiles_a), f["class_conf"],
                                       f["min_area"], f["max_area"],
                                       f["class_allowed"])
            except Exception:
                self.reset_delta()
                if gated:
                    self.reset_gate_state()
                raise
            self._delta_ref = new_ref
            self.stats["delta_tiles_sent"] += int(
                sum(len(i) for i, _ in encoded))
        if gated:
            return ((self._GATED_MARK, packed, sel) if sel is not None
                    else (self._GATED_MARK, packed))
        return (self._ROWS_MARK, rows, sel) if sel is not None else rows

    def _dispatch_delta_mp(self, frames, capture_hw: Tuple[int, int],
                           lanes: List[int],
                           resize_hw: Optional[Tuple[int, int]]):
        """Delta dispatch over a MULTI-PROCESS mesh: each host encodes and
        ships only its own cameras' tile deltas; the per-lane device
        reference buffer shards its lane axis across the whole cluster
        (process boundaries included), and one global program executes per
        cluster step.

        Contract (asserted where cheap): every process dispatches the same
        local batch size with balanced per-shard lane traffic (the
        coordinator's round-robin layout), and a frame's lane must be
        owned by the dispatching process — frames don't cross DCN, only
        XLA's own collectives do. The tile bucket K is pinned to the full
        refresh bucket so all processes compile the same program
        signature regardless of per-host scene activity."""
        from telescope_cam_detection_tpu.runtime.delta import (
            DeltaEncoder, pack_batch)
        spec = self.spec
        nproc = jax.process_count()
        pid = jax.process_index()
        if self._dp % nproc:
            raise ValueError(f"mesh dp axis ({self._dp}) must divide "
                             f"evenly across {nproc} processes")
        dp_local = self._dp // nproc
        per_shard_lanes = self._n_lanes // self._dp
        lo = pid * dp_local * per_shard_lanes
        hi = lo + dp_local * per_shard_lanes
        for lane in lanes:
            if lane >= 0 and not (lo <= lane < hi):
                raise ValueError(
                    f"lane {lane} not owned by process {pid} "
                    f"(owns [{lo}, {hi})); multi-host serving shards "
                    "cameras across hosts, frames never cross DCN")
        # local shard-group layout (the local restriction of _shard_layout)
        groups: List[List[int]] = [[] for _ in range(dp_local)]
        pad_positions: List[int] = []
        for pos, lane in enumerate(lanes):
            if lane < 0:
                pad_positions.append(pos)
            else:
                groups[(lane - lo) // per_shard_lanes].append(pos)
        for pos in pad_positions:
            min(groups, key=len).append(pos)
        per = max(max(len(g) for g in groups), 1)
        per = 1 << (per - 1).bit_length()
        order: List[int] = []
        for g in groups:
            order.extend(g)
            order.extend([-1] * (per - len(g)))
        sel = np.empty(len(lanes), np.int32)
        for j, pos in enumerate(order):
            if pos >= 0:
                sel[pos] = j
        self.stats["pad_frames"] += len(order) - len(lanes)

        num_tiles = self._delta_ref_shape[1]
        empty_encode = (np.zeros((0,), np.int32), np.zeros((0,), np.uint8))
        with self._delta_lock:
            lay_lanes: List[int] = []
            encoded: List[Any] = []
            for pos in order:
                if pos < 0:
                    lay_lanes.append(-1)
                    encoded.append(empty_encode)
                    continue
                lane = lanes[pos]
                lay_lanes.append(lane)
                enc = self._delta_encoders.get(lane)
                if enc is None:
                    enc = self._delta_encoders[lane] = DeltaEncoder(
                        spec.input_hw, tile=spec.delta_tile,
                        threshold=spec.delta_threshold,
                        refresh_tiles=spec.delta_refresh_tiles,
                        payload=spec.delta_payload)
                frame = frames[pos]
                if resize_hw is not None and frame.shape[:2] != resize_hw:
                    frame = self._resize_one(frame)
                encoded.append(enc.encode(frame))
            # K pinned to the top bucket: per-host content must not change
            # the compiled signature (processes would deadlock compiling
            # different programs)
            lanes_a, idx_a, tiles_a, k = pack_batch(
                encoded, lay_lanes, num_tiles, spec.delta_tile,
                k_buckets=(num_tiles,), payload=spec.delta_payload)
            if self._delta_ref is None:
                self._delta_ref = self._new_delta_ref()
            f = self._filter_arrays
            frep = self._mp_replicated("filters", f)
            fn = self._get_delta_program(len(order) * nproc, capture_hw, k)
            try:
                new_ref, rows = fn(
                    self._mp_replicated("variables", self.variables),
                    self._delta_ref, self._mp_sharded(lanes_a),
                    self._mp_sharded(idx_a), self._mp_sharded(tiles_a),
                    frep["class_conf"], frep["min_area"], frep["max_area"],
                    frep["class_allowed"])
            except Exception:
                self.reset_delta()
                raise
            self._delta_ref = new_ref
            self.stats["delta_tiles_sent"] += int(
                sum(len(i) for i, _ in encoded))
        return (self._ROWS_MARK, rows, sel)   # callers count batches/frames

    # -- inference ------------------------------------------------------------
    def dispatch_batch(self, frames: np.ndarray,
                       lanes: Optional[Sequence[int]] = None,
                       capture_hw: Optional[Tuple[int, int]] = None):
        """Asynchronously dispatch one batch: transfer + enqueue the fused
        program, return the on-device result array WITHOUT reading it back.
        Lets a caller pipeline the next batch's transfer under this batch's
        execution/readback (np.asarray the result to materialize).

        lanes (delta mode only): per-frame stream-lane index; same-lane
        entries are sequential frames (deltas chain within the batch).

        capture_hw: when the capture threads already resized frames to the
        model input size (the reference resizes on the capture thread too,
        stream_capture.py:211-213), pass the ORIGINAL capture (H, W) here so
        boxes are still reported in capture coordinates.

        Delta mode also accepts a LIST of (H, W, 3) frames: the host
        resize then runs inside the per-lane encoder workers (cv2
        releases the GIL, so lanes resize+encode concurrently) instead of
        serially here, and capture-res frames are never stacked into an
        11 MB-per-frame batch array. Frames may mix capture resolution
        with already-input-sized entries (coordinator padding)."""
        if isinstance(frames, (list, tuple)):
            if self.spec.transfer == "delta":
                return self._dispatch_delta_list(frames, capture_hw, lanes)
            frames = np.stack(frames)
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(f"expected (B,H,W,3) uint8 frames, got {frames.shape}")
        if capture_hw is not None and \
                (frames.shape[1], frames.shape[2]) != self.spec.input_hw:
            raise ValueError("capture_hw is only valid for frames already "
                             f"resized to input_hw={self.spec.input_hw}")
        if self.mesh is not None and not self._mp_active() \
                and self.spec.gates != "device" \
                and self.spec.transfer != "delta":
            # plain-program mesh path: the dp-sharded batch axis must divide
            # the mesh; pad with blank frames (their rows come back invalid
            # and callers slice anyway). Stateful variants (gates/delta)
            # instead group the batch by lane ownership in _apply_shard_layout.
            dp = self.mesh.shape.get("dp", 1)
            short = (-frames.shape[0]) % dp
            if short:
                self.stats["pad_frames"] += short
                frames = np.concatenate(
                    [frames, np.zeros((short, *frames.shape[1:]), np.uint8)])
        batch = frames.shape[0]
        if capture_hw is None:
            capture_hw = (frames.shape[1], frames.shape[2])
        if self._host_resize_active((frames.shape[1], frames.shape[2])):
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
        if self.spec.transfer == "delta":
            rows = self._dispatch_delta(frames, capture_hw, lanes)
            self.stats["batches"] += 1
            self.stats["frames"] += batch
            return rows
        gated = self.spec.gates == "device"
        frame_hw = (frames.shape[1], frames.shape[2])
        f = self._filter_arrays
        if gated:
            lane_list = list(lanes) if lanes is not None else [0] * batch
            if len(lane_list) != batch:
                raise ValueError("lanes length != batch")
            # -1 marks a batch-padding entry: no gate state, excluded from
            # the round schedule (chain_shape/_round_schedule drop it)
            if any(l < -1 or l >= self._n_lanes for l in lane_list):
                raise ValueError(
                    f"lane out of range (gate_lanes={self._n_lanes})")
            sel = None
            if self.mesh is not None:
                # group entries by the shard owning their lane's state;
                # readback un-permutes via sel
                lay_frames, lane_list, sel = self._apply_shard_layout(
                    frames, lane_list, frame_hw)
                frames = np.stack(lay_frames)
                chain = self._mesh_chain_shape(lane_list)
            else:
                from telescope_cam_detection_tpu.ops.motion import chain_shape
                chain = chain_shape(lane_list)
            if self.spec.transfer == "yuv420":
                frames = self._pack_yuv420(frames)
            fn = self._get_program(len(lane_list), capture_hw, chain)
            with self._delta_lock:   # serialize gate-state read/modify/write
                gs = self._gate_state_for(frame_hw)
                args = [self.variables, gs, jnp.asarray(frames),
                        jnp.asarray(lane_list, jnp.int32),
                        self._gate_params, f["class_conf"], f["min_area"],
                        f["max_area"], f["class_allowed"]]
                if self._stage2 is not None:
                    args.append(self._stage2["variables"])
                try:
                    new_gs, packed = fn(*args)
                except Exception:
                    self.reset_gate_state()  # donated state may be invalid
                    raise
                self._gate_states[frame_hw] = new_gs
            self.stats["batches"] += 1
            self.stats["frames"] += batch
            if sel is not None:
                return (self._GATED_MARK, packed, sel)
            return (self._GATED_MARK, packed)
        if self.spec.transfer == "yuv420":
            frames = self._pack_yuv420(frames)
        if self._mp_active():
            # multi-host plain path: this process contributes its own
            # cameras' frames as one dp shard-group; weights/filters
            # replicate mesh-wide (cached). Every process must dispatch
            # the same local batch per cluster step.
            nproc = jax.process_count()
            dp_local = max(self._dp // nproc, 1)
            short = (-frames.shape[0]) % dp_local
            if short:
                self.stats["pad_frames"] += short
                frames = np.concatenate(
                    [frames, np.zeros((short, *frames.shape[1:]), np.uint8)])
            frep = self._mp_replicated("filters", f)
            fn = self._get_program(frames.shape[0] * nproc, capture_hw)
            rows = fn(self._mp_replicated("variables", self.variables),
                      self._mp_sharded(frames), frep["class_conf"],
                      frep["min_area"], frep["max_area"],
                      frep["class_allowed"])
        else:
            fn = self._get_program(batch, capture_hw)
            rows = fn(self.variables, jnp.asarray(frames), f["class_conf"],
                      f["min_area"], f["max_area"], f["class_allowed"])
        self.stats["batches"] += 1
        self.stats["frames"] += batch
        return rows

    def warm(self, batch: int, capture_hw: Tuple[int, int],
             k: Optional[int] = None) -> None:
        """Compile AND execute the program variant for (batch, capture_hw
        [, delta K bucket]) on dummy inputs, so serving never pays
        first-dispatch compilation (the TPU analog of the reference's
        TensorRT engine pre-build, tools/convert_yolox_to_tensorrt.py).

        Owns its argument construction so cache-warming tools never track
        the jitted programs' signatures (which change as features fuse in
        — a stale hand-built call is exactly what this replaces). Gated
        variants warm the round-robin serving chain (coordinator batches
        spread across cameras). k is delta-mode only; None warms the
        full-refresh bucket.
        """
        spec = self.spec
        gated = spec.gates == "device"
        n_streams = max((spec.delta_lanes if spec.transfer == "delta"
                         else self._n_lanes) - 1, 1)
        lane_list = [i % n_streams for i in range(batch)]
        if spec.transfer != "delta":
            if k is not None:
                raise ValueError("k is only meaningful for transfer='delta'")
            frames = np.zeros((batch, *capture_hw, 3), np.uint8)
            handle = self.dispatch_batch(
                frames, lanes=lane_list if gated else None)
            self.materialize(handle, batch)
            return
        num_tiles = self._delta_ref_shape[1]
        if k is None:
            k = num_tiles
        if self.mesh is not None:
            # warm the same shard-layout shape serving will dispatch
            order, _sel = self._shard_layout(lane_list)
            lane_list = [lane_list[p] if p >= 0 else -1 for p in order]
            batch = len(lane_list)
        # index num_tiles = the scatter's out-of-range drop slot: executes
        # the full reconstruct+detect graph without touching the mirrors
        idx = jnp.full((batch, k), num_tiles, jnp.int32)
        tile_shape = ((k, spec.delta_tile * spec.delta_tile * 3 // 2)
                      if spec.delta_payload == "yuv420"
                      else (k, spec.delta_tile, spec.delta_tile, 3))
        tiles = jnp.zeros((batch, *tile_shape), jnp.uint8)
        lanes_a = jnp.asarray(lane_list, jnp.int32)
        f = self._filter_arrays
        with self._delta_lock:
            if self._delta_ref is None:
                self._delta_ref = self._new_delta_ref()
            if gated:
                if self.mesh is not None:
                    chain = self._mesh_chain_shape(lane_list)
                else:
                    from telescope_cam_detection_tpu.ops.motion import (
                        chain_shape)
                    chain = chain_shape(lane_list)
                fn = self._get_delta_program(batch, capture_hw, k, chain)
                gs = self._gate_state_for(spec.input_hw)
                args = [self.variables, self._delta_ref, gs, lanes_a,
                        lanes_a, idx, tiles, self._gate_params,
                        f["class_conf"], f["min_area"], f["max_area"],
                        f["class_allowed"]]
                if self._stage2 is not None:
                    args.append(self._stage2["variables"])
                new_ref, new_gs, packed = fn(*args)
                self._gate_states[spec.input_hw] = new_gs
                np.asarray(packed)
            else:
                fn = self._get_delta_program(batch, capture_hw, k)
                new_ref, rows = fn(self.variables, self._delta_ref, lanes_a,
                                   idx, tiles, f["class_conf"],
                                   f["min_area"], f["max_area"],
                                   f["class_allowed"])
                np.asarray(rows)
            self._delta_ref = new_ref

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

    def materialize(self, handle, n: int):
        """Force a dispatch_batch handle to host memory (ONE device->host
        transfer either way).

        Returns (rows (n, D, 7) numpy, aux dict-of-(n, ...) numpy or None).
        aux is present only for gates='device' programs: motion_area /
        initialized (empty-frame gate, capture-px units), motion_ratio /
        motion_pixels per row (MOG2 gate), mean_luma."""
        def to_host(arr, sel=None):
            # multi-process mesh: the global result is only partially
            # addressable here — assemble THIS process's rows (its own
            # cameras' shards), then un-permute through the local sel
            if getattr(arr, "is_fully_addressable", True):
                a = np.asarray(arr)
                return a[sel[:n]] if sel is not None else a[:n]
            return self._mp_local_rows(arr, sel, n)

        if isinstance(handle, tuple) and handle[0] == self._GATED_MARK:
            # mesh shard layout: un-permute back to caller order via sel
            packed = to_host(handle[1],
                             handle[2] if len(handle) == 3 else None)
            return self._unpack_gated(packed)
        if isinstance(handle, tuple) and handle[0] == self._ROWS_MARK:
            return to_host(handle[1], handle[2]), None
        return to_host(handle), None

    def _warmup_hw(self) -> Tuple[int, int]:
        return self.spec.input_hw


def _pack_yuv420_numpy(frame: np.ndarray) -> np.ndarray:
    """Full-range BT.601 BGR -> planar I420 (numpy fallback packer; the
    canonical fixed-point transform, bit-identical to the native packer)."""
    from telescope_cam_detection_tpu.runtime.delta import bgr_to_yuv_planes_numpy
    h, w, _ = frame.shape
    yq, u_sub, v_sub = bgr_to_yuv_planes_numpy(frame)
    out = np.empty((h * 3 // 2, w), np.uint8)
    out[:h] = yq
    out[h:h + h // 4] = u_sub.reshape(h // 4, w)
    out[h + h // 4:] = v_sub.reshape(h // 4, w)
    return out


def rows_to_detections(
    rows: np.ndarray,
    motion_ratio: Optional[np.ndarray] = None,
    motion_pixels: Optional[np.ndarray] = None,
    species_prob: Optional[np.ndarray] = None,
    species_id: Optional[np.ndarray] = None,
    species_row: Optional[np.ndarray] = None,
    species_valid: Optional[np.ndarray] = None,
) -> List[Dict[str, Any]]:
    """(max_det, 7) device rows -> list of reference-format detection dicts:
    {class_id, class_name, confidence, bbox{x1,y1,x2,y2,width,height,area}}.

    motion_ratio/motion_pixels: optional per-row arrays from a
    gates='device' program; attached to each detection so the host
    MotionFilter can threshold without recomputing masks.
    species_prob/species_id: optional (C, K) fused-Stage-2 top-k results
    (attach_classifier); attached raw as ``species_raw`` for
    TwoStageDetectionPipeline to format/re-rank. species_row (C,) maps
    crop slot c to its row index (the device selects eligible rows by
    score, not slot order) and species_valid (C,) marks slots that held a
    real eligible row; without them crop c maps positionally to row c."""
    species_map: Dict[int, Any] = {}
    if species_prob is not None:
        for c in range(species_prob.shape[0]):
            if species_valid is not None and not species_valid[c]:
                continue
            r = int(species_row[c]) if species_row is not None else c
            species_map[r] = (species_id[c].tolist(),
                              species_prob[c].tolist())
    dets: List[Dict[str, Any]] = []
    for i, row in enumerate(rows):
        if row[5] < 0:  # invalid marker
            continue
        x1, y1, x2, y2, obj_c, cls_c, cid = (float(v) for v in row)
        class_id = int(cid)
        w, h = x2 - x1, y2 - y1
        det = {
            "class_id": class_id,
            "class_name": class_name(class_id),
            "confidence": obj_c * cls_c,
            "objectness": obj_c,
            "class_confidence": cls_c,
            "bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2,
                     "width": w, "height": h, "area": w * h},
        }
        if motion_ratio is not None:
            det["motion_ratio"] = float(motion_ratio[i])
        if motion_pixels is not None:
            det["motion_pixels"] = float(motion_pixels[i])
        if i in species_map:
            det["species_raw"] = species_map[i]
        dets.append(det)
    return dets
