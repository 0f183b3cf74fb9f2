"""Open-vocabulary inference engine: text-prompted detection thread.

TPU-native counterpart of the reference's legacy GroundingDINO engine
(``/root/reference/src/inference_engine.py``): text prompts -> phrase-
labelled detections with ``class_id = -1`` (open vocabulary has no dataset
ids), caption string for display parity, box/text thresholds, queue-driven
inference thread, per-phrase confidence overrides, min-box-area gate,
optional Stage-2 hand-off — the same operating surface, redesigned around
one jitted device program (fused resize -> backbone -> region-text
similarity -> decode -> batched NMS) instead of the torch
``predict_with_caption`` call.

The TPU-first twist over both the reference engines: the prompt set is a
RUNTIME ARRAY, not a compiled constant. Prompts embed once on
``load_model()``/``update_prompts()`` and pad to a power-of-two bucket
(models/openvocab.encode_prompts); swapping or growing the vocabulary
within a bucket re-runs the same compiled program — GroundingDINO re-runs
its whole BERT branch per frame, and YOLO-World needs an offline
"reparameterize" step (reference two_stage_pipeline.py:28 loads a fixed
class list at startup).
"""
from __future__ import annotations

import logging
import threading
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from telescope_cam_detection_tpu.models.openvocab import (
    build_openvocab,
    build_text_encoder,
    encode_prompts,
    init_openvocab,
    rows_to_phrase_detections,
)

logger = logging.getLogger(__name__)


class OpenVocabEngine:
    """Text-prompted detection engine (legacy-engine parity surface).

    Args mirror the reference engine's knobs (inference_engine.py:31-66):
    box_threshold gates NMS confidence, text_threshold gates the final
    region-text match, min_box_area/max_det bound outputs,
    class_confidence_overrides maps PHRASES to per-prompt thresholds,
    use_two_stage/two_stage_pipeline hands detections to Stage-2 — build
    that pipeline with ``classify_classes={-1: <category>}`` so Stage-2
    admits open-vocabulary detections (they carry no dataset class ids;
    tests/test_openvocab.py::test_engine_two_stage_handoff).
    """

    def __init__(
        self,
        text_prompts: Sequence[str],
        weights: Optional[str] = None,
        variant: Optional[str] = None,
        input_hw=(640, 640),
        embed_dim: int = 128,
        box_threshold: float = 0.25,
        text_threshold: float = 0.25,
        input_queue=None,
        output_queue=None,
        min_box_area: int = 0,
        max_det: int = 300,
        pre_nms_topk: int = 1000,
        use_two_stage: bool = False,
        two_stage_pipeline: Optional[Any] = None,
        class_confidence_overrides: Optional[Dict[str, float]] = None,
        seed: int = 0,
    ):
        if not text_prompts:
            raise ValueError("open-vocabulary engine needs >=1 text prompt")
        self.text_prompts = list(text_prompts)
        self.weights = weights
        if variant is None:
            # variant=None resolves from the checkpoint's sidecar metadata
            # (tools/train_openvocab.py writes it), so
            # OpenVocabEngine(prompts, weights=...) just works instead of
            # failing on an architecture mismatch with a default
            variant = "ov-s"
            if weights:
                import json
                import os
                sidecar = os.path.splitext(weights)[0] + ".json"
                if os.path.exists(sidecar):
                    try:
                        with open(sidecar) as f:
                            variant = json.load(f).get("variant", variant)
                    except (OSError, ValueError):
                        logger.warning("unreadable sidecar %s; assuming %s",
                                       sidecar, variant)
        self.variant = variant
        self.input_hw = tuple(input_hw)
        self.embed_dim = embed_dim
        self.box_threshold = box_threshold
        self.text_threshold = text_threshold
        self.input_queue = input_queue
        self.output_queue = output_queue
        self.min_box_area = min_box_area
        self.max_det = max_det
        self.pre_nms_topk = pre_nms_topk
        self.use_two_stage = use_two_stage
        self.two_stage_pipeline = two_stage_pipeline
        self.class_confidence_overrides = dict(class_confidence_overrides
                                               or {})
        self.seed = seed
        # reference parity: the period-joined caption string (:82-86)
        self.caption = (" . ".join(self.text_prompts) + " ."
                        if self.text_prompts else "")

        self.is_loaded = False
        self.stop_event = threading.Event()
        self.inference_thread: Optional[threading.Thread] = None
        self._prompt_lock = threading.Lock()
        self._text_emb = None          # (P_bucket, D) device array
        self._compiled: Dict[tuple, Any] = {}

        self.inference_count = 0
        self.total_inference_time = 0.0
        self.avg_inference_time = 0.0
        self.fps = 0.0
        self._fps_window_start = time.monotonic()
        self._fps_window_count = 0

    # -- model ----------------------------------------------------------------
    def load_model(self) -> bool:
        try:
            import jax.numpy as jnp
            if self.weights:
                from telescope_cam_detection_tpu.models.convert import (
                    load_variables)
                tree = load_variables(self.weights)
                if tree is None or "det" not in tree or "txt" not in tree:
                    raise RuntimeError(
                        f"open-vocab checkpoint invalid: {self.weights} "
                        "(expected {det: variables, txt: variables})")
                self.det = build_openvocab(self.variant, self.embed_dim)
                self.txt = build_text_encoder(self.embed_dim)
                to_f32 = lambda a: (np.asarray(a, np.float32)  # noqa: E731
                                    if np.asarray(a).dtype == np.float16
                                    else np.asarray(a))
                import jax
                self.det_vars = jax.tree.map(to_f32, tree["det"])
                self.txt_vars = jax.tree.map(to_f32, tree["txt"])
            else:
                logger.warning("OpenVocabEngine: random-init weights "
                               "(no checkpoint)")
                self.det, self.det_vars, self.txt, self.txt_vars = \
                    init_openvocab(self.variant, self.input_hw,
                                   max_prompts=max(len(self.text_prompts), 4),
                                   embed_dim=self.embed_dim, seed=self.seed)
            self._embed_prompts()
            logger.info("Open-vocabulary prompts: %s", self.text_prompts)
            logger.info("Caption: %s", self.caption)
            # warm up at the single-frame bucket (reference warms the same
            # way with a 640x640 dummy, :144-151)
            dummy = np.zeros((1, *self.input_hw, 3), np.uint8)
            self._infer_rows(dummy)
            self.is_loaded = True
            logger.info("open-vocab detector loaded (%s, %d prompts)",
                        self.variant, len(self.text_prompts))
            return True
        except Exception:
            logger.exception("Failed to load open-vocab model")
            return False

    def _embed_prompts(self) -> None:
        import jax
        emb = encode_prompts(self.txt, self.txt_vars, self.text_prompts)
        self._text_emb = jax.device_put(emb)

    def update_prompts(self, text_prompts: Sequence[str]) -> None:
        """Swap the vocabulary at runtime (YOLO-World set_classes analog).
        Within the same power-of-two bucket this is re-embed + re-run — no
        recompilation."""
        if not text_prompts:
            raise ValueError("need >=1 text prompt")
        with self._prompt_lock:
            self.text_prompts = list(text_prompts)
            self.caption = " . ".join(self.text_prompts) + " ."
            self._embed_prompts()
        logger.info("open-vocab prompts updated: %s", self.text_prompts)

    # -- inference --------------------------------------------------------
    def _program(self, batch: int, frame_hw, n_prompts_bucket: int):
        """Compiled (variables, text_emb, frames_u8) -> (B, max_det, 7)
        rows program per (batch, frame resolution, prompt bucket)."""
        key = (batch, frame_hw, n_prompts_bucket)
        fn = self._compiled.get(key)
        if fn is None:
            import jax
            from telescope_cam_detection_tpu.models.yolox import (
                decode_outputs)
            from telescope_cam_detection_tpu.ops.nms import batched_nms
            from telescope_cam_detection_tpu.ops.preprocess import (
                preprocess_yolox)
            input_hw, conf, max_det = (self.input_hw, self.box_threshold,
                                       self.max_det)
            pre_topk = self.pre_nms_topk
            det = self.det

            def program(variables, text_emb, frames_u8):
                x = preprocess_yolox(frames_u8, input_hw)
                outs = det.apply(variables, x, text_emb, train=False)
                boxes, obj, cls = decode_outputs(outs)
                return batched_nms(boxes, obj, cls, conf_threshold=conf,
                                   iou_threshold=0.45, max_det=max_det,
                                   pre_nms_topk=pre_topk)

            fn = jax.jit(program)
            self._compiled[key] = fn
            logger.info("compiling open-vocab program batch=%d frame=%s "
                        "prompts<=%d", batch, frame_hw, n_prompts_bucket)
        return fn

    def _infer_rows(self, frames: np.ndarray) -> np.ndarray:
        rows, _ = self._infer_rows_prompts(frames)
        return rows

    def _infer_rows_prompts(self, frames: np.ndarray):
        """Infer rows AND return the prompt list the embedding was built
        from, captured under ONE lock acquisition — update_prompts() racing
        between inference and labeling must never relabel old-vocabulary
        class indices with new phrases."""
        with self._prompt_lock:
            emb = self._text_emb
            prompts = list(self.text_prompts)
        fn = self._program(frames.shape[0], frames.shape[1:3],
                           int(emb.shape[0]))
        variables = self.det_vars
        return np.asarray(fn(variables, emb, frames)), prompts

    def detect(self, frame: np.ndarray) -> List[Dict[str, Any]]:
        """BGR uint8 frame (any resolution) -> phrase detection dicts in
        FRAME coordinates."""
        rows, prompts = self._infer_rows_prompts(frame[None].astype(np.uint8))
        return self._rows_to_detections(rows[0], frame.shape[:2], prompts)

    def detect_batch(self, frames: Sequence[np.ndarray]
                     ) -> List[List[Dict[str, Any]]]:
        """Same-resolution frames -> per-frame detections; batch pads to a
        power of two so compiled variants stay bounded."""
        if not len(frames):
            return []
        arr = np.stack([f.astype(np.uint8) for f in frames])
        n = arr.shape[0]
        bucket = max(1 << (n - 1).bit_length(), 1)
        if bucket > n:
            arr = np.concatenate(
                [arr, np.zeros((bucket - n, *arr.shape[1:]), np.uint8)])
        rows, prompts = self._infer_rows_prompts(arr)
        return [self._rows_to_detections(rows[i], frames[i].shape[:2],
                                         prompts)
                for i in range(n)]

    def _rows_to_detections(self, rows: np.ndarray, frame_hw,
                            prompts: Sequence[str]) -> List[Dict[str, Any]]:
        dets = rows_to_phrase_detections(rows, prompts,
                                         text_threshold=self.text_threshold)
        # rows are in input_hw coords; scale to frame coords (the reference
        # detector scales back by h/w ratios, yolox_detector.py:222-282)
        sy = frame_hw[0] / self.input_hw[0]
        sx = frame_hw[1] / self.input_hw[1]
        out = []
        for d in dets:
            b = d["bbox"]
            for k, s in (("x1", sx), ("x2", sx)):
                b[k] = float(np.clip(b[k] * s, 0, frame_hw[1]))
            for k, s in (("y1", sy), ("y2", sy)):
                b[k] = float(np.clip(b[k] * s, 0, frame_hw[0]))
            b["width"] = b["x2"] - b["x1"]
            b["height"] = b["y2"] - b["y1"]
            b["area"] = b["width"] * b["height"]
            if b["area"] < self.min_box_area:
                continue
            thr = self.class_confidence_overrides.get(d["class_name"])
            if thr is not None and d["confidence"] < thr:
                continue
            out.append(d)
        return out

    # -- thread (reference loop contract: :183-243) -------------------------
    def start(self) -> bool:
        if not self.is_loaded and not self.load_model():
            return False
        if self.input_queue is None or self.output_queue is None:
            logger.error("input and output queues must be provided")
            return False
        self.stop_event.clear()
        self.inference_thread = threading.Thread(
            target=self._inference_loop, daemon=True,
            name="openvocab-engine")
        self.inference_thread.start()
        logger.info("open-vocab inference thread started")
        return True

    def stop(self) -> None:
        self.stop_event.set()
        if self.inference_thread:
            self.inference_thread.join(timeout=5.0)
            if self.inference_thread.is_alive():
                logger.critical("open-vocab inference thread leaked "
                                "(join timeout)")
        logger.info("open-vocab inference thread stopped")

    def _inference_loop(self) -> None:
        import queue as queue_mod
        while not self.stop_event.is_set():
            try:
                item = self.input_queue.get(timeout=0.1)
            except queue_mod.Empty:
                continue
            try:
                frame = item["frame"]
                t0 = time.monotonic()
                detections = self.detect(frame)
                if self.use_two_stage and self.two_stage_pipeline and \
                        detections:
                    detections = self.two_stage_pipeline.process_detections(
                        frame, detections)
                dt = time.monotonic() - t0
                self.inference_count += 1
                self._fps_window_count += 1
                self.total_inference_time += dt
                self.avg_inference_time = (self.total_inference_time
                                           / self.inference_count)
                now = time.monotonic()
                if now - self._fps_window_start >= 1.0:
                    self.fps = (self._fps_window_count
                                / (now - self._fps_window_start))
                    self._fps_window_start = now
                    self._fps_window_count = 0
                result = {
                    "frame_id": item.get("frame_id"),
                    "timestamp": item.get("timestamp"),
                    "inference_time": dt,
                    "detections": detections,
                    "frame_shape": frame.shape,
                    "camera_id": item.get("camera_id"),
                }
                try:
                    self.output_queue.put_nowait(result)
                except queue_mod.Full:
                    pass   # drop like the reference (:238-240)
            except Exception:
                logger.exception("error in open-vocab inference loop")
                time.sleep(0.1)

    def get_stats(self) -> Dict[str, Any]:
        return {
            "is_loaded": self.is_loaded,
            "variant": self.variant,
            "prompts": list(self.text_prompts),
            "caption": self.caption,
            "box_threshold": self.box_threshold,
            "text_threshold": self.text_threshold,
            "fps": round(self.fps, 2),
            "avg_inference_time_ms": round(self.avg_inference_time * 1000,
                                           2),
            "inference_count": self.inference_count,
            "compiled_programs": len(self._compiled),
        }
