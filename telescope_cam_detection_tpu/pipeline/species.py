"""Stage-2 species classifier: EVA02 on TPU + taxonomy/geographic logic.

Counterpart of reference ``src/species_classifier.py:18-476``. The device
side is ONE jitted program per crop-batch bucket: fused preprocess
(resize/BGR->RGB/normalize) -> EVA02 forward -> softmax -> top-k. The
taxonomy hierarchy fallback, geographic whitelist, and label logic are host
Python with identical semantics (hierarchy thresholds species 0.5 / genus 0.4
/ family 0.3 / order 0.3 / class 0.2; species_classifier.py:74-80).

Unlike the reference (one forward per detection, serial), crops classify as a
single padded batch — bounding Stage-2 latency when many detections fire
(SURVEY §7 hard part 6).
"""
from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from telescope_cam_detection_tpu.models.eva02 import build_eva02, init_eva02
from telescope_cam_detection_tpu.ops.preprocess import preprocess_classifier

logger = logging.getLogger(__name__)

HIERARCHY_THRESHOLDS = {
    "species": 0.5,
    "genus": 0.4,
    "family": 0.3,
    "order": 0.3,
    "class": 0.2,
}

CROP_BATCH_BUCKETS = (1, 2, 4, 8, 16)


def load_taxonomy(taxonomy_file: str) -> Dict[str, Any]:
    """Load class_id -> taxonomy mapping from JSON (dict entries with
    common_name/name/genus/family/order/class) or plain text (one name per
    line). Reference species_classifier.py:90-166."""
    path = Path(taxonomy_file)
    if not path.exists():
        logger.warning("taxonomy file not found: %s", taxonomy_file)
        return {}
    try:
        if path.suffix == ".json":
            with open(path) as f:
                data = json.load(f)
            if isinstance(data, list):
                return {str(i): entry for i, entry in enumerate(data)}
            return {str(k): v for k, v in data.items()}
        with open(path) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        return {str(i): name for i, name in enumerate(lines)}
    except (json.JSONDecodeError, OSError):
        logger.exception("failed to load taxonomy %s", taxonomy_file)
        return {}


class SpeciesClassifier:
    def __init__(
        self,
        model_name: str = "eva02-large",
        num_classes: int = 10000,
        input_size: int = 336,
        taxonomy_file: Optional[str] = None,
        confidence_threshold: float = 0.3,
        use_hierarchical: bool = True,
        enable_geographic_filter: bool = False,
        allowed_species: Optional[Sequence[str]] = None,
        variables: Optional[Any] = None,
        seed: int = 0,
        param_dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        quant: str = "none",
    ):
        self.model_name = model_name
        self.num_classes = num_classes
        self.input_size = input_size
        self.confidence_threshold = confidence_threshold
        self.use_hierarchical = use_hierarchical
        self.hierarchy_thresholds = dict(HIERARCHY_THRESHOLDS)
        self.enable_geographic_filter = enable_geographic_filter
        self.allowed_species = set(allowed_species or [])
        self.taxonomy: Dict[str, Any] = (
            load_taxonomy(taxonomy_file) if taxonomy_file else {})

        self.model = build_eva02(model_name, num_classes, input_size,
                                 dtype=param_dtype, attn_impl=attn_impl,
                                 quant=quant)
        if variables is None:
            logger.warning("SpeciesClassifier: random-init weights "
                           "(no checkpoint)")
            _, variables = init_eva02(model_name, num_classes, input_size,
                                      seed, dtype=param_dtype,
                                      attn_impl=attn_impl, quant=quant)
        self.variables = variables
        self._programs: Dict[Tuple[int, int, int], Any] = {}
        self.total_classified = 0
        self.total_batches = 0
        self._classify_times: List[float] = []

    # -- device program -------------------------------------------------------
    def _program(self, batch: int, crop_hw: Tuple[int, int]):
        key = (batch, *crop_hw)
        fn = self._programs.get(key)
        if fn is None:
            # a custom fine-tuned head may have fewer classes than the
            # device-side top-k window
            model, size, k = self.model, self.input_size, min(
                10, self.num_classes)

            def program(variables, crops_u8):
                x = preprocess_classifier(crops_u8, (size, size))
                logits = model.apply(variables, x, train=False)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                top_p, top_i = jax.lax.top_k(probs, k)
                return top_p, top_i

            fn = jax.jit(program)
            self._programs[key] = fn
        return fn

    def classify_batch_uniform(
        self, crops: np.ndarray, top_k: int = 5
    ) -> List[List[Dict[str, Any]]]:
        """(N, H, W, 3) uint8 BGR crops (same size) -> per-crop top-k lists."""
        n = crops.shape[0]
        padded = 1
        for b in CROP_BATCH_BUCKETS:
            if n <= b:
                padded = b
                break
        else:
            padded = CROP_BATCH_BUCKETS[-1]
        results: List[List[Dict[str, Any]]] = []
        t0 = time.perf_counter()
        for start in range(0, n, padded):
            chunk = crops[start:start + padded]
            buf = np.zeros((padded, *crops.shape[1:]), np.uint8)
            buf[:chunk.shape[0]] = chunk
            fn = self._program(padded, crops.shape[1:3])
            top_p, top_i = fn(self.variables, jnp.asarray(buf))
            top_p = np.asarray(top_p)[:chunk.shape[0], :top_k]
            top_i = np.asarray(top_i)[:chunk.shape[0], :top_k]
            for probs, ids in zip(top_p, top_i):
                results.append(self._format_predictions(probs, ids))
        self.total_batches += 1
        self.total_classified += n
        self._classify_times.append((time.perf_counter() - t0) * 1000.0)
        if len(self._classify_times) > 200:
            self._classify_times = self._classify_times[-200:]
        return results

    def classify(self, crop: np.ndarray, top_k: int = 5) -> List[Dict[str, Any]]:
        """Single-crop convenience (reference species_classifier.py:354-420)."""
        return self.classify_batch_uniform(crop[None], top_k)[0]

    # -- device-side crop path ----------------------------------------------
    def _device_crop_program(self, n_frames: int, frame_hw: Tuple[int, int],
                             k: int):
        """Fused: ROI-sample K crops from on-device frames -> normalize ->
        EVA02 -> top-k. Avoids re-shipping crops to the device (the frames
        already went up for detection)."""
        key = ("devcrop", n_frames, *frame_hw, k)
        fn = self._programs.get(key)
        if fn is None:
            from telescope_cam_detection_tpu.ops.crops import sample_crops
            from telescope_cam_detection_tpu.ops.preprocess import (
                CLIP_MEAN, CLIP_STD)
            model, size = self.model, self.input_size
            mean = jnp.asarray(CLIP_MEAN, jnp.float32)
            inv_std = 1.0 / jnp.asarray(CLIP_STD, jnp.float32)

            def program(variables, frames, boxes):
                crops = sample_crops(frames, boxes, (size, size))  # BGR float
                x = crops[..., ::-1] * (1.0 / 255.0)
                x = (x - mean) * inv_std
                logits = model.apply(variables, x, train=False)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jax.lax.top_k(probs, min(10, probs.shape[-1]))

            fn = jax.jit(program)
            self._programs[key] = fn
        return fn

    def classify_boxes_device(
        self, frames_dev, boxes: np.ndarray, n_valid: int, top_k: int = 5
    ) -> List[List[Dict[str, Any]]]:
        """frames_dev: (B, H, W, 3) device array (uint8); boxes: (K, 5)
        [batch_idx, x1, y1, x2, y2] with padding rows batch_idx < 0.
        Returns top-k prediction lists for the first n_valid boxes."""
        t0 = time.perf_counter()
        k = boxes.shape[0]
        fn = self._device_crop_program(frames_dev.shape[0],
                                       tuple(frames_dev.shape[1:3]), k)
        top_p, top_i = fn(self.variables, frames_dev, jnp.asarray(boxes))
        top_p = np.asarray(top_p)[:n_valid, :top_k]
        top_i = np.asarray(top_i)[:n_valid, :top_k]
        results = [self._format_predictions(p, i)
                   for p, i in zip(top_p, top_i)]
        self.total_batches += 1
        self.total_classified += n_valid
        self._classify_times.append((time.perf_counter() - t0) * 1000.0)
        if len(self._classify_times) > 200:
            self._classify_times = self._classify_times[-200:]
        return results

    def format_topk(self, probs, ids, top_k: int = 5
                    ) -> List[Dict[str, Any]]:
        """Raw device top-k (probs, ids) -> prediction dicts with the same
        taxonomy/hierarchy/geo treatment as classify(). Used by the fused
        Stage-2 path (DetectorProgram.attach_classifier), where the
        classifier forward already ran inside the detector dispatch."""
        self.total_classified += 1
        return self._format_predictions(np.asarray(probs)[:top_k],
                                        np.asarray(ids)[:top_k])

    # -- label logic ------------------------------------------------------------
    def _format_predictions(self, probs: np.ndarray,
                            ids: np.ndarray) -> List[Dict[str, Any]]:
        preds = []
        for p, cid in zip(probs, ids):
            p = float(p)
            cid = int(cid)
            label, level = self.get_hierarchical_label(cid, p)
            if label is None:
                continue
            if self.enable_geographic_filter and self.allowed_species and \
                    label not in self.allowed_species:
                continue
            preds.append({
                "species_id": cid,
                "species_name": label,
                "taxonomic_level": level,
                "confidence": p,
            })
        return preds

    def get_hierarchical_label(
        self, class_id: int, confidence: float
    ) -> Tuple[Optional[str], Optional[str]]:
        """Confidence-banded taxonomy fallback
        (reference species_classifier.py:168-233)."""
        entry = self.taxonomy.get(str(class_id), {})
        if isinstance(entry, str):
            return (entry, "species")
        if not isinstance(entry, dict):
            entry = {}
        common = entry.get("common_name") or entry.get("name") or \
            f"species_{class_id}"
        if not self.use_hierarchical:
            return (common, "species")
        th = self.hierarchy_thresholds
        if confidence >= th["species"]:
            return (common, "species")
        for level in ("genus", "family", "order", "class"):
            if confidence >= th[level] and entry.get(level):
                return (entry[level], level)
        return (None, None)

    def get_stats(self) -> Dict[str, Any]:
        times = self._classify_times
        return {
            "model_name": self.model_name,
            "num_classes": self.num_classes,
            "total_classified": self.total_classified,
            "total_batches": self.total_batches,
            "avg_classify_ms": float(np.mean(times)) if times else 0.0,
            "taxonomy_entries": len(self.taxonomy),
            "geographic_filter": self.enable_geographic_filter,
        }
