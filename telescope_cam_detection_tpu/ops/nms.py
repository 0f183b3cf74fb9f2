"""Batched class-aware NMS with static output shapes.

Replaces ``yolox.utils.postprocess`` (reference yolox_detector.py:309-314) —
torch NMS produces dynamic-length outputs, which cannot live inside a jitted
TPU program. Here every stage has static shapes:

  raw head outputs (A anchors) -> confidence mask -> top-K prefilter
  (jax.lax.top_k) -> greedy class-aware suppression over the KxK IoU matrix
  -> fixed (max_det, 7) rows [x1,y1,x2,y2,obj_conf,class_conf,class_id],
  invalid rows marked score < 0.

Greedy order matches torchvision semantics (score-sorted, suppress-if-IoU >
threshold against an already-kept box, class-aware via per-class coordinate
offsets). The suppression loop is a lax.fori_loop over K keep decisions with
an O(K) vector body — K (pre-NMS top-k) is 300-1000 so this is microseconds
on the VPU and fuses with the surrounding program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between (M,4) and (N,4) xyxy boxes -> (M,N)."""
    area_a = jnp.clip(boxes_a[:, 2] - boxes_a[:, 0], 0) * \
        jnp.clip(boxes_a[:, 3] - boxes_a[:, 1], 0)
    area_b = jnp.clip(boxes_b[:, 2] - boxes_b[:, 0], 0) * \
        jnp.clip(boxes_b[:, 3] - boxes_b[:, 1], 0)
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    # safe divide: zero-area pairs (invalid -1 rows) make union exactly 0;
    # the where masks the value either way, but dividing by 1 keeps the
    # graph clean under jax_debug_nans (0/0 in the untaken branch trips it)
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def _greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray,
                     iou_threshold: float) -> jnp.ndarray:
    """Greedy keep mask over score-desc-sorted candidates.

    keep[i] = valid[i] and no kept j<i has IoU(j,i) > threshold.

    Computed by fixpoint iteration instead of a K-step sequential scan: start
    optimistic (keep = valid) and repeatedly re-evaluate the greedy
    recurrence as one O(K^2) masked matrix reduction until the mask stops
    changing. Each pass is a single fused VPU computation, and convergence
    takes at most the longest suppression chain (typically 2-5 passes), so
    this is orders of magnitude faster on TPU than fori_loop(K) while
    producing the exact greedy (torchvision-identical) result.
    """
    k = iou.shape[0]
    over = (iou > iou_threshold) & (
        jax.lax.broadcasted_iota(jnp.int32, (k, k), 0) <
        jax.lax.broadcasted_iota(jnp.int32, (k, k), 1))  # j < i, strictly upper

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(over & keep[:, None], axis=0)
        return valid & ~suppressed, keep, it + 1

    init = (valid, jnp.zeros_like(valid), jnp.asarray(0, jnp.int32))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


def _prep_single(boxes, obj_conf, class_probs, conf_threshold, pre_nms_topk,
                 class_agnostic):
    """Confidence mask + top-K prefilter + class coordinate offsets."""
    num_anchors, _ = class_probs.shape
    class_conf = jnp.max(class_probs, axis=-1)
    class_id = jnp.argmax(class_probs, axis=-1)
    score = obj_conf * class_conf
    valid = score >= conf_threshold

    k = min(pre_nms_topk, num_anchors)
    top_scores, top_idx = jax.lax.top_k(jnp.where(valid, score, -1.0), k)
    top_boxes = boxes[top_idx]
    top_valid = top_scores >= 0.0
    top_cls = class_id[top_idx]

    if class_agnostic:
        offset_boxes = top_boxes
    else:
        # torchvision batched_nms trick: displace each class into its own
        # coordinate region so cross-class pairs never overlap.
        span = jnp.max(jnp.abs(top_boxes)) + 1.0
        offset_boxes = top_boxes + (top_cls.astype(top_boxes.dtype) * span)[:, None]
    return offset_boxes, top_valid, top_scores, top_idx, class_conf, class_id


def _compact_single(keep, top_scores, top_idx, boxes, obj_conf, class_conf,
                    class_id, max_det):
    """Kept rows -> front, score order preserved -> (max_det, 7)."""
    k = top_scores.shape[0]
    kept_scores = jnp.where(keep, top_scores, -1.0)
    if max_det > k:  # pad candidate pool so top_k(max_det) is well-formed
        pad = max_det - k
        kept_scores = jnp.concatenate([kept_scores, jnp.full((pad,), -1.0, kept_scores.dtype)])
        top_idx = jnp.concatenate([top_idx, jnp.zeros((pad,), top_idx.dtype)])
    out_scores, order = jax.lax.top_k(kept_scores, max_det)
    sel = top_idx[order]
    rows = jnp.concatenate([
        boxes[sel],
        obj_conf[sel][:, None],
        class_conf[sel][:, None],
        class_id[sel].astype(boxes.dtype)[:, None],
    ], axis=-1)
    # Invalidate rows beyond the kept count.
    invalid_row = jnp.full((7,), -1.0, dtype=rows.dtype)
    return jnp.where((out_scores >= 0.0)[:, None], rows, invalid_row[None, :])


def nms_single(
    boxes: jnp.ndarray,          # (A, 4) xyxy in model-input coords
    obj_conf: jnp.ndarray,       # (A,)
    class_probs: jnp.ndarray,    # (A, C)
    conf_threshold: float,
    iou_threshold: float,
    max_det: int,
    pre_nms_topk: int = 1000,
    class_agnostic: bool = False,
) -> jnp.ndarray:
    """Single-image class-aware NMS -> (max_det, 7) static output."""
    offset_boxes, top_valid, top_scores, top_idx, class_conf, class_id = \
        _prep_single(boxes, obj_conf, class_probs, conf_threshold,
                     pre_nms_topk, class_agnostic)
    keep = _greedy_suppress(iou_matrix(offset_boxes, offset_boxes),
                            top_valid, iou_threshold)
    return _compact_single(keep, top_scores, top_idx, boxes, obj_conf,
                           class_conf, class_id, max_det)


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    # measured on the v5e at B=8, pre_nms_topk=1000 (docs/PERFORMANCE.md
    # NMS row): statistical parity (xla 1.2-1.5 ms vs pallas 1.2-1.4 ms
    # per call) — at K=1000 the KxK matrix fits caches either way. Auto
    # keeps the plain XLA fixpoint (no Pallas lowering dependency).
    return "xla"


@functools.partial(
    jax.jit,
    static_argnames=("conf_threshold", "iou_threshold", "max_det",
                     "pre_nms_topk", "class_agnostic", "impl"),
)
def batched_nms(
    boxes: jnp.ndarray,        # (B, A, 4)
    obj_conf: jnp.ndarray,     # (B, A)
    class_probs: jnp.ndarray,  # (B, A, C)
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: int = 1000,
    class_agnostic: bool = False,
    impl: str = "auto",        # "auto" | "xla" | "pallas"
) -> jnp.ndarray:
    """Batch of images -> (B, max_det, 7).

    impl selects the greedy-suppression backend: "xla" (fixpoint over the
    HBM IoU matrix) or "pallas" (ops/pallas_nms.py: boxes + IoU matrix +
    keep mask VMEM-resident for the whole suppression); identical keep
    decisions (tests/test_pallas_nms.py cross-checks)."""
    resolved = _resolve_impl(impl)
    prep = jax.vmap(functools.partial(
        _prep_single, conf_threshold=conf_threshold,
        pre_nms_topk=pre_nms_topk, class_agnostic=class_agnostic))
    offset_boxes, top_valid, top_scores, top_idx, class_conf, class_id = \
        prep(boxes, obj_conf, class_probs)
    if resolved == "pallas":
        from telescope_cam_detection_tpu.ops.pallas_nms import pallas_suppress
        keep = pallas_suppress(offset_boxes, top_valid,
                               iou_threshold=iou_threshold)
    else:
        keep = jax.vmap(functools.partial(
            _greedy_suppress, iou_threshold=iou_threshold))(
                jax.vmap(iou_matrix)(offset_boxes, offset_boxes), top_valid)
    compact = jax.vmap(functools.partial(_compact_single, max_det=max_det))
    return compact(keep, top_scores, top_idx, boxes, obj_conf, class_conf,
                   class_id)


# ---------------------------------------------------------------------------
# Host-side reference implementation (numpy) for tests / parity checks
# ---------------------------------------------------------------------------

def nms_reference_numpy(
    boxes: np.ndarray,
    obj_conf: np.ndarray,
    class_probs: np.ndarray,
    conf_threshold: float,
    iou_threshold: float,
    max_det: int,
    class_agnostic: bool = False,
) -> np.ndarray:
    """Straightforward O(n^2) greedy NMS, torchvision-ordered. Returns
    (n_kept, 7) rows in score-descending order."""
    class_conf = class_probs.max(axis=-1)
    class_id = class_probs.argmax(axis=-1)
    score = obj_conf * class_conf
    idx = np.argsort(-score, kind="stable")
    idx = idx[score[idx] >= conf_threshold]

    kept = []
    for i in idx:
        ok = True
        for j in kept:
            if not class_agnostic and class_id[i] != class_id[j]:
                continue
            ix1 = max(boxes[i, 0], boxes[j, 0])
            iy1 = max(boxes[i, 1], boxes[j, 1])
            ix2 = min(boxes[i, 2], boxes[j, 2])
            iy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
            area_i = max(0.0, boxes[i, 2] - boxes[i, 0]) * max(0.0, boxes[i, 3] - boxes[i, 1])
            area_j = max(0.0, boxes[j, 2] - boxes[j, 0]) * max(0.0, boxes[j, 3] - boxes[j, 1])
            union = area_i + area_j - inter
            if union > 0 and inter / union > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(i)
            if len(kept) >= max_det:
                break
    rows = [
        [*boxes[i], obj_conf[i], class_conf[i], float(class_id[i])]
        for i in kept
    ]
    return np.asarray(rows, dtype=np.float32).reshape(len(kept), 7)
