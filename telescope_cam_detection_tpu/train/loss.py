"""YOLOX detection loss with static-shape label assignment.

The reference fine-tunes offline via ultralytics YOLOv8 scripts
(training/scripts/train_custom_model.py); this module is the TPU-native
replacement: a fully jittable detection loss over the Flax YOLOX head.

Assignment is a static-shape center-prior scheme (each GT claims the grid
cell containing its center at the scale-matched FPN level — the classic
anchor-free assignment; full SimOTA dynamic-k is a later refinement). All
tensors are fixed size: targets arrive as (B, MAX_GT, 5) xyxy+class with
class < 0 marking padding.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from telescope_cam_detection_tpu.models.yolox import STRIDES

# FPN level ranges by sqrt(GT area), in input pixels.
_LEVEL_BOUNDS = (64.0, 128.0)


def _bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid binary cross-entropy, elementwise, numerically stable."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _pairwise_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _assign_single(targets: jnp.ndarray, level_hw: Sequence[Tuple[int, int]],
                   num_classes: int):
    """One image: (MAX_GT, 5) -> per-anchor (obj_target (A,), box_target (A,4),
    cls_target (A,C), pos_mask (A,)). A = sum(H*W) over levels, in the same
    concatenation order as models.yolox.decode_outputs."""
    level_offsets = []
    off = 0
    for h, w in level_hw:
        level_offsets.append(off)
        off += h * w
    total_anchors = off

    cls_ids = targets[:, 4]
    valid = cls_ids >= 0
    x1, y1, x2, y2 = targets[:, 0], targets[:, 1], targets[:, 2], targets[:, 3]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    size = jnp.sqrt(jnp.clip((x2 - x1) * (y2 - y1), 1e-6))
    level = jnp.where(size < _LEVEL_BOUNDS[0], 0,
                      jnp.where(size < _LEVEL_BOUNDS[1], 1, 2))

    # anchor index of the center cell at the chosen level
    anchor_idx = jnp.zeros_like(cls_ids, dtype=jnp.int32)
    for li, ((h, w), stride) in enumerate(zip(level_hw, STRIDES)):
        gi = jnp.clip((cx / stride).astype(jnp.int32), 0, w - 1)
        gj = jnp.clip((cy / stride).astype(jnp.int32), 0, h - 1)
        idx = level_offsets[li] + gj * w + gi
        anchor_idx = jnp.where(level == li, idx, anchor_idx)

    obj_t = jnp.zeros((total_anchors,), jnp.float32)
    box_t = jnp.zeros((total_anchors, 4), jnp.float32)
    cls_t = jnp.zeros((total_anchors, num_classes), jnp.float32)

    safe_idx = jnp.where(valid, anchor_idx, 0)
    obj_t = obj_t.at[safe_idx].max(valid.astype(jnp.float32))
    box_t = box_t.at[safe_idx].set(
        jnp.where(valid[:, None], targets[:, :4], box_t[safe_idx]))
    onehot = jax.nn.one_hot(jnp.clip(cls_ids, 0).astype(jnp.int32), num_classes)
    cls_t = cls_t.at[safe_idx].max(onehot * valid[:, None])
    return obj_t, box_t, cls_t


def yolox_loss(
    level_outputs,                 # raw head outputs from YOLOX.__call__
    targets: jnp.ndarray,          # (B, MAX_GT, 5) xyxy+class, class<0 = pad
    num_classes: int = 80,
    obj_weight: float = 1.0,
    cls_weight: float = 1.0,
    iou_weight: float = 5.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Scalar loss + metric dict. Fully jittable; batch-vmapped assignment."""
    from telescope_cam_detection_tpu.models.yolox import decode_outputs

    level_hw = [tuple(reg.shape[1:3]) for reg, _, _ in level_outputs]
    boxes, _, _ = decode_outputs(level_outputs)  # (B, A, 4) decoded fp32

    obj_logits = jnp.concatenate(
        [obj.reshape(obj.shape[0], -1) for _, obj, _ in level_outputs], axis=1)
    cls_logits = jnp.concatenate(
        [cls.reshape(cls.shape[0], -1, num_classes)
         for _, _, cls in level_outputs], axis=1)

    assign = jax.vmap(lambda t: _assign_single(t, level_hw, num_classes))
    obj_t, box_t, cls_t = assign(targets)

    pos = obj_t > 0
    num_pos = jnp.maximum(jnp.sum(obj_t), 1.0)

    obj_loss = jnp.sum(_bce(obj_logits.astype(jnp.float32), obj_t)) / num_pos
    cls_loss = jnp.sum(
        _bce(cls_logits.astype(jnp.float32), cls_t) * pos[..., None]) / num_pos
    iou = _pairwise_iou_xyxy(boxes, box_t)
    iou_loss = jnp.sum((1.0 - iou ** 2) * pos) / num_pos  # SimOTA-style IoU^2

    total = obj_weight * obj_loss + cls_weight * cls_loss + iou_weight * iou_loss
    return total, {"loss": total, "obj_loss": obj_loss, "cls_loss": cls_loss,
                   "iou_loss": iou_loss, "num_pos": num_pos}
