"""RT-DETR training loss: Hungarian set matching + varifocal/L1/GIoU.

The reference never trains its RT-DETR detector (it consumes upstream
checkpoints, /root/reference/src/rtdetr_detector.py:60-141; its offline
training path is ultralytics YOLOv8 only). This module completes the
framework's training story for the second Stage-1 family with the loss
upstream RT-DETRv2 trains under, rebuilt fully jittable:

  * exact Hungarian matching per decoder output (train/matcher.py — pure
    lax control flow, so the whole step stays one XLA program and shards
    over the data axis of a Mesh);
  * varifocal classification loss (IoU-aware targets on matched queries);
  * L1 + generalized-IoU box losses in normalized cxcywh space;
  * deep supervision: every decoder layer and the encoder's top-k
    selection head get independently matched auxiliary losses.

Targets use the same fixed-shape convention as the YOLOX loss
(train/loss.py): (B, MAX_GT, 5) = xyxy in input pixels + class id, with
class < 0 marking padding rows.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from telescope_cam_detection_tpu.train.matcher import hungarian_match

# Matcher cost weights (upstream RT-DETR matcher config:
# weight_dict {cost_class 2, cost_bbox 5, cost_giou 2}, focal alpha/gamma
# 0.25/2) and loss weights (vfl 1, bbox 5, giou 2).
COST_CLASS, COST_BBOX, COST_GIOU = 2.0, 5.0, 2.0
W_VFL, W_BBOX, W_GIOU = 1.0, 5.0, 2.0
_FOCAL_ALPHA, _FOCAL_GAMMA = 0.25, 2.0
_VFL_ALPHA, _VFL_GAMMA = 0.75, 2.0


def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU over broadcastable xyxy boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    union = area_a + area_b - inter
    # double-where safe division: zero-area pairs (padding targets vs
    # degenerate boxes) make union exactly 0, and a naked inter/union NaNs
    # BOTH the forward (0/0, masked by where) and the VJP (cotangent/union
    # is 0/0 even when this term's weight is zero) — see the measured
    # failure note in train/loss.py _pairwise_iou_xyxy
    safe_union = jnp.where(union > 0, union, 1.0)
    return jnp.where(union > 0, inter / safe_union, 0.0), union


def generalized_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU over broadcastable xyxy boxes."""
    iou, union = iou_xyxy(a, b)
    # smallest enclosing box
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = jnp.clip(erb - elt, 0)
    enc = ewh[..., 0] * ewh[..., 1]
    safe_enc = jnp.where(enc > 0, enc, 1.0)   # same safe-div pattern
    return iou - jnp.where(enc > 0, (enc - union) / safe_enc, 0.0)


def _targets_to_cxcywh_norm(targets: jnp.ndarray,
                            input_hw: Tuple[int, int]):
    """(.., G, 5) xyxy pixels + class -> normalized cxcywh, class, valid."""
    h, w = float(input_hw[0]), float(input_hw[1])
    x1, y1 = targets[..., 0] / w, targets[..., 1] / h
    x2, y2 = targets[..., 2] / w, targets[..., 3] / h
    boxes = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2,
                       jnp.clip(x2 - x1, 0), jnp.clip(y2 - y1, 0)], -1)
    cls = targets[..., 4]
    valid = cls >= 0
    return boxes, jnp.clip(cls, 0).astype(jnp.int32), valid


def _bce_logits(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _matching_cost(logits, boxes, gt_boxes, gt_cls, valid):
    """One image: (Q,C) logits, (Q,4) cxcywh, (G,4), (G,), (G,) -> (G,Q).

    Focal-aware class cost + L1 + GIoU (upstream HungarianMatcher with
    use_focal_loss=True). Padded GT rows get constant 0 cost: a constant
    row shifts every assignment's total equally, so valid rows still get
    the columns an unpadded problem would give them.
    """
    p = jax.nn.sigmoid(logits.astype(jnp.float32))        # (Q, C)
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    pos = _FOCAL_ALPHA * ((1 - p) ** _FOCAL_GAMMA) * (-jnp.log(p))
    neg = (1 - _FOCAL_ALPHA) * (p ** _FOCAL_GAMMA) * (-jnp.log(1 - p))
    cost_cls = (pos - neg)[:, gt_cls].T                   # (G, Q)

    cost_l1 = jnp.sum(jnp.abs(gt_boxes[:, None, :] - boxes[None, :, :]), -1)
    cost_giou = -generalized_iou(
        cxcywh_to_xyxy(gt_boxes)[:, None, :], cxcywh_to_xyxy(boxes)[None, :, :])

    cost = COST_CLASS * cost_cls + COST_BBOX * cost_l1 + COST_GIOU * cost_giou
    return jnp.where(valid[:, None], cost, 0.0)


def _layer_loss(logits, boxes, gt_boxes, gt_cls, valid, num_classes,
                num_boxes):
    """Matched VFL + L1 + GIoU for one output head, batched.

    logits (B,Q,C), boxes (B,Q,4) cxcywh; gt_* (B,G,..); num_boxes scalar.
    """
    b, q, c = logits.shape
    cost = jax.vmap(_matching_cost)(
        jax.lax.stop_gradient(logits), jax.lax.stop_gradient(boxes),
        gt_boxes, gt_cls, valid)
    cols = hungarian_match(cost)                          # (B, G)

    # gather matched predictions per GT row
    m_boxes = jnp.take_along_axis(boxes, cols[..., None], axis=1)  # (B,G,4)
    ious, _ = iou_xyxy(cxcywh_to_xyxy(jax.lax.stop_gradient(m_boxes)),
                       cxcywh_to_xyxy(gt_boxes))          # (B, G)

    # --- varifocal classification (upstream loss_labels_vfl)
    onehot = jax.nn.one_hot(gt_cls, c) * valid[..., None]        # (B,G,C)
    tgt_score = jnp.zeros((b, q, c), jnp.float32)
    scatter = jax.vmap(lambda t, col, src: t.at[col].add(src))
    tgt_score = scatter(tgt_score, cols, onehot * ious[..., None])
    tgt_onehot = scatter(jnp.zeros((b, q, c), jnp.float32), cols, onehot)

    pred = jax.nn.sigmoid(jax.lax.stop_gradient(logits.astype(jnp.float32)))
    weight = _VFL_ALPHA * (pred ** _VFL_GAMMA) * (1 - tgt_onehot) + tgt_score
    vfl = _bce_logits(logits.astype(jnp.float32), tgt_score) * weight
    loss_vfl = jnp.sum(jnp.mean(vfl, axis=1)) * q / num_boxes

    # --- box losses over matched pairs only
    vmask = valid[..., None].astype(jnp.float32)
    loss_l1 = jnp.sum(jnp.abs(m_boxes - gt_boxes) * vmask) / num_boxes
    giou = generalized_iou(cxcywh_to_xyxy(m_boxes), cxcywh_to_xyxy(gt_boxes))
    loss_giou = jnp.sum((1.0 - giou) * valid) / num_boxes
    return loss_vfl, loss_l1, loss_giou


def _dn_layer_loss(logits, boxes, q_gt_boxes, q_gt_cls, pos, denom):
    """Denoising losses for one layer: targets are KNOWN per query.

    logits (B,D,C), boxes (B,D,4) cxcywh; q_gt_* (B,D,..) the source GT of
    each dn query; pos (B,D) = positive AND valid. Positives reconstruct
    their GT (VFL with IoU target + L1 + GIoU); negatives/padding target
    background (zero scores, no box loss).
    """
    b, d, c = logits.shape
    ious, _ = iou_xyxy(cxcywh_to_xyxy(jax.lax.stop_gradient(boxes)),
                       cxcywh_to_xyxy(q_gt_boxes))             # (B, D)
    onehot = jax.nn.one_hot(q_gt_cls, c) * pos[..., None]
    tgt_score = onehot * ious[..., None]
    pred = jax.nn.sigmoid(jax.lax.stop_gradient(logits.astype(jnp.float32)))
    weight = _VFL_ALPHA * (pred ** _VFL_GAMMA) * (1 - onehot) + tgt_score
    vfl = _bce_logits(logits.astype(jnp.float32), tgt_score) * weight
    loss_vfl = jnp.sum(jnp.mean(vfl, axis=1)) * d / denom

    pmask = pos[..., None].astype(jnp.float32)
    loss_l1 = jnp.sum(jnp.abs(boxes - q_gt_boxes) * pmask) / denom
    giou = generalized_iou(cxcywh_to_xyxy(boxes), cxcywh_to_xyxy(q_gt_boxes))
    loss_giou = jnp.sum((1.0 - giou) * pos) / denom
    return loss_vfl, loss_l1, loss_giou


def rtdetr_loss(
    outputs,
    targets: jnp.ndarray,
    input_hw: Tuple[int, int],
    num_classes: int = 80,
    dn_meta: Dict[str, jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Scalar training loss + metrics for RTDETR.__call__(return_aux=True).

    outputs: (logits, boxes, aux) where aux = {"layers": ((logits, boxes),
    ... one per non-final decoder layer), "enc": (logits, boxes),
    "dn_layers": per-layer denoising predictions when training with CDN}.
    targets: (B, MAX_GT, 5) xyxy pixels + class, class < 0 padding.
    dn_meta: the dict build_cdn_queries returned (positive/gt_idx/valid)
    when dn queries were fed to the model.
    """
    logits, boxes, aux = outputs
    gt_boxes, gt_cls, valid = _targets_to_cxcywh_norm(targets, input_hw)
    num_boxes = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

    heads = [(logits, boxes)]
    heads.extend(aux.get("layers", ()))
    if aux.get("enc") is not None:
        heads.append(aux["enc"])

    total = jnp.float32(0.0)
    metrics: Dict[str, jnp.ndarray] = {}
    for idx, (lg, bx) in enumerate(heads):
        vfl, l1, giou = _layer_loss(lg, bx, gt_boxes, gt_cls, valid,
                                    num_classes, num_boxes)
        total = total + W_VFL * vfl + W_BBOX * l1 + W_GIOU * giou
        if idx == 0:
            metrics.update(vfl_loss=vfl, l1_loss=l1, giou_loss=giou)

    dn_layers = aux.get("dn_layers", ())
    if dn_layers and dn_meta is not None:
        g = targets.shape[1]
        d = dn_meta["gt_idx"].shape[1]
        num_groups = max(d // (2 * g), 1)
        denom = num_boxes * num_groups       # upstream loss_dn denominator
        q_gt_boxes = jnp.take_along_axis(
            gt_boxes, dn_meta["gt_idx"][..., None], axis=1)
        q_gt_cls = jnp.take_along_axis(gt_cls, dn_meta["gt_idx"], axis=1)
        pos = dn_meta["positive"] & dn_meta["valid"]
        dn_total = jnp.float32(0.0)
        for lg, bx in dn_layers:
            vfl, l1, giou = _dn_layer_loss(lg, bx, q_gt_boxes, q_gt_cls,
                                           pos, denom)
            dn_total = dn_total + W_VFL * vfl + W_BBOX * l1 + W_GIOU * giou
        total = total + dn_total
        metrics["dn_loss"] = dn_total

    metrics["loss"] = total
    metrics["num_pos"] = num_boxes
    return total, metrics
