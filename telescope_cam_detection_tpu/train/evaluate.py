"""Detection evaluation: COCO-style mAP over IoU thresholds.

Counterpart of reference training/scripts/evaluate_model.py (which delegates
to ultralytics' val): greedy per-class matching at IoU thresholds
0.5:0.95:0.05, 101-point interpolated AP, mAP@0.5 and mAP@[.5:.95].
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def average_precision(scores: np.ndarray, matched: np.ndarray,
                      n_gt: int) -> float:
    """101-point interpolated AP from (score, is_tp) pairs."""
    if n_gt == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = matched[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / n_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        mask = recall >= r
        ap += (precision[mask].max() if mask.any() else 0.0) / 101
    return float(ap)


def make_eval_fn(model, family: str = "yolox", conf_threshold: float = 0.05,
                 max_det: int = 50):
    """Build evaluate(variables, dataset, limit=0) -> mAP metrics.

    family selects the deploy decode — "yolox" = decode + batched NMS on
    raw BGR 0..255 frames; "rtdetr" = the serving preprocess (BGR u8 ->
    RGB 0..1, ops/preprocess.preprocess_rtdetr semantics) then NMS-free
    top-k rows — so the reported mAP reflects deployed behavior, not a
    different pixel convention. Variables are a traced argument (not
    baked into the executable), and the jitted program is built once per
    returned closure: per-epoch CLI evals reuse one compilation.
    """
    import jax
    import jax.numpy as jnp

    from telescope_cam_detection_tpu.runtime.program import rows_to_detections

    if family == "rtdetr":
        @jax.jit
        def infer(variables, imgs):
            x = imgs[..., ::-1] * (1.0 / 255.0)   # serving convention
            return model.apply(variables, x, train=False,
                               method=model.predict)

        def rows_of(variables, img):
            rows = np.asarray(infer(variables,
                                    jnp.asarray(img[None], jnp.float32)))[0]
            return rows[rows[:, 5] >= conf_threshold][:max_det]
    else:
        from telescope_cam_detection_tpu.models.yolox import decode_outputs
        from telescope_cam_detection_tpu.ops.nms import batched_nms

        @jax.jit
        def infer(variables, imgs):
            outs = model.apply(variables, imgs, train=False)
            boxes, obj, cls = decode_outputs(outs)
            return batched_nms(boxes, obj, cls,
                               conf_threshold=conf_threshold,
                               iou_threshold=0.45, max_det=max_det,
                               pre_nms_topk=max(4 * max_det, 200))

        def rows_of(variables, img):
            return np.asarray(infer(variables,
                                    jnp.asarray(img[None], jnp.float32)))[0]

    def evaluate(variables, dataset, limit: int = 0) -> Dict[str, float]:
        n = len(dataset) if not limit else min(limit, len(dataset))
        preds, gts = [], []
        for i in range(n):
            img, lbl = dataset.load(i)
            preds.append(rows_to_detections(rows_of(variables, img)))
            gts.append(lbl)
        return evaluate_detections(preds, gts)

    return evaluate


def evaluate_jax_model(model, variables, dataset, family: str = "yolox",
                       conf_threshold: float = 0.05, limit: int = 0,
                       max_det: int = 50) -> Dict[str, float]:
    """One-shot convenience over make_eval_fn (tools/tests)."""
    return make_eval_fn(model, family, conf_threshold, max_det)(
        variables, dataset, limit)


def evaluate_detections(
    predictions: Sequence[Sequence[Dict]],   # per image: detection dicts
    ground_truths: Sequence[np.ndarray],     # per image: (N, 5) xyxy+class
) -> Dict[str, float]:
    """Returns {'mAP50', 'mAP50_95', 'per_class': {cid: ap50}}."""
    # collect per class
    per_class_preds: Dict[int, List[Tuple[float, int, np.ndarray]]] = defaultdict(list)
    per_class_gts: Dict[int, Dict[int, np.ndarray]] = defaultdict(dict)
    n_gt: Dict[int, int] = defaultdict(int)

    for img_idx, gts in enumerate(ground_truths):
        gts = gts[gts[:, 4] >= 0] if len(gts) else gts
        for cid in np.unique(gts[:, 4]).astype(int) if len(gts) else []:
            boxes = gts[gts[:, 4] == cid][:, :4]
            per_class_gts[cid][img_idx] = boxes
            n_gt[cid] += len(boxes)
    for img_idx, preds in enumerate(predictions):
        for det in preds:
            bbox = det["bbox"]
            box = np.asarray([bbox["x1"], bbox["y1"], bbox["x2"], bbox["y2"]],
                             np.float32)
            per_class_preds[int(det["class_id"])].append(
                (float(det["confidence"]), img_idx, box))

    ap_by_thr: Dict[float, List[float]] = defaultdict(list)
    per_class_ap50: Dict[int, float] = {}
    for cid in sorted(set(per_class_preds) | set(n_gt)):
        preds = sorted(per_class_preds.get(cid, []), key=lambda p: -p[0])
        scores = np.asarray([p[0] for p in preds], np.float32)
        for thr in IOU_THRESHOLDS:
            used: Dict[int, set] = defaultdict(set)
            matched = np.zeros(len(preds), bool)
            for i, (_, img_idx, box) in enumerate(preds):
                gt_boxes = per_class_gts.get(cid, {}).get(img_idx)
                if gt_boxes is None or not len(gt_boxes):
                    continue
                ious = _iou_matrix(box[None], gt_boxes)[0]
                ious[list(used[img_idx])] = -1.0
                best = int(np.argmax(ious))
                if ious[best] >= thr:
                    matched[i] = True
                    used[img_idx].add(best)
            ap = average_precision(scores, matched, n_gt.get(cid, 0))
            ap_by_thr[round(thr, 2)].append(ap)
            if abs(thr - 0.5) < 1e-6:
                per_class_ap50[cid] = ap

    if not ap_by_thr:
        return {"mAP50": 0.0, "mAP50_95": 0.0, "per_class": {}}
    map50 = float(np.mean(ap_by_thr[0.5]))
    map5095 = float(np.mean([np.mean(v) for v in ap_by_thr.values()]))
    return {"mAP50": map50, "mAP50_95": map5095, "per_class": per_class_ap50}
