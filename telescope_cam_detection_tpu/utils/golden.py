"""Golden-output comparator: detection parity gate (IoU >= threshold).

Used by parity tests and benches to compare this framework's detections
against recorded torch-reference outputs. The north-star gate is
bbox IoU >= 0.99 with matching classes (BASELINE.md).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence

from telescope_cam_detection_tpu.utils.bbox import bbox_iou


@dataclass
class ParityReport:
    matched: int = 0
    missed: int = 0       # golden detections with no counterpart
    spurious: int = 0     # produced detections with no golden counterpart
    class_mismatches: int = 0
    min_iou: float = 1.0
    mean_iou: float = 0.0
    details: List[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.missed == 0 and self.spurious == 0 and self.class_mismatches == 0

    def passes(self, iou_threshold: float = 0.99) -> bool:
        return self.ok and (self.matched == 0 or self.min_iou >= iou_threshold)


def _as_bbox(det: Dict[str, Any]) -> Dict[str, float]:
    bbox = det.get("bbox", det)
    return {k: float(bbox[k]) for k in ("x1", "y1", "x2", "y2")}


def compare_detections(
    golden: Sequence[Dict[str, Any]],
    produced: Sequence[Dict[str, Any]],
    iou_threshold: float = 0.5,
    score_tolerance: float = 0.05,
) -> ParityReport:
    """Greedy best-IoU matching between golden and produced detection lists.

    Matches are made within the same class when class info is present. A
    golden detection is "missed" when no produced detection overlaps it at
    >= iou_threshold; extras are "spurious".
    """
    report = ParityReport()
    used = [False] * len(produced)
    ious: List[float] = []

    for g in golden:
        g_box = _as_bbox(g)
        g_cls = g.get("class_id", g.get("class_name"))
        best_iou, best_idx = 0.0, -1
        for idx, p in enumerate(produced):
            if used[idx]:
                continue
            iou = bbox_iou(g_box, _as_bbox(p))
            if iou > best_iou:
                best_iou, best_idx = iou, idx
        if best_idx < 0 or best_iou < iou_threshold:
            report.missed += 1
            report.details.append(f"missed golden {g_cls} @ {g_box} (best IoU {best_iou:.3f})")
            continue
        used[best_idx] = True
        p = produced[best_idx]
        p_cls = p.get("class_id", p.get("class_name"))
        if g_cls is not None and p_cls is not None and g_cls != p_cls:
            report.class_mismatches += 1
            report.details.append(f"class mismatch: golden {g_cls} vs produced {p_cls}")
        g_score, p_score = g.get("confidence"), p.get("confidence")
        if (g_score is not None and p_score is not None
                and abs(float(g_score) - float(p_score)) > score_tolerance):
            report.details.append(
                f"score drift {g_cls}: golden {g_score:.4f} vs produced {p_score:.4f}")
        report.matched += 1
        ious.append(best_iou)

    report.spurious = sum(1 for u in used if not u)
    for idx, u in enumerate(used):
        if not u:
            p = produced[idx]
            report.details.append(
                f"spurious produced {p.get('class_name', p.get('class_id'))} @ {_as_bbox(p)}")
    if ious:
        report.min_iou = min(ious)
        report.mean_iou = sum(ious) / len(ious)
    return report
