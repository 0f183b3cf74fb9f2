"""Detection overlay drawing (host-side, cv2).

Counterpart of reference ``src/visualization_utils.py:12-302``: per-class BGR
colors, Stage-1 boxes with confidence labels, Stage-2 species labels with
taxonomic level markers. Used by the snapshot saver (annotated images) and
the MJPEG stream.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# BGR palette for the classes that matter to the wildlife pipeline
CLASS_COLORS: Dict[str, Tuple[int, int, int]] = {
    "person": (0, 0, 255),       # red
    "bird": (255, 191, 0),       # deep sky blue
    "cat": (0, 165, 255),        # orange
    "dog": (0, 255, 255),        # yellow
    "bear": (0, 0, 139),         # dark red
    "horse": (128, 0, 128),
    "sheep": (203, 192, 255),
    "cow": (42, 42, 165),
}
DEFAULT_COLOR = (0, 255, 0)  # green


def class_color(name: str) -> Tuple[int, int, int]:
    return CLASS_COLORS.get(name, DEFAULT_COLOR)


def format_label(det: Dict[str, Any]) -> str:
    """Stage-1 label, upgraded to the Stage-2 species when present
    (reference visualization_utils.py:43-130)."""
    conf = det.get("confidence", 0.0)
    if det.get("species"):
        level = det.get("taxonomic_level", "species")
        sconf = det.get("species_confidence", conf)
        marker = "" if level == "species" else f" [{level}]"
        return f"{det['species']}{marker} {sconf:.0%}"
    return f"{det.get('class_name', '?')} {conf:.0%}"


def draw_bounding_box(frame: np.ndarray, det: Dict[str, Any],
                      thickness: int = 2, font_scale: float = 0.6) -> None:
    """Draw one detection (in place)."""
    if cv2 is None:
        return
    bbox = det["bbox"]
    x1, y1 = int(bbox["x1"]), int(bbox["y1"])
    x2, y2 = int(bbox["x2"]), int(bbox["y2"])
    color = class_color(det.get("class_name", ""))
    cv2.rectangle(frame, (x1, y1), (x2, y2), color, thickness)
    label = format_label(det)
    (tw, th), baseline = cv2.getTextSize(
        label, cv2.FONT_HERSHEY_SIMPLEX, font_scale, 1)
    ty = y1 - 6 if y1 - th - 8 >= 0 else y2 + th + 6
    cv2.rectangle(frame, (x1, ty - th - baseline), (x1 + tw + 4, ty + baseline),
                  color, -1)
    cv2.putText(frame, label, (x1 + 2, ty), cv2.FONT_HERSHEY_SIMPLEX,
                font_scale, (0, 0, 0), 1, cv2.LINE_AA)


def draw_detections(frame: np.ndarray, detections: Sequence[Dict[str, Any]],
                    copy: bool = True) -> np.ndarray:
    """Draw all detections; returns the annotated frame."""
    out = frame.copy() if copy else frame
    for det in detections:
        try:
            draw_bounding_box(out, det)
        except (KeyError, TypeError, ValueError):
            continue
    return out
