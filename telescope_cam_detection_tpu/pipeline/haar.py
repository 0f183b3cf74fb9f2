"""Viola-Jones Haar-cascade face detector (pure numpy, from scratch).

cv2 5.0 removed ``CascadeClassifier`` but still ships the trained cascade XML
data files; the reference's privacy masking depends on exactly this detector
(reference src/face_masker.py:97-151 used cv2's implementation). This module
re-implements the evaluator so face masking keeps working offline with the
bundled models: new-format stump cascade XML -> integral-image features ->
image-pyramid multiscale sliding windows -> rectangle grouping.

Semantics follow the classic OpenCV formulation: per-window variance
normalization (feature < threshold * varNorm picks the left leaf), stage sums
against stage thresholds with early rejection, pyramid scaling with the
window fixed at the training size.

Evaluation is vectorized over all alive windows per weak classifier; the
cascade rejects most windows in the first stages, so the heavy stages only
ever see a handful of candidates. This is a control-path component (runs on
the host every N-th frame via FaceMaskingCache, not per frame).
"""
from __future__ import annotations

import logging
import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# known locations of the cascade data files in this image
CASCADE_SEARCH_PATHS = (
    "/usr/share/opencv4/haarcascades",
    "/usr/share/opencv/haarcascades",
)
DEFAULT_FRONTAL_FACE = "haarcascade_frontalface_default.xml"


def find_cascade_file(name: str = DEFAULT_FRONTAL_FACE) -> Optional[str]:
    try:
        import cv2
        cand = os.path.join(cv2.data.haarcascades, name)
        if os.path.exists(cand):
            return cand
    except Exception:
        pass
    for root in CASCADE_SEARCH_PATHS:
        cand = os.path.join(root, name)
        if os.path.exists(cand):
            return cand
    return None


@dataclass
class _Stage:
    threshold: float
    # stump arrays, one entry per weak classifier in this stage
    feature_idx: np.ndarray      # (W,) int32
    node_threshold: np.ndarray   # (W,) float64
    left_val: np.ndarray         # (W,) float64
    right_val: np.ndarray        # (W,) float64


class HaarCascade:
    """A parsed stump-based cascade (new-format OpenCV XML)."""

    def __init__(self, window_hw: Tuple[int, int], stages: List[_Stage],
                 rects: np.ndarray, rect_weights: np.ndarray,
                 rect_counts: np.ndarray):
        self.window_hw = window_hw
        self.stages = stages
        # rects: (F, 3, 4) as (x, y, w, h) per rect (up to 3, zero-padded)
        self.rects = rects
        self.rect_weights = rect_weights   # (F, 3)
        self.rect_counts = rect_counts     # (F,)

    # -- parsing --------------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "HaarCascade":
        root = ET.parse(path).getroot()
        casc = root.find("cascade")
        if casc is None:
            raise ValueError(f"{path}: not a new-format cascade XML")
        if (casc.findtext("stageType") != "BOOST"
                or casc.findtext("featureType") != "HAAR"):
            raise ValueError(f"{path}: unsupported cascade type")
        height = int(casc.findtext("height"))
        width = int(casc.findtext("width"))

        feats = []
        for f in casc.find("features"):
            if f.findtext("tilted") not in (None, "0"):
                raise ValueError(f"{path}: tilted features unsupported")
            rs = []
            for r in f.find("rects"):
                vals = r.text.split()
                rs.append((int(vals[0]), int(vals[1]), int(vals[2]),
                           int(vals[3]), float(vals[4])))
            feats.append(rs)
        nf = len(feats)
        rects = np.zeros((nf, 3, 4), np.int32)
        weights = np.zeros((nf, 3), np.float64)
        counts = np.zeros((nf,), np.int32)
        for i, rs in enumerate(feats):
            if len(rs) > 3:
                raise ValueError("more than 3 rects per feature")
            counts[i] = len(rs)
            for j, (x, y, w, h, wt) in enumerate(rs):
                rects[i, j] = (x, y, w, h)
                weights[i, j] = wt

        stages = []
        for st in casc.find("stages"):
            thr = float(st.findtext("stageThreshold"))
            fidx, nthr, lval, rval = [], [], [], []
            for wc in st.find("weakClassifiers"):
                nodes = wc.findtext("internalNodes").split()
                leaves = wc.findtext("leafValues").split()
                if len(nodes) != 4 or len(leaves) != 2:
                    raise ValueError("only stump cascades supported")
                # nodes = [left, right, featureIdx, threshold]
                fidx.append(int(nodes[2]))
                nthr.append(float(nodes[3]))
                lval.append(float(leaves[0]))
                rval.append(float(leaves[1]))
            stages.append(_Stage(thr, np.asarray(fidx, np.int32),
                                 np.asarray(nthr), np.asarray(lval),
                                 np.asarray(rval)))
        return cls((height, width), stages, rects, weights, counts)

    # -- evaluation -------------------------------------------------------------
    def _corner_offsets(self, w1: int) -> np.ndarray:
        """(F, 3, 4) flat-index offsets of each rect's integral corners
        [a=(y,x), b=(y,x+w), c=(y+h,x), d=(y+h,x+w)] for row stride w1."""
        x = self.rects[..., 0].astype(np.int64)
        y = self.rects[..., 1].astype(np.int64)
        w = self.rects[..., 2].astype(np.int64)
        h = self.rects[..., 3].astype(np.int64)
        return np.stack([y * w1 + x, y * w1 + x + w,
                         (y + h) * w1 + x, (y + h) * w1 + x + w], axis=-1)

    def _eval_windows(self, ii: np.ndarray, sq: np.ndarray,
                      xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
        """Evaluate all stages on windows at (xs, ys) in a scaled image.

        ii/sq: integral and squared-integral images, shape (H+1, W+1).
        Returns a bool mask of accepted windows. Vectorized per stage: all of
        a stage's weak stumps evaluate as one (weaks, windows) gather — the
        (W x N) working set stays small because N collapses while W grows.
        """
        wh, ww = self.window_hw
        w1 = ii.shape[1]
        inv_area = 1.0 / (wh * ww)
        flat_ii = ii.ravel()
        flat_sq = sq.ravel()
        base = ys.astype(np.int64) * w1 + xs.astype(np.int64)

        win_off = self._corner_offsets(w1)  # reused for the window itself
        full = np.array([0, ww, wh * w1, wh * w1 + ww], np.int64)
        total = (flat_ii[base + full[3]] - flat_ii[base + full[1]]
                 - flat_ii[base + full[2]] + flat_ii[base + full[0]])
        total_sq = (flat_sq[base + full[3]] - flat_sq[base + full[1]]
                    - flat_sq[base + full[2]] + flat_sq[base + full[0]])
        mean = total * inv_area
        variance = total_sq * inv_area - mean * mean
        vnorm = np.where(variance > 0, np.sqrt(np.maximum(variance, 0)), 1.0)

        alive = np.arange(len(base))
        cur_base = base
        cur_vnorm = vnorm
        for stage in self.stages:
            if len(alive) == 0:
                break
            offs = win_off[stage.feature_idx]            # (W, 3, 4)
            wts = self.rect_weights[stage.feature_idx]   # (W, 3)
            vals = flat_ii[cur_base[None, None, None, :] + offs[..., None]]
            rectsums = vals[:, :, 3] - vals[:, :, 1] - vals[:, :, 2] \
                + vals[:, :, 0]                          # (W, 3, N)
            f = (wts[..., None] * rectsums).sum(axis=1) * inv_area  # (W, N)
            go_left = f < stage.node_threshold[:, None] * cur_vnorm[None, :]
            leaf = np.where(go_left, stage.left_val[:, None],
                            stage.right_val[:, None])
            keep = leaf.sum(axis=0) >= stage.threshold
            alive = alive[keep]
            cur_base = cur_base[keep]
            cur_vnorm = cur_vnorm[keep]
        mask = np.zeros(len(base), bool)
        mask[alive] = True
        return mask

    def detect_multi_scale(
        self,
        gray: np.ndarray,
        scale_factor: float = 1.1,
        min_neighbors: int = 3,
        min_size: Tuple[int, int] = (30, 30),
        max_size: Optional[Tuple[int, int]] = None,
        step: int = 2,
    ) -> List[Tuple[int, int, int, int]]:
        """gray (H, W) uint8 -> list of (x, y, w, h) face boxes."""
        try:
            import cv2
            resize = lambda im, wh: cv2.resize(  # noqa: E731
                im, wh, interpolation=cv2.INTER_LINEAR)
        except ImportError:  # pragma: no cover
            resize = _resize_nearest
        h, w = gray.shape
        wh, ww = self.window_hw
        candidates: List[Tuple[int, int, int, int]] = []
        scale = max(min_size[0] / wh, min_size[1] / ww, 1.0)
        while True:
            win_h, win_w = int(wh * scale), int(ww * scale)
            if win_h > h or win_w > w:
                break
            if max_size and (win_h > max_size[0] or win_w > max_size[1]):
                break
            sh, sw = int(round(h / scale)), int(round(w / scale))
            scaled = resize(gray, (sw, sh))
            ii = _integral(scaled.astype(np.float64))
            sq = _integral(scaled.astype(np.float64) ** 2)
            ys, xs = np.meshgrid(
                np.arange(0, sh - wh + 1, step),
                np.arange(0, sw - ww + 1, step), indexing="ij")
            xs, ys = xs.ravel(), ys.ravel()
            if len(xs):
                mask = self._eval_windows(ii, sq, xs, ys)
                for x, y in zip(xs[mask], ys[mask]):
                    candidates.append((int(round(x * scale)),
                                       int(round(y * scale)),
                                       int(round(ww * scale)),
                                       int(round(wh * scale))))
            scale *= scale_factor
        return group_rectangles(candidates, min_neighbors)


def _integral(img: np.ndarray) -> np.ndarray:
    out = np.zeros((img.shape[0] + 1, img.shape[1] + 1), np.float64)
    np.cumsum(np.cumsum(img, axis=0), axis=1, out=out[1:, 1:])
    return out


def _resize_nearest(im: np.ndarray, wh: Tuple[int, int]) -> np.ndarray:
    w, h = wh
    yi = (np.arange(h) * im.shape[0] / h).astype(int)
    xi = (np.arange(w) * im.shape[1] / w).astype(int)
    return im[yi][:, xi]


def group_rectangles(rects: Sequence[Tuple[int, int, int, int]],
                     min_neighbors: int,
                     eps: float = 0.2) -> List[Tuple[int, int, int, int]]:
    """Cluster near-identical candidate windows; keep clusters with at least
    ``min_neighbors`` members and return their averaged rectangles."""
    n = len(rects)
    if n == 0:
        return []
    if min_neighbors <= 0:
        return [tuple(r) for r in rects]
    arr = np.asarray(rects, np.float64)
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            delta = eps * 0.5 * (min(arr[i, 2], arr[j, 2]) +
                                 min(arr[i, 3], arr[j, 3]))
            if (abs(arr[i, 0] - arr[j, 0]) <= delta
                    and abs(arr[i, 1] - arr[j, 1]) <= delta
                    and abs(arr[i, 0] + arr[i, 2] - arr[j, 0] - arr[j, 2])
                    <= delta
                    and abs(arr[i, 1] + arr[i, 3] - arr[j, 1] - arr[j, 3])
                    <= delta):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    clusters: dict = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(i)
    out = []
    for members in clusters.values():
        if len(members) < min_neighbors:
            continue
        avg = arr[members].mean(axis=0)
        out.append(tuple(int(round(v)) for v in avg))
    return out
