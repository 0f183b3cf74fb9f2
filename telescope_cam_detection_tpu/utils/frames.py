"""Synthetic + recorded frame sources for hermetic testing.

The reference has no hermetic pipeline tests (SURVEY §4); this module is the
fake-camera layer it lacks. Frame dicts follow the reference contract
(``stream_capture.py:230-236``):
  {frame: np.uint8 HxWx3 BGR, timestamp: float, frame_id: int,
   camera_id: str, camera_name: str}
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np


def make_frame_dict(
    frame: np.ndarray,
    frame_id: int,
    camera_id: str = "cam1",
    camera_name: str = "Test Camera",
    timestamp: Optional[float] = None,
) -> Dict[str, Any]:
    return {
        "frame": frame,
        "timestamp": time.time() if timestamp is None else timestamp,
        "frame_id": frame_id,
        "camera_id": camera_id,
        "camera_name": camera_name,
    }


def _smooth_background(rng: np.random.Generator, width: int,
                       height: int) -> np.ndarray:
    """Smooth low-frequency background (like a real outdoor scene), not
    per-pixel noise: real camera frames are spatially correlated, which
    matters for anything measuring transfer/encode behavior."""
    coarse = rng.integers(60, 140, size=(max(height // 32, 1),
                                         max(width // 32, 1), 3))
    ys = np.linspace(0, coarse.shape[0] - 1, height)
    xs = np.linspace(0, coarse.shape[1] - 1, width)
    yi, xi = np.floor(ys).astype(int), np.floor(xs).astype(int)
    yf, xf = (ys - yi)[:, None, None], (xs - xi)[None, :, None]
    y1 = np.minimum(yi + 1, coarse.shape[0] - 1)
    x1 = np.minimum(xi + 1, coarse.shape[1] - 1)
    base = ((1 - yf) * (1 - xf) * coarse[np.ix_(yi, xi)]
            + (1 - yf) * xf * coarse[np.ix_(yi, x1)]
            + yf * (1 - xf) * coarse[np.ix_(y1, xi)]
            + yf * xf * coarse[np.ix_(y1, x1)])
    return np.clip(base, 0, 255).astype(np.uint8)


class SyntheticFrameSource:
    """Deterministic frame generator: static desert-like background with an
    optional moving bright blob (the "animal"). Seeded so golden traces are
    reproducible across runs and backends."""

    def __init__(
        self,
        width: int = 640,
        height: int = 640,
        seed: int = 0,
        moving_object: bool = True,
        object_size: int = 60,
        noise_sigma: float = 2.0,
    ):
        self.width = width
        self.height = height
        self.moving_object = moving_object
        self.object_size = object_size
        self.noise_sigma = noise_sigma
        rng = np.random.default_rng(seed)
        self._background = _smooth_background(rng, width, height)
        # Sensor noise: one precomputed plane, spatially rolled per frame.
        # rng.normal over the full frame cost ~1.5 s at 1440p (it throttled
        # every consumer pretending to be a 30 fps camera); a rolled plane is
        # ~30 ms, still changes every frame, stays incompressible, and makes
        # frame_at(i) pure in i (deterministic regardless of call order).
        if noise_sigma > 0:
            self._noise = rng.normal(0.0, noise_sigma,
                                     size=(height, width, 3)).astype(np.int16)
        else:
            self._noise = None
        self._rng = rng
        self._frame_id = 0

    def object_position(self, frame_id: int) -> Tuple[int, int]:
        """Top-left corner of the moving blob on a diagonal trajectory."""
        span_x = max(1, self.width - self.object_size - 1)
        span_y = max(1, self.height - self.object_size - 1)
        x = (frame_id * 7) % span_x
        y = (frame_id * 5) % span_y
        return x, y

    def frame_at(self, frame_id: int) -> np.ndarray:
        if self._noise is not None:
            dy = (frame_id * 31 + 7) % self.height
            dx = (frame_id * 57 + 3) % self.width
            noise = np.roll(self._noise, (dy, dx), axis=(0, 1))
            frame = np.clip(self._background.astype(np.int16) + noise,
                            0, 255).astype(np.uint8)
        else:
            frame = self._background.copy()
        if self.moving_object:
            x, y = self.object_position(frame_id)
            s = self.object_size
            frame[y:y + s, x:x + s, :] = (200, 180, 160)  # bright BGR blob
        return frame

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        return self

    def __next__(self) -> Dict[str, Any]:
        frame = self.frame_at(self._frame_id)
        d = make_frame_dict(frame, self._frame_id)
        self._frame_id += 1
        return d


def _box_blur(a: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Vectorized 1-D box blur via cumsum (edge-padded)."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (k // 2, k - k // 2)
    c = np.cumsum(np.pad(a, pad, mode="edge"), axis=axis)
    return (np.take(c, np.arange(k, k + a.shape[axis]), axis=axis)
            - np.take(c, np.arange(a.shape[axis]), axis=axis)) / k


def _paste_blended(frame: np.ndarray, tex: np.ndarray, mask: np.ndarray,
                   alpha: float, x: int, y: int) -> None:
    """Alpha-blend a masked texture patch onto frame at (x, y), clipping to
    frame bounds. alpha < 1 blends toward the underlying background —
    camouflage, the thing that makes detection non-trivial."""
    h, w = mask.shape
    fh, fw = frame.shape[:2]
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + w, fw), min(y + h, fh)
    if x1 <= x0 or y1 <= y0:
        return
    tx, ty = x0 - x, y0 - y
    m = mask[ty:ty + (y1 - y0), tx:tx + (x1 - x0), None]
    sub = frame[y0:y1, x0:x1].astype(np.float32)
    t = tex[ty:ty + (y1 - y0), tx:tx + (x1 - x0)].astype(np.float32)
    out = np.where(m, alpha * t + (1.0 - alpha) * sub, sub)
    frame[y0:y1, x0:x1] = np.clip(out, 0, 255).astype(np.uint8)


# -- species substrate ---------------------------------------------------------
# A small closed taxonomy of procedurally distinguishable "species", the
# zero-egress analog of the reference's iNaturalist-10k classes
# (reference species_classifier.py:18-80 serves EVA02-L at 92% top-1,
# ARCHITECTURE.md:281). Every species is identified by pattern family
# (genus trait) + pattern parameters / coloration (species trait), so a
# Stage-2 classifier has to learn texture, not a lookup of one bright
# pixel. Grouped 2 families x 2 genera x 4 species so the hierarchical
# fallback (species -> genus -> family) is exercised by real structure.
#   pattern p1/p2 meaning: stripes (period px, angle deg) | spots
#   (radius px, grid period px) | patches (cell px, contrast) | plain
#   (belly-gradient strength, warm-cool tilt)
SPECIES_TABLE = [
    # genus Vittafelis (striped cats), family Felidra
    {"common_name": "dune stripecat", "name": "Vittafelis eremi",
     "genus": "Vittafelis", "family": "Felidra",
     "color": (96, 118, 146), "pattern": "stripes", "p1": 9.0, "p2": 0.0},
    {"common_name": "broad-band stripecat", "name": "Vittafelis latus",
     "genus": "Vittafelis", "family": "Felidra",
     "color": (104, 126, 138), "pattern": "stripes", "p1": 20.0, "p2": 0.0},
    {"common_name": "cross stripecat", "name": "Vittafelis transversus",
     "genus": "Vittafelis", "family": "Felidra",
     "color": (96, 118, 146), "pattern": "stripes", "p1": 9.0, "p2": 90.0},
    {"common_name": "slant stripecat", "name": "Vittafelis obliquus",
     "genus": "Vittafelis", "family": "Felidra",
     "color": (110, 120, 130), "pattern": "stripes", "p1": 14.0, "p2": 45.0},
    # genus Maculafelis (spotted cats), family Felidra
    {"common_name": "fine-spot rockcat", "name": "Maculafelis minutus",
     "genus": "Maculafelis", "family": "Felidra",
     "color": (100, 125, 150), "pattern": "spots", "p1": 2.2, "p2": 9.0},
    {"common_name": "pebble rockcat", "name": "Maculafelis saxum",
     "genus": "Maculafelis", "family": "Felidra",
     "color": (100, 125, 150), "pattern": "spots", "p1": 4.0, "p2": 14.0},
    {"common_name": "sparse-spot rockcat", "name": "Maculafelis rarus",
     "genus": "Maculafelis", "family": "Felidra",
     "color": (112, 118, 136), "pattern": "spots", "p1": 3.2, "p2": 21.0},
    {"common_name": "boulder rockcat", "name": "Maculafelis magnus",
     "genus": "Maculafelis", "family": "Felidra",
     "color": (92, 112, 150), "pattern": "spots", "p1": 6.5, "p2": 26.0},
    # genus Tessellacanis (patched dogs), family Canidra
    {"common_name": "mosaic mesadog", "name": "Tessellacanis parvus",
     "genus": "Tessellacanis", "family": "Canidra",
     "color": (90, 115, 135), "pattern": "patches", "p1": 5.0, "p2": 0.55},
    {"common_name": "brindle mesadog", "name": "Tessellacanis medius",
     "genus": "Tessellacanis", "family": "Canidra",
     "color": (98, 120, 128), "pattern": "patches", "p1": 9.0, "p2": 0.45},
    {"common_name": "blotched mesadog", "name": "Tessellacanis maculosus",
     "genus": "Tessellacanis", "family": "Canidra",
     "color": (88, 108, 140), "pattern": "patches", "p1": 15.0, "p2": 0.6},
    {"common_name": "shield mesadog", "name": "Tessellacanis scutum",
     "genus": "Tessellacanis", "family": "Canidra",
     "color": (104, 118, 126), "pattern": "patches", "p1": 24.0, "p2": 0.5},
    # genus Planicanis (plain dogs), family Canidra — colorimetric species:
    # distinguished by channel RATIOS (stable under illumination gain),
    # not absolute brightness
    {"common_name": "sand plaindog", "name": "Planicanis arenae",
     "genus": "Planicanis", "family": "Canidra",
     "color": (70, 118, 160), "pattern": "plain", "p1": 50.0, "p2": 0.0},
    {"common_name": "slate plaindog", "name": "Planicanis ardesia",
     "genus": "Planicanis", "family": "Canidra",
     "color": (140, 110, 86), "pattern": "plain", "p1": 10.0, "p2": 0.0},
    {"common_name": "moss plaindog", "name": "Planicanis muscus",
     "genus": "Planicanis", "family": "Canidra",
     "color": (80, 135, 95), "pattern": "plain", "p1": 35.0, "p2": 0.0},
    {"common_name": "dusk plaindog", "name": "Planicanis crepusculi",
     "genus": "Planicanis", "family": "Canidra",
     "color": (125, 95, 125), "pattern": "plain", "p1": 20.0, "p2": 0.0},
]

NUM_SPECIES = len(SPECIES_TABLE)


def species_taxonomy() -> Dict[str, Dict[str, str]]:
    """class_id -> taxonomy entry in the exact JSON-dict format
    pipeline.species.load_taxonomy consumes (and the reference's taxonomy
    loader validates, species_classifier.py:90-166)."""
    out: Dict[str, Dict[str, str]] = {}
    for i, sp in enumerate(SPECIES_TABLE):
        out[str(i)] = {
            "common_name": sp["common_name"],
            "name": sp["name"],
            "genus": sp["genus"],
            "family": sp["family"],
            "order": "Synthetica",
            "class": "Mammalia",
        }
    return out


def species_texture(species_id: int, h: int, w: int,
                    rng: np.random.Generator
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Render one species body: (tex uint8 (h, w, 3) BGR, mask bool (h, w)).

    Deterministic given (species_id, rng state). The pattern phase/jitter
    comes from rng so no two individuals are pixel-identical, but the
    pattern STATISTICS (period, orientation, dot size, palette ratios)
    are the species signature a classifier must key on."""
    sp = SPECIES_TABLE[int(species_id) % NUM_SPECIES]
    base = np.asarray(sp["color"], np.float32)
    dark = base * 0.42
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    pattern, p1, p2 = sp["pattern"], float(sp["p1"]), float(sp["p2"])
    if pattern == "stripes":
        th = np.deg2rad(p2 + rng.uniform(-8, 8))
        phase = rng.uniform(0, 2 * np.pi)
        s = np.sin(2 * np.pi * (xx * np.cos(th) + yy * np.sin(th)) / p1
                   + phase)
        m2 = s > 0
        tex = np.where(m2[..., None], base, dark)
    elif pattern == "spots":
        period = p2
        ox, oy = rng.uniform(0, period, 2)
        gx = (xx + ox) % period - period / 2
        gy = (yy + oy) % period - period / 2
        m2 = gx ** 2 + gy ** 2 <= p1 ** 2
        tex = np.where(m2[..., None], dark, base)
    elif pattern == "patches":
        cell = max(int(p1), 2)
        g = rng.normal(0, 1, ((h + cell - 1) // cell,
                              (w + cell - 1) // cell, 1))
        g = np.kron(g, np.ones((cell, cell, 1)))[:h, :w]
        lo = base * (1.0 - p2)
        tex = np.where(g > 0, base, lo)
    else:   # plain: belly gradient, species signature = channel ratios
        grad = (yy / max(h - 1, 1))[..., None] * p1
        tex = base + grad
    tex = tex + rng.normal(0, 7, (h, w, 3))   # pelt/feather noise
    ry, rx = h / 2.0, w / 2.0
    mask = (((yy - ry) / ry) ** 2 + ((xx - rx) / rx) ** 2) <= 1.0
    return np.clip(tex, 0, 255).astype(np.uint8), mask


class WildSceneSource:
    """Harder deterministic scene generator for honest quality metrics.

    SyntheticFrameSource draws ONE uniform bright square — a detector that
    thresholds brightness solves it (its held-out mAP50 saturates at 1.0,
    which proves the serving path works but says little about detection).
    This source makes the task earn its metric while staying hermetic and
    pure in (seed, frame_id):

      * 0..max_targets textured elliptical "animals" per scene (speckled
        two-tone bodies), sizes spanning ~6x, moving on independent
        Lissajous trajectories that carry them partially off-frame;
      * per-target camouflage: body alpha-blends toward the local
        background (alpha 0.35..1.0), so low-contrast targets exist;
      * unlabeled moving distractors ("foliage"): ragged textured clumps
        swaying a few pixels around fixed anchors — motion and texture
        that must NOT be detected;
      * slow global illumination drift (scene-wide gain), so brightness
        alone cannot separate targets;
      * the same rolled sensor-noise plane as SyntheticFrameSource.

    Ground truth comes from the generator: boxes_at(frame_id) returns the
    clipped boxes of targets with >=30% of their body area visible.
    """

    def __init__(
        self,
        width: int = 2560,
        height: int = 1440,
        seed: int = 0,
        max_targets: int = 4,
        n_distractors: int = 3,
        size_range: Tuple[int, int] = (56, 340),
        alpha_range: Tuple[float, float] = (0.35, 1.0),
        noise_sigma: float = 2.0,
        illumination_drift: float = 0.10,
        min_visible_fraction: float = 0.30,
        night: bool = False,
        motion_blur: bool = False,
        n_occluders: int = 0,
        species_mode: bool = False,
    ):
        """Extra difficulty axes (VERDICT r4 #9 — each a real failure mode
        of the deployment the easy metric can't see):

        * ``night``: scene-wide gain 0.30 with amplified sensor noise —
          low-light frames where absolute brightness carries almost no
          signal.
        * ``motion_blur``: targets smear along their own trajectory
          direction proportional to instantaneous speed (capture-time
          blur of a moving animal, not a global filter).
        * ``n_occluders``: foliage clumps drawn OVER the targets —
          partial occlusion with textured, plausible occluders. Ground
          truth keeps the full target box (the deployment wants the
          animal found behind the bush); near-total occlusion is rare at
          the sizes used but bounds achievable mAP below 1 by design.
        * ``species_mode``: target bodies render from the closed species
          taxonomy (SPECIES_TABLE) instead of generic speckle, and
          ``labels_at`` exposes per-target species ids — the substrate
          for END-TO-END two-stage evaluation (detector crop ->
          classifier -> species_top1)."""
        self.width = width
        self.height = height
        self.min_visible_fraction = min_visible_fraction
        self.illumination_drift = illumination_drift
        self.night = night
        self.motion_blur = motion_blur
        self.species_mode = species_mode
        if night:
            noise_sigma = max(noise_sigma, 6.0)
        rng = np.random.default_rng(seed)
        self._background = _smooth_background(rng, width, height)
        if noise_sigma > 0:
            self._noise = rng.normal(0.0, noise_sigma,
                                     size=(height, width, 3)).astype(np.int16)
        else:
            self._noise = None
        # illumination phase: slow scene-wide gain cycle (~every 90 frames)
        self._illum_phase = float(rng.uniform(0, 2 * np.pi))

        # -- targets ----------------------------------------------------------
        animal_palette = np.array([  # BGR earth tones
            [96, 112, 140], [70, 90, 120], [110, 130, 150],
            [60, 70, 90], [130, 150, 170], [85, 105, 95],
        ], np.float32)
        self.targets = []
        n_targets = int(rng.integers(0, max_targets + 1))
        for _ in range(n_targets):
            s = int(rng.integers(size_range[0], size_range[1] + 1))
            h = max(int(s * rng.uniform(0.55, 0.95)), 8)
            if species_mode:
                sid = int(rng.integers(NUM_SPECIES))
                tex_u8, mask = species_texture(sid, h, s, rng)
            else:
                sid = -1
                color = animal_palette[rng.integers(len(animal_palette))]
                # speckled two-tone body: base color + coarse dark patches
                # + fine speckle (real pelts are textured, not flat)
                patch = rng.normal(0, 1, ((h + 7) // 8, (s + 7) // 8, 1))
                patch = np.kron(patch, np.ones((8, 8, 1)))[:h, :s]
                tex = (color[None, None, :]
                       + 24.0 * patch
                       + rng.normal(0, 14, (h, s, 3)))
                yy, xx = np.mgrid[0:h, 0:s]
                ry, rx = h / 2.0, s / 2.0
                mask = (((yy - ry) / ry) ** 2
                        + ((xx - rx) / rx) ** 2) <= 1.0
                tex_u8 = np.clip(tex, 0, 255).astype(np.uint8)
            lo_x, hi_x = -s // 3, self.width - s + s // 3
            lo_y, hi_y = -h // 3, self.height - h + h // 3
            self.targets.append({
                "w": s, "h": h,
                "tex": tex_u8,
                "mask": mask,
                "species": sid,
                "alpha": float(rng.uniform(*alpha_range)),
                "wx": float(rng.uniform(0.035, 0.22)),
                "wy": float(rng.uniform(0.035, 0.22)),
                "px": float(rng.uniform(0, 2 * np.pi)),
                "py": float(rng.uniform(0, 2 * np.pi)),
                "span_x": (lo_x, hi_x), "span_y": (lo_y, hi_y),
            })

        # -- distractors (unlabeled swaying foliage) ---------------------------
        foliage_palette = np.array(
            [[60, 110, 70], [50, 95, 85], [75, 120, 95]], np.float32)

        def make_clump(lo: int, hi: int) -> dict:
            s = int(rng.integers(lo, hi))
            h = int(s * rng.uniform(0.6, 1.1))
            color = foliage_palette[rng.integers(len(foliage_palette))]
            tex = color[None, None, :] + rng.normal(0, 22, (h, s, 3))
            # ragged clump mask: blurred noise thresholded inside an ellipse
            blob = rng.normal(0, 1, (h, s))
            k = max(min(h, s) // 10, 3)
            blob = _box_blur(_box_blur(blob, k, axis=1), k, axis=0)
            yy, xx = np.mgrid[0:h, 0:s]
            ell = (((yy - h / 2) / (h / 2)) ** 2
                   + ((xx - s / 2) / (s / 2)) ** 2) <= 1.0
            mask = ell & (blob > np.median(blob[ell]) - 0.3)
            return {
                "tex": np.clip(tex, 0, 255).astype(np.uint8),
                "mask": mask,
                "alpha": float(rng.uniform(0.75, 1.0)),
                "x": int(rng.integers(0, max(self.width - s, 1))),
                "y": int(rng.integers(0, max(self.height - h, 1))),
                "amp": float(rng.uniform(3, 14) * self.width / 640.0),
                "wd": float(rng.uniform(0.15, 0.5)),
                "pd": float(rng.uniform(0, 2 * np.pi)),
            }

        self.distractors = [make_clump(90, 320) for _ in range(n_distractors)]
        # occluders: same foliage clumps, drawn AFTER (over) the targets,
        # anchored near a target's span so they actually intersect paths
        self.occluders = []
        for _ in range(n_occluders):
            occ = make_clump(120, 380)
            if self.targets:
                t = self.targets[int(rng.integers(len(self.targets)))]
                cx = (t["span_x"][0] + t["span_x"][1]) // 2
                cy = (t["span_y"][0] + t["span_y"][1]) // 2
                occ["x"] = int(np.clip(cx + rng.integers(-t["w"], t["w"] + 1),
                                       0, max(self.width - 1, 1)))
                occ["y"] = int(np.clip(cy + rng.integers(-t["h"], t["h"] + 1),
                                       0, max(self.height - 1, 1)))
            self.occluders.append(occ)

    def _target_pos(self, t: dict, frame_id: int) -> Tuple[int, int]:
        lo_x, hi_x = t["span_x"]
        lo_y, hi_y = t["span_y"]
        x = lo_x + (hi_x - lo_x) * (0.5 + 0.5 * np.sin(
            t["wx"] * frame_id + t["px"]))
        y = lo_y + (hi_y - lo_y) * (0.5 + 0.5 * np.sin(
            t["wy"] * frame_id + t["py"]))
        return int(round(x)), int(round(y))

    def boxes_at(self, frame_id: int) -> List[Tuple[float, float, float, float]]:
        """Clipped (x1, y1, x2, y2) boxes of targets with >=
        min_visible_fraction of their body area on-frame."""
        return [box for box, _sid in self.labels_at(frame_id)]

    def labels_at(self, frame_id: int
                  ) -> List[Tuple[Tuple[float, float, float, float], int]]:
        """[(clipped box, species_id)] for on-frame targets; species_id is
        -1 unless species_mode (the end-to-end two-stage ground truth)."""
        labels = []
        for t in self.targets:
            x, y = self._target_pos(t, frame_id)
            x1, y1 = max(x, 0), max(y, 0)
            x2 = min(x + t["w"], self.width)
            y2 = min(y + t["h"], self.height)
            if x2 <= x1 or y2 <= y1:
                continue
            visible = (x2 - x1) * (y2 - y1) / float(t["w"] * t["h"])
            if visible >= self.min_visible_fraction:
                labels.append(((float(x1), float(y1), float(x2), float(y2)),
                               int(t["species"])))
        return labels

    def _blurred_body(self, t: dict, frame_id: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Motion-blur a target's texture+mask along its instantaneous
        trajectory direction, kernel length ~ speed (px/frame)."""
        x0, y0 = self._target_pos(t, frame_id - 1)
        x1, y1 = self._target_pos(t, frame_id)
        vx, vy = x1 - x0, y1 - y0
        speed = float(np.hypot(vx, vy))
        k = int(min(max(speed, 1.0), 15.0))
        if k <= 1:
            return t["tex"], t["mask"]
        axis = 1 if abs(vx) >= abs(vy) else 0
        tex = np.stack([_box_blur(t["tex"][..., c].astype(np.float32),
                                  k, axis=axis) for c in range(3)], -1)
        mask = _box_blur(t["mask"].astype(np.float32), k, axis=axis) > 0.3
        return np.clip(tex, 0, 255).astype(np.uint8), mask

    def frame_at(self, frame_id: int) -> np.ndarray:
        if self._noise is not None:
            dy = (frame_id * 31 + 7) % self.height
            dx = (frame_id * 57 + 3) % self.width
            noise = np.roll(self._noise, (dy, dx), axis=(0, 1))
            frame = np.clip(self._background.astype(np.int16) + noise,
                            0, 255).astype(np.uint8)
        else:
            frame = self._background.copy()
        for d in self.distractors:
            off = int(round(d["amp"] * np.sin(d["wd"] * frame_id + d["pd"])))
            _paste_blended(frame, d["tex"], d["mask"], d["alpha"],
                           d["x"] + off, d["y"])
        for t in self.targets:
            x, y = self._target_pos(t, frame_id)
            if self.motion_blur:
                tex, mask = self._blurred_body(t, frame_id)
            else:
                tex, mask = t["tex"], t["mask"]
            _paste_blended(frame, tex, mask, t["alpha"], x, y)
        for occ in self.occluders:   # foliage OVER the animals
            off = int(round(occ["amp"] * np.sin(
                occ["wd"] * frame_id + occ["pd"])))
            _paste_blended(frame, occ["tex"], occ["mask"], occ["alpha"],
                           occ["x"] + off, occ["y"])
        gain = 1.0
        if self.illumination_drift > 0:
            gain += self.illumination_drift * np.sin(
                0.07 * frame_id + self._illum_phase)
        if self.night:
            gain *= 0.30   # low light: signal compressed into noise floor
        if gain != 1.0:
            frame = np.clip(frame.astype(np.float32) * gain,
                            0, 255).astype(np.uint8)
        return frame


class RecordedTrace:
    """Save / replay a sequence of frames + expected detections to disk
    (.npz for frames, .json for detections) so benches and parity tests run
    against fixed inputs."""

    def __init__(self, frames: List[np.ndarray], detections: Optional[List[Any]] = None):
        self.frames = frames
        self.detections = detections or []

    def save(self, path: str) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(str(p.with_suffix(".npz")),
                            **{f"frame_{i}": f for i, f in enumerate(self.frames)})
        with open(p.with_suffix(".json"), "w") as f:
            json.dump(self.detections, f)

    @classmethod
    def load(cls, path: str) -> "RecordedTrace":
        p = Path(path)
        data = np.load(str(p.with_suffix(".npz")))
        frames = [data[f"frame_{i}"] for i in range(len(data.files))]
        dets: List[Any] = []
        jpath = p.with_suffix(".json")
        if jpath.exists():
            with open(jpath) as f:
                dets = json.load(f)
        return cls(frames, dets)

    @classmethod
    def synthesize(cls, n_frames: int = 30, **source_kwargs) -> "RecordedTrace":
        src = SyntheticFrameSource(**source_kwargs)
        return cls([src.frame_at(i) for i in range(n_frames)])
