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
        # Smooth low-frequency background (like a real outdoor scene), not
        # per-pixel noise: real camera frames are spatially correlated, which
        # matters for anything measuring transfer/encode behavior.
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
        self._background = np.clip(base, 0, 255).astype(np.uint8)
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
