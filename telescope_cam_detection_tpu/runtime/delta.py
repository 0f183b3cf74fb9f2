"""Host-side tile-delta encoder (pairs with ops/delta.apply_tile_deltas).

Per stream lane, keeps a host mirror of the device's reference frame and emits
the tile indices+payloads whose content moved beyond a threshold. Determinism
contract: every encoded batch must be dispatched to the device exactly once,
in encode order, so the host mirror and the device reference stay bit-equal
(DetectorProgram serializes delta dispatches under a lock).

Error bound: an unsent tile differs from the live frame by at most
``threshold`` grey levels per pixel (the mirror is compared against the live
frame every encode, so error never accumulates), and a rolling refresh
re-sends ``refresh_tiles`` tiles per frame round-robin so every tile is
re-transmitted at least every T/refresh_tiles frames.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class DeltaEncoder:
    """Tile-delta encoder for ONE stream lane at a fixed frame size."""

    def __init__(self, frame_hw: Tuple[int, int], tile: int = 16,
                 threshold: int = 14, refresh_tiles: int = 16):
        h, w = frame_hw
        if h % tile or w % tile:
            raise ValueError(f"frame {frame_hw} not divisible by tile {tile}")
        self.frame_hw = frame_hw
        self.tile = tile
        self.threshold = int(threshold)
        self.refresh_tiles = int(refresh_tiles)
        self.grid_h = h // tile
        self.grid_w = w // tile
        self.num_tiles = self.grid_h * self.grid_w
        # zeros mirrors the device buffer's initial state, so the first
        # encode naturally emits a full refresh
        self.ref = np.zeros((h, w, 3), np.uint8)
        self._refresh_cursor = 0
        self.stats = {"frames": 0, "tiles_sent": 0}

    def encode(self, frame: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """frame (H, W, 3) uint8 -> (tile_idx (K,) int32, tiles (K,th,th,3)).

        Updates the host mirror; K varies per frame (0 allowed). Uses the
        GIL-free C++ encoder (native/frameio.cpp frameio_delta_encode) when
        available; numpy fallback is bit-identical.
        """
        if frame.shape != self.ref.shape:
            raise ValueError(f"frame {frame.shape} != {self.ref.shape}")
        t = self.tile
        from telescope_cam_detection_tpu.utils import native
        frame_c = np.ascontiguousarray(frame)
        out = native.delta_encode(frame_c, self.ref, t, self.threshold,
                                  self._refresh_cursor
                                  if self.refresh_tiles > 0 else 0,
                                  self.refresh_tiles)
        if out is not None:
            idx, tiles = out
            if self.refresh_tiles > 0 and self.num_tiles > 0:
                self._refresh_cursor = (self._refresh_cursor +
                                        self.refresh_tiles) % self.num_tiles
            self.stats["frames"] += 1
            self.stats["tiles_sent"] += len(idx)
            return idx, tiles
        diff = np.abs(frame.astype(np.int16) - self.ref.astype(np.int16))
        per_tile = diff.reshape(self.grid_h, t, self.grid_w, t, 3).max((1, 3, 4))
        changed = per_tile > self.threshold
        if self.refresh_tiles > 0 and self.num_tiles > 0:
            cur = self._refresh_cursor
            roll = (np.arange(cur, cur + self.refresh_tiles) % self.num_tiles)
            changed.ravel()[roll] = True
            self._refresh_cursor = (cur + self.refresh_tiles) % self.num_tiles
        idx = np.flatnonzero(changed).astype(np.int32)
        tiles = np.empty((len(idx), t, t, 3), np.uint8)
        for k, flat in enumerate(idx):
            ty, tx = divmod(int(flat), self.grid_w)
            block = frame[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t]
            tiles[k] = block
            self.ref[ty * t:(ty + 1) * t, tx * t:(tx + 1) * t] = block
        self.stats["frames"] += 1
        self.stats["tiles_sent"] += len(idx)
        return idx, tiles

    def reset(self) -> None:
        """Forget the mirror (next encode is a full refresh)."""
        self.ref[:] = 0


def pack_batch(
    encoded: Sequence[Tuple[np.ndarray, np.ndarray]],
    lanes: Sequence[int],
    num_tiles: int,
    tile: int,
    k_buckets: Sequence[int] = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Pad a batch of per-frame (idx, tiles) to one static K bucket.

    Returns (lanes (B,), tile_idx (B, K), tiles (B, K, t, t, 3), K).
    Pad index is ``num_tiles`` (out of bounds -> dropped by device scatter).
    """
    b = len(encoded)
    max_k = max((len(i) for i, _ in encoded), default=0)
    k = next((kb for kb in sorted(k_buckets) if kb >= max_k), num_tiles)
    k = min(max(k, 1), num_tiles)
    if max_k > k:  # shouldn't happen (num_tiles is the top bucket)
        raise ValueError(f"batch needs K={max_k} > num_tiles={num_tiles}")
    tile_idx = np.full((b, k), num_tiles, np.int32)
    tiles = np.zeros((b, k, tile, tile, 3), np.uint8)
    for i, (idx, payload) in enumerate(encoded):
        tile_idx[i, :len(idx)] = idx
        tiles[i, :len(idx)] = payload
    return (np.asarray(lanes, np.int32), tile_idx, tiles, k)
