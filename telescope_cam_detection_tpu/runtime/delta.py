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
    """Tile-delta encoder for ONE stream lane at a fixed frame size.

    payload:
      * "rgb": tiles ship as raw (tile, tile, 3) BGR blocks; device
        reconstruction is exact.
      * "yuv420": each frame converts to tiled planar YUV420 records of
        tile*tile*3/2 bytes ([Y | U | V] per tile) and deltas are computed
        in THAT space — half the transfer bytes and half the scan work, with
        the same chroma-subsample accuracy tradeoff as the full-frame
        "yuv420" transfer mode (both sides hold identical YUV bytes, so the
        mirror contract is exact).
    """

    def __init__(self, frame_hw: Tuple[int, int], tile: int = 16,
                 threshold: int = 14, refresh_tiles: int = 16,
                 payload: str = "rgb"):
        h, w = frame_hw
        if h % tile or w % tile:
            raise ValueError(f"frame {frame_hw} not divisible by tile {tile}")
        if payload not in ("rgb", "yuv420"):
            raise ValueError(f"unknown delta payload {payload!r}")
        if payload == "yuv420" and tile % 2:
            raise ValueError("yuv420 payload needs an even tile size")
        self.frame_hw = frame_hw
        self.tile = tile
        self.payload = payload
        self.threshold = int(threshold)
        self.refresh_tiles = int(refresh_tiles)
        self.grid_h = h // tile
        self.grid_w = w // tile
        self.num_tiles = self.grid_h * self.grid_w
        self.row_bytes = (tile * tile * 3 // 2 if payload == "yuv420"
                          else tile * tile * 3)
        # zeros mirrors the device buffer's initial state, so the first
        # encode naturally emits a full refresh
        if payload == "yuv420":
            self.ref = np.zeros((self.num_tiles, self.row_bytes), np.uint8)
        else:
            self.ref = np.zeros((h, w, 3), np.uint8)
        self._refresh_cursor = 0
        self.stats = {"frames": 0, "tiles_sent": 0}

    def _advance_refresh(self) -> int:
        cur = self._refresh_cursor
        if self.refresh_tiles > 0 and self.num_tiles > 0:
            self._refresh_cursor = (cur + self.refresh_tiles) % self.num_tiles
        return cur

    def _encode_yuv(self, frame: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        from telescope_cam_detection_tpu.utils import native
        records = native.bgr_to_yuv_tiles(np.ascontiguousarray(frame),
                                          self.tile)
        if records is None:
            records = bgr_to_yuv_tiles_numpy(frame, self.tile)
        cur = self._refresh_cursor if self.refresh_tiles > 0 else 0
        out = native.delta_encode_rows(records, self.ref, self.threshold,
                                       cur, self.refresh_tiles)
        if out is None:
            diff = np.abs(records.astype(np.int16) - self.ref.astype(np.int16))
            changed = diff.max(axis=1) > self.threshold
            if self.refresh_tiles > 0 and self.num_tiles > 0:
                roll = (np.arange(cur, cur + self.refresh_tiles)
                        % self.num_tiles)
                changed[roll] = True
            idx = np.flatnonzero(changed).astype(np.int32)
            rows = records[idx].copy()
            self.ref[idx] = rows
            out = idx, rows
        self._advance_refresh()
        idx, rows = out
        self.stats["frames"] += 1
        self.stats["tiles_sent"] += len(idx)
        return idx, rows

    def encode(self, frame: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """frame (H, W, 3) uint8 -> (tile_idx (K,) int32, payloads).

        payloads: (K, tile, tile, 3) u8 for "rgb", (K, tile*tile*3//2) u8
        for "yuv420". Updates the host mirror; K varies per frame (0
        allowed). Uses the GIL-free C++ encoder (native/frameio.cpp) when
        available; numpy fallbacks are bit-identical.
        """
        if self.payload == "yuv420":
            if frame.shape != (*self.frame_hw, 3):
                raise ValueError(f"frame {frame.shape} != {self.frame_hw}")
            return self._encode_yuv(frame)
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


def bgr_to_yuv_planes_numpy(frame: np.ndarray):
    """Canonical full-range BT.601 forward transform, Q16 fixed point —
    integer-exact, bit-identical to native/frameio.cpp bgr_pixel_to_yuv.
    Returns (Y (H,W), U (H/2,W/2), V (H/2,W/2)) uint8 (U/V top-left
    subsampled)."""
    f = frame.astype(np.int64)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    y_fp = 19595 * r + 38470 * g + 7471 * b            # Q16
    yq = ((y_fp + 32768) >> 16).astype(np.uint8)
    bs, rs, ys = b[0::2, 0::2], r[0::2, 0::2], y_fp[0::2, 0::2]
    u = ((36963 * ((bs << 16) - ys) + (1 << 31)) >> 32) + 128
    v = ((46727 * ((rs << 16) - ys) + (1 << 31)) >> 32) + 128
    uq = np.clip(u, 0, 255).astype(np.uint8)
    vq = np.clip(v, 0, 255).astype(np.uint8)
    return yq, uq, vq


def bgr_to_yuv_tiles_numpy(frame: np.ndarray, tile: int) -> np.ndarray:
    """(H, W, 3) BGR u8 -> (num_tiles, tile*tile*3//2) tiled planar YUV420.

    Numpy fallback bit-identical to native frameio_bgr_to_yuv_tiles (the
    canonical fixed-point transform above)."""
    h, w, _ = frame.shape
    yq, uq, vq = bgr_to_yuv_planes_numpy(frame)
    gh, gw, t2 = h // tile, w // tile, tile // 2

    def tile_plane(p, ts):
        return (p.reshape(gh, ts, gw, ts).transpose(0, 2, 1, 3)
                .reshape(gh * gw, ts * ts))

    return np.concatenate([tile_plane(yq, tile), tile_plane(uq, t2),
                           tile_plane(vq, t2)], axis=1)


def pack_batch(
    encoded: Sequence[Tuple[np.ndarray, np.ndarray]],
    lanes: Sequence[int],
    num_tiles: int,
    tile: int,
    k_buckets: Sequence[int] = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512),
    payload: str = "rgb",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Pad a batch of per-frame (idx, payloads) to one static K bucket.

    Returns (lanes (B,), tile_idx (B, K), tiles, K) with tiles
    (B, K, t, t, 3) u8 for "rgb" or (B, K, t*t*3//2) u8 for "yuv420".
    Pad index is ``num_tiles`` (out of bounds -> dropped by device scatter).
    """
    b = len(encoded)
    max_k = max((len(i) for i, _ in encoded), default=0)
    k = next((kb for kb in sorted(k_buckets) if kb >= max_k), num_tiles)
    k = min(max(k, 1), num_tiles)
    if max_k > k:  # shouldn't happen (num_tiles is the top bucket)
        raise ValueError(f"batch needs K={max_k} > num_tiles={num_tiles}")
    tile_idx = np.full((b, k), num_tiles, np.int32)
    shape = ((b, k, tile * tile * 3 // 2) if payload == "yuv420"
             else (b, k, tile, tile, 3))
    tiles = np.zeros(shape, np.uint8)
    for i, (idx, rows) in enumerate(encoded):
        if len(idx) == 0:
            continue   # nothing-to-send entries (mesh layout pads) keep
            # the all-drop tile_idx row; rows may be shapeless-empty
        tile_idx[i, :len(idx)] = idx
        tiles[i, :len(idx)] = rows
    return (np.asarray(lanes, np.int32), tile_idx, tiles, k)
