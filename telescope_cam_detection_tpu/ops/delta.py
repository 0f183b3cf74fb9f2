"""Device-side tile-delta frame reconstruction.

Transfer compression for weak host<->device links: instead of shipping every
full frame, the host keeps a per-stream reference frame that mirrors a
device-resident copy and ships only the 16x16 tiles whose content changed
(runtime/delta.py). The device scatters the tiles into its reference buffer
and reconstructs the full frame — temporal redundancy in surveillance video
(static background, small moving subjects; the same redundancy H.264 exploits
upstream of the reference's decoder, stream_capture.py:195) turns ~1.2 MB/frame
into a few KB/frame.

The reference has no analog (PCIe to a local GPU is ~free); this is the
TPU-relay replacement for the reference's implicit "frames are already on the
GPU" assumption (stream_capture_gpu_ffmpeg.py keep_frames_on_gpu).

Layout: the reference buffer lives in *tiled* layout ``(L, T, th, tw, 3)``
(L = stream lanes, T = TH*TW tiles per frame) so a delta application is one
vectorized scatter; frames are untiled on device right before preprocess.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def tiled_shape(frame_hw: Tuple[int, int], tile: int,
                lanes: int, payload: str = "rgb") -> Tuple[int, ...]:
    h, w = frame_hw
    if h % tile or w % tile:
        raise ValueError(f"frame {frame_hw} not divisible by tile {tile}")
    t = (h // tile) * (w // tile)
    if payload == "yuv420":
        return (lanes, t, tile * tile * 3 // 2)
    return (lanes, t, tile, tile, 3)


def untile(frames_tiled: jnp.ndarray, frame_hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, T, th, tw, 3) tiled -> (B, H, W, 3)."""
    b, t, th, tw, c = frames_tiled.shape
    h, w = frame_hw
    grid_h, grid_w = h // th, w // tw
    x = frames_tiled.reshape(b, grid_h, grid_w, th, tw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def untile_yuv(frames_tiled: jnp.ndarray, frame_hw: Tuple[int, int],
               tile: int) -> jnp.ndarray:
    """(B, T, tile*tile*3//2) tiled planar YUV420 records -> (B, H, W, 3)
    uint8 BGR. Inverse of the host packer (native frameio_bgr_to_yuv_tiles /
    runtime.delta.bgr_to_yuv_tiles_numpy); chroma upsample + BT.601 inverse
    use the exact coefficients of ops.preprocess.yuv420_to_bgr."""
    b, t, s = frames_tiled.shape
    h, w = frame_hw
    gh, gw, t2 = h // tile, w // tile, tile // 2
    y_n = tile * tile

    def plane(records, ts, ph, pw):
        x = records.reshape(b, gh, gw, ts, ts)
        return x.transpose(0, 1, 3, 2, 4).reshape(b, ph, pw)

    y = plane(frames_tiled[..., :y_n], tile, h, w).astype(jnp.float32)
    u = plane(frames_tiled[..., y_n:y_n + t2 * t2], t2, h // 2, w // 2)
    v = plane(frames_tiled[..., y_n + t2 * t2:], t2, h // 2, w // 2)

    def up2(c):
        c = jnp.broadcast_to(c[:, :, None, :, None],
                             (b, h // 2, 2, w // 2, 2))
        return c.reshape(b, h, w).astype(jnp.float32)

    u = up2(u) - 128.0
    v = up2(v) - 128.0
    r = y + 1.403 * v
    g = y - 0.714 * v - 0.344 * u
    bch = y + 1.773 * u
    rgb = jnp.clip(jnp.stack([bch, g, r], axis=-1), 0.0, 255.0)
    return rgb.astype(jnp.uint8)


def apply_tile_deltas(
    ref_tiled: jnp.ndarray,
    lanes: jnp.ndarray,
    tile_idx: jnp.ndarray,
    tiles: jnp.ndarray,
    frame_hw: Tuple[int, int],
    payload: str = "rgb",
    tile: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter per-frame tile deltas into the reference, emit full frames.

    Args:
      ref_tiled: (L, T, th, tw, 3) uint8 device reference for "rgb" payloads,
        (L, T, th*tw*3//2) for "yuv420" (donated by caller).
      lanes: (B,) int32 — which lane each batch entry belongs to. Entries are
        applied IN ORDER, so a batch may contain several sequential frames of
        the same lane (each delta is relative to the previous entry's state).
      tile_idx: (B, K) int32 — tile slots to overwrite; pad with T (one past
        the end, dropped by the scatter).
      tiles: (B, K, th, tw, 3) / (B, K, th*tw*3//2) uint8 tile payloads.
      frame_hw: full frame (H, W).
      payload/tile: payload layout ("rgb" | "yuv420") and tile size (yuv).

    Returns (new_ref_tiled, frames) with frames (B, H, W, 3) uint8 BGR.
    """
    def step(ref, x):
        lane, idx, rows = x
        ref = ref.at[lane, idx].set(rows, mode="drop")
        return ref, ref[lane]

    new_ref, frames_tiled = jax.lax.scan(
        step, ref_tiled, (lanes, tile_idx, tiles))
    if payload == "yuv420":
        return new_ref, untile_yuv(frames_tiled, frame_hw, tile)
    return new_ref, untile(frames_tiled, frame_hw)
