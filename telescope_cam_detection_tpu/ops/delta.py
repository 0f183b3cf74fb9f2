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
                lanes: int) -> Tuple[int, int, int, int, int]:
    h, w = frame_hw
    if h % tile or w % tile:
        raise ValueError(f"frame {frame_hw} not divisible by tile {tile}")
    return (lanes, (h // tile) * (w // tile), tile, tile, 3)


def untile(frames_tiled: jnp.ndarray, frame_hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, T, th, tw, 3) tiled -> (B, H, W, 3)."""
    b, t, th, tw, c = frames_tiled.shape
    h, w = frame_hw
    grid_h, grid_w = h // th, w // tw
    x = frames_tiled.reshape(b, grid_h, grid_w, th, tw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def apply_tile_deltas(
    ref_tiled: jnp.ndarray,
    lanes: jnp.ndarray,
    tile_idx: jnp.ndarray,
    tiles: jnp.ndarray,
    frame_hw: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter per-frame tile deltas into the reference, emit full frames.

    Args:
      ref_tiled: (L, T, th, tw, 3) uint8 device reference (donated by caller).
      lanes: (B,) int32 — which lane each batch entry belongs to. Entries are
        applied IN ORDER, so a batch may contain several sequential frames of
        the same lane (each delta is relative to the previous entry's state).
      tile_idx: (B, K) int32 — tile slots to overwrite; pad with T (one past
        the end, dropped by the scatter).
      tiles: (B, K, th, tw, 3) uint8 tile payloads.
      frame_hw: full frame (H, W).

    Returns (new_ref_tiled, frames) with frames (B, H, W, 3) uint8.
    """
    def step(ref, x):
        lane, idx, payload = x
        ref = ref.at[lane, idx].set(payload, mode="drop")
        return ref, ref[lane]

    new_ref, frames_tiled = jax.lax.scan(
        step, ref_tiled, (lanes, tile_idx, tiles))
    return new_ref, untile(frames_tiled, frame_hw)
