"""On-device motion gates: empty-frame differencing and a MOG2-equivalent
Gaussian-mixture background model.

Replaces the reference's CPU OpenCV paths:
  * empty_frame_filter.py:51-98 — gray -> Gaussian blur -> absdiff vs prev
    -> threshold -> count pixels. Here it's a tiny jitted program whose state
    (previous blurred gray) lives on device, so gating happens before any
    host<->device traffic for the detector.
  * motion_filter.py:56-127 — cv2 MOG2 background subtraction + per-bbox
    motion-pixel ratio. Here the Zivkovic-style mixture state
    (weights/means/vars per pixel, K components) is a device-resident pytree
    updated by one fused elementwise program per frame. OpenCV's exact update
    order is underspecified, so parity is defined on GATE DECISIONS, not
    pixels (SURVEY §7 hard part 5).

Both are pure functions (state, frame) -> (state, result), scan-friendly and
shardable over a camera axis with vmap/shard_map.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 luma weights for BGR input (matches cv2.cvtColor BGR2GRAY).
_LUMA_BGR = (0.114, 0.587, 0.299)


def bgr_to_gray(frames: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) BGR uint8/float -> (..., H, W) float32 gray."""
    w = jnp.asarray(_LUMA_BGR, jnp.float32)
    return jnp.tensordot(frames.astype(jnp.float32), w, axes=([-1], [0]))


@functools.lru_cache(maxsize=16)
def _gaussian_kernel_np(size: int) -> np.ndarray:
    """cv2.getGaussianKernel-compatible 1-D kernel (sigma auto rule)."""
    sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(gray: jnp.ndarray, size: int = 21) -> jnp.ndarray:
    """Separable Gaussian blur on (..., H, W) via two 1-D convolutions."""
    if size <= 1:
        return gray
    k = jnp.asarray(_gaussian_kernel_np(size))
    pad = size // 2
    x = gray[..., None]  # feature dim
    shape = x.shape
    x = x.reshape((-1,) + shape[-3:])  # (N, H, W, 1)
    kh = k.reshape(size, 1, 1, 1)
    kw = k.reshape(1, size, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn)
    return x.reshape(shape)[..., 0]


# ---------------------------------------------------------------------------
# Empty-frame gate
# ---------------------------------------------------------------------------

class FrameDiffState(NamedTuple):
    prev_blurred: jnp.ndarray  # (H, W) float32
    initialized: jnp.ndarray   # () bool


def init_frame_diff_state(hw: Tuple[int, int]) -> FrameDiffState:
    return FrameDiffState(jnp.zeros(hw, jnp.float32), jnp.asarray(False))


@functools.partial(jax.jit, static_argnames=("blur_size",))
def frame_diff_gate(
    state: FrameDiffState,
    frame_bgr: jnp.ndarray,          # (H, W, 3) uint8
    threshold: jnp.ndarray,          # () float — runtime (hot-reloadable)
    min_motion_area: jnp.ndarray,    # () float
    blur_size: int = 21,
) -> Tuple[FrameDiffState, jnp.ndarray, jnp.ndarray]:
    """Returns (new_state, has_motion: bool, motion_area: int32).

    First frame after init always reports motion (reference behavior:
    empty_frame_filter.py:61-66 runs inference when no previous frame).
    """
    blurred = gaussian_blur(bgr_to_gray(frame_bgr), blur_size)
    diff = jnp.abs(blurred - state.prev_blurred)
    motion_area = jnp.sum((diff > threshold).astype(jnp.int32))
    has_motion = jnp.where(state.initialized,
                           motion_area >= min_motion_area.astype(jnp.int32),
                           True)
    return (FrameDiffState(blurred, jnp.asarray(True)),
            has_motion, motion_area)


# ---------------------------------------------------------------------------
# MOG2-equivalent background model
# ---------------------------------------------------------------------------

class MOG2State(NamedTuple):
    weights: jnp.ndarray   # (H, W, K)
    means: jnp.ndarray     # (H, W, K)
    variances: jnp.ndarray  # (H, W, K)
    frame_count: jnp.ndarray  # () int32


MOG2_K = 4            # mixture components (OpenCV default 5; 4 is ample for gray)
MOG2_VAR_INIT = 15.0  # initial variance of a fresh component
MOG2_VAR_MIN = 4.0
MOG2_VAR_MAX = 75.0
MOG2_BG_RATIO = 0.9   # cumulative weight ratio marking background components


def _bg_prefix_mass(w: jnp.ndarray) -> jnp.ndarray:
    """For each component k: the total weight of components ranked ABOVE it
    when sorted by weight descending (ties broken by lower index first —
    matching stable argsort(-w)). Sort-free: K^2 pairwise comparisons
    instead of jnp.argsort, because XLA sorts at image scale dominate the
    whole mixture update on TPU (measured ~45 ms/step at 640^2 with two
    argsorts vs ~1 ms without)."""
    k = w.shape[-1]
    wi = w[..., :, None]                       # (..., K, 1): w_k
    wj = w[..., None, :]                       # (..., 1, K): w_j
    i_idx = jnp.arange(k)[:, None]
    j_idx = jnp.arange(k)[None, :]
    above = (wj > wi) | ((wj == wi) & (j_idx < i_idx))
    return jnp.sum(wj * above, axis=-1)        # (..., K)


def init_mog2_state(hw: Tuple[int, int], k: int = MOG2_K) -> MOG2State:
    h, w = hw
    return MOG2State(
        weights=jnp.zeros((h, w, k), jnp.float32),
        means=jnp.zeros((h, w, k), jnp.float32),
        variances=jnp.full((h, w, k), MOG2_VAR_INIT, jnp.float32),
        frame_count=jnp.asarray(0, jnp.int32),
    )


@jax.jit
def mog2_update(
    state: MOG2State,
    frame_bgr: jnp.ndarray,       # (H, W, 3) uint8
    var_threshold: jnp.ndarray,   # () float — cv2 varThreshold (default 16)
    learning_rate: jnp.ndarray,   # () float — alpha; use 1/history steady-state
) -> Tuple[MOG2State, jnp.ndarray]:
    """One background-model step. Returns (new_state, fg_mask (H,W) bool).

    Vectorized Zivkovic-style update: every pixel matches against its K
    components; the best matching component absorbs the sample, otherwise the
    weakest component is replaced. Background test: the sample is background
    if it matches any component within the cumulative-weight BG_RATIO prefix
    (components implicitly kept weight-sorted by the replacement rule).
    """
    x = bgr_to_gray(frame_bgr)  # (H, W)
    w, mu, var = state.weights, state.means, state.variances
    alpha = learning_rate

    d2 = (x[..., None] - mu) ** 2                      # (H, W, K)
    # never-used components (weight 0) are unmatchable — cv2 grows from
    # zero modes, so an all-zero init mean must not absorb dark samples
    matches = (d2 < var_threshold * var) & (w > 1e-6)  # match test (Tb)

    # pick best matching component (highest weight among matches)
    neg = jnp.where(matches, w, -1.0)
    best = jnp.argmax(neg, axis=-1)                    # (H, W)
    any_match = jnp.any(matches, axis=-1)
    onehot_best = jax.nn.one_hot(best, w.shape[-1], dtype=jnp.float32) * \
        any_match[..., None]

    # ownership o_k — 1 for the matched component
    w_new = w + alpha * (onehot_best - w)
    rho = alpha / jnp.maximum(w_new, 1e-6)
    mu_new = mu + onehot_best * rho * (x[..., None] - mu)
    var_new = var + onehot_best * rho * (d2 - var)
    var_new = jnp.clip(var_new, MOG2_VAR_MIN, MOG2_VAR_MAX)

    # no match: replace the weakest component with a fresh one
    weakest = jnp.argmin(w, axis=-1)
    onehot_weak = jax.nn.one_hot(weakest, w.shape[-1], dtype=jnp.float32) * \
        (~any_match)[..., None]
    w_new = jnp.where(onehot_weak > 0, alpha, w_new)
    mu_new = jnp.where(onehot_weak > 0, x[..., None], mu_new)
    var_new = jnp.where(onehot_weak > 0, MOG2_VAR_INIT, var_new)

    # renormalize weights
    w_new = w_new / jnp.maximum(jnp.sum(w_new, axis=-1, keepdims=True), 1e-6)

    # background test over the BG_RATIO cumulative-weight prefix (sort-free)
    in_bg = _bg_prefix_mass(w_new) < MOG2_BG_RATIO
    is_bg = jnp.any(matches & in_bg, axis=-1)

    # warm-up: first frames are all background (model still learning)
    fg = jnp.where(state.frame_count < 1, False, ~is_bg)
    new_state = MOG2State(w_new, mu_new, var_new, state.frame_count + 1)
    return new_state, fg


# ---------------------------------------------------------------------------
# Color MOG2 with shadow modeling
# ---------------------------------------------------------------------------

class MOG2ColorState(NamedTuple):
    weights: jnp.ndarray    # (H, W, K)
    means: jnp.ndarray      # (H, W, K, 3) BGR
    variances: jnp.ndarray  # (H, W, K) shared across channels (cv2 layout)
    frame_count: jnp.ndarray  # () int32


MOG2_SHADOW_TAU = 0.5  # cv2 fTau default: shadow darkens to >= 50% brightness
# cv2 color semantics (bgfg_gaussmix2.cpp): the squared distance SUMS the 3
# channels and compares against Tb*var with the SAME varInit 15 / varMin 4 /
# varMax 75 constants as gray — the per-component variance absorbs the
# 3-channel summed deviation, there is no channel-count scaling. So
# var_threshold here is numerically interchangeable with cv2's varThreshold.


def init_mog2_color_state(hw: Tuple[int, int], k: int = MOG2_K) -> MOG2ColorState:
    h, w = hw
    return MOG2ColorState(
        weights=jnp.zeros((h, w, k), jnp.float32),
        means=jnp.zeros((h, w, k, 3), jnp.float32),
        variances=jnp.full((h, w, k), MOG2_VAR_INIT, jnp.float32),
        frame_count=jnp.asarray(0, jnp.int32),
    )


def _mog2_color_core(
    w: jnp.ndarray,               # (..., K)
    mu: jnp.ndarray,              # (..., K, 3)
    var: jnp.ndarray,             # (..., K)
    frame_count: jnp.ndarray,     # () int32
    x: jnp.ndarray,               # (..., 3) float32 BGR sample
    var_threshold: jnp.ndarray,
    learning_rate: jnp.ndarray,
    shadow_tau: jnp.ndarray,
):
    """One color-mixture update without the state wrapper; shared by the
    single-frame `mog2_update_color` and the fused multi-lane `gate_step`.
    Returns (w_new, mu_new, var_new, fg, shadow)."""
    alpha = learning_rate

    d = x[..., None, :] - mu                          # (H, W, K, 3)
    d2 = jnp.sum(d * d, axis=-1)                      # (H, W, K)
    # weight-0 components are unmatchable (cv2 grows from zero modes)
    matches = (d2 < var_threshold * var) & (w > 1e-6)

    neg = jnp.where(matches, w, -1.0)
    best = jnp.argmax(neg, axis=-1)
    any_match = jnp.any(matches, axis=-1)
    onehot_best = jax.nn.one_hot(best, w.shape[-1], dtype=jnp.float32) * \
        any_match[..., None]

    w_new = w + alpha * (onehot_best - w)
    rho = alpha / jnp.maximum(w_new, 1e-6)
    mu_new = mu + (onehot_best * rho)[..., None] * d
    # variance absorbs the summed 3-channel squared deviation (cv2 layout)
    var_new = var + onehot_best * rho * (d2 - var)
    var_new = jnp.clip(var_new, MOG2_VAR_MIN, MOG2_VAR_MAX)

    weakest = jnp.argmin(w, axis=-1)
    onehot_weak = jax.nn.one_hot(weakest, w.shape[-1], dtype=jnp.float32) * \
        (~any_match)[..., None]
    w_new = jnp.where(onehot_weak > 0, alpha, w_new)
    mu_new = jnp.where(onehot_weak[..., None] > 0,
                       x[..., None, :], mu_new)
    var_new = jnp.where(onehot_weak > 0, MOG2_VAR_INIT, var_new)

    w_new = w_new / jnp.maximum(jnp.sum(w_new, axis=-1, keepdims=True), 1e-6)

    # background membership over the BG_RATIO cumulative-weight prefix
    # (sort-free pairwise formulation, _bg_prefix_mass)
    in_bg_new = _bg_prefix_mass(w_new) < MOG2_BG_RATIO
    is_bg = jnp.any(matches & in_bg_new, axis=-1)

    # shadow test against each PRE-UPDATE background component (cv2 runs
    # detection against the existing modes; the sample inserted this step
    # must not compare against itself): brightness ratio
    # a = <x, mu>/<mu, mu> within [tau, 1] and chroma distortion
    # ||x - a*mu||^2 under Tb * var * a^2
    in_bg = ((_bg_prefix_mass(w) < MOG2_BG_RATIO)
             & (w > 1e-6))                                         # (H,W,K)
    num = jnp.sum(x[..., None, :] * mu, axis=-1)                   # (H,W,K)
    den = jnp.maximum(jnp.sum(mu * mu, axis=-1), 1e-6)
    a = num / den
    a_ok = (a >= shadow_tau) & (a <= 1.0)
    dist = x[..., None, :] - a[..., None] * mu
    dist2a = jnp.sum(dist * dist, axis=-1)
    shadow_k = in_bg & a_ok & (dist2a < var_threshold * var * a * a)
    is_shadow = jnp.any(shadow_k, axis=-1)

    fg = jnp.where(frame_count < 1, jnp.zeros_like(is_bg), ~is_bg)
    shadow = fg & is_shadow
    return w_new, mu_new, var_new, fg, shadow


@jax.jit
def mog2_update_color(
    state: MOG2ColorState,
    frame_bgr: jnp.ndarray,       # (H, W, 3) uint8
    var_threshold: jnp.ndarray,   # () float — cv2 varThreshold (default 16)
    learning_rate: jnp.ndarray,   # () float
    shadow_tau: jnp.ndarray,      # () float — cv2 fTau (default 0.5)
) -> Tuple[MOG2ColorState, jnp.ndarray, jnp.ndarray]:
    """Color-space mixture step with Prati-style shadow classification
    (cv2 BackgroundSubtractorMOG2 detectShadows semantics,
    reference motion_filter.py:56-66 constructs it with detectShadows=True).

    Returns (new_state, fg_mask (H,W) bool, shadow_mask (H,W) bool) where
    shadow_mask ⊆ fg_mask: pixels that differ from the background only as a
    uniform darkening (tau <= brightness ratio < 1, small chroma distortion)
    — the caller excludes them from motion (reference motion_filter.py:99
    zeroes the 127-valued shadow pixels).
    """
    w_new, mu_new, var_new, fg, shadow = _mog2_color_core(
        state.weights, state.means, state.variances, state.frame_count,
        frame_bgr.astype(jnp.float32), var_threshold, learning_rate,
        shadow_tau)
    new_state = MOG2ColorState(w_new, mu_new, var_new, state.frame_count + 1)
    return new_state, fg, shadow


@functools.partial(jax.jit, static_argnames=("blur_size",))
def motion_mask_postprocess(fg_mask: jnp.ndarray, blur_size: int = 21,
                            binary_threshold: float = 0.5) -> jnp.ndarray:
    """Blur + re-threshold the boolean fg mask to kill speckle (reference
    motion_filter.py:95-105 blurs the MOG2 output then thresholds at 127)."""
    blurred = gaussian_blur(fg_mask.astype(jnp.float32), blur_size)
    return blurred > binary_threshold


def bbox_motion_ratios(mask: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Motion-pixel ratio inside each box without dynamic slicing.

    mask: (H, W) bool; boxes: (N, 4) xyxy float. Uses an integral image so the
    per-box cost is O(1) gathers — static shapes, works under jit/vmap.
    """
    h, w = mask.shape
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(mask.astype(jnp.float32), 0), 1),
                 ((1, 0), (1, 0)))
    x1 = jnp.clip(boxes[:, 0].astype(jnp.int32), 0, w)
    y1 = jnp.clip(boxes[:, 1].astype(jnp.int32), 0, h)
    x2 = jnp.clip(jnp.ceil(boxes[:, 2]).astype(jnp.int32), 0, w)
    y2 = jnp.clip(jnp.ceil(boxes[:, 3]).astype(jnp.int32), 0, h)
    total = ii[y2, x2] - ii[y1, x2] - ii[y2, x1] + ii[y1, x1]
    area = jnp.maximum((x2 - x1) * (y2 - y1), 1).astype(jnp.float32)
    return total / area


# ---------------------------------------------------------------------------
# Fused multi-lane gates (device-resident state inside the detector program)
# ---------------------------------------------------------------------------

class GateState(NamedTuple):
    """Per-lane gate state for the FUSED detector program (SURVEY §7: the
    empty-frame gate and the MOG2 background model live in HBM inside the
    same jitted program as the detector, so gating costs zero host work and
    zero extra dispatches). One lane per camera stream.

    Shapes: L lanes at mask resolution (h, w), K mixture components."""
    prev_blurred: jnp.ndarray   # (L, h, w) float32 — frame-diff state
    initialized: jnp.ndarray    # (L,) bool
    weights: jnp.ndarray        # (L, h, w, K)
    means: jnp.ndarray          # (L, h, w, K, 3) BGR
    variances: jnp.ndarray      # (L, h, w, K)
    frame_count: jnp.ndarray    # (L,) int32


def init_gate_state(hw: Tuple[int, int], lanes: int,
                    k: int = MOG2_K) -> GateState:
    h, w = hw
    return GateState(
        prev_blurred=jnp.zeros((lanes, h, w), jnp.float32),
        initialized=jnp.zeros((lanes,), bool),
        weights=jnp.zeros((lanes, h, w, k), jnp.float32),
        means=jnp.zeros((lanes, h, w, k, 3), jnp.float32),
        variances=jnp.full((lanes, h, w, k), MOG2_VAR_INIT, jnp.float32),
        frame_count=jnp.zeros((lanes,), jnp.int32),
    )


# gate_params layout (runtime array -> hot-reload without recompilation)
GATE_PARAM_EMPTY_THRESHOLD = 0   # empty-frame diff threshold (cfg .threshold)
GATE_PARAM_VAR_THRESHOLD = 1     # MOG2 Tb (cfg motion_filter.var_threshold)
GATE_PARAM_LEARNING_RATE = 2     # MOG2 alpha (1 / history)
GATE_PARAM_SHADOW_TAU = 3        # MOG2 fTau
GATE_PARAM_DETECT_SHADOWS = 4    # 0/1
N_GATE_PARAMS = 5


def chain_shape(lane_list) -> Tuple[int, int]:
    """Host helper: (rounds, round_width) for a dispatch's lane list.

    rounds = the longest same-lane chain in the batch; round_width = the
    number of distinct lanes. Both are STATIC shape parameters of the gate
    program (one compile per observed (rounds, width) pattern — serving
    patterns are stable: coordinator batches are balanced rounds of
    distinct lanes).

    Entries with lane < 0 (the coordinator's batch-padding frames) are
    excluded: they carry no gate state, so chaining them would only
    inflate `rounds` (a bucket-16 batch with 9 real frames would pay 8
    sequential rounds for its 7 pads instead of the 2 its cameras need)."""
    counts: dict = {}
    for lane in lane_list:
        if lane < 0:
            continue
        counts[lane] = counts.get(lane, 0) + 1
    if not counts:
        return 1, 1
    b = len(lane_list)

    def q(v: int) -> int:  # next power of two, capped at the batch size:
        return min(1 << (v - 1).bit_length(), b)
    # quantized so ragged batches (drop-oldest, pad lanes) reuse a handful
    # of compiled variants instead of one per exact chain pattern; the
    # schedule pads unused slots with -1 (dropped scatters)
    return q(max(counts.values())), q(len(counts))


def _round_schedule(lanes: jnp.ndarray, rounds: int,
                    width: int) -> jnp.ndarray:
    """(B,) lane ids -> (rounds, width) batch-entry indices, padded -1.

    Entry i belongs to round occ(i) = number of earlier same-lane entries;
    within a round, entries keep batch order. Each lane appears at most
    once per round, so round updates never conflict. Entries with
    lane < 0 (batch padding) are excluded from the schedule entirely:
    their state updates and gate outputs are dropped."""
    b = lanes.shape[0]
    earlier_same = (lanes[None, :] == lanes[:, None]) & (
        jnp.arange(b)[None, :] < jnp.arange(b)[:, None])
    occ = jnp.sum(earlier_same, axis=1)                     # (B,) round id
    # padding entries: push out of the (rounds, width) range -> mode="drop"
    occ = jnp.where(lanes < 0, b, occ)
    same_round_earlier = (occ[None, :] == occ[:, None]) & (
        jnp.arange(b)[None, :] < jnp.arange(b)[:, None])
    slot = jnp.sum(same_round_earlier, axis=1)              # (B,) round slot
    sched = jnp.full((rounds, width), -1, jnp.int32)
    return sched.at[occ, slot].set(jnp.arange(b, dtype=jnp.int32),
                                   mode="drop")


def gate_step(
    state: GateState,
    frames_bgr: jnp.ndarray,      # (B, h, w, 3) uint8
    lanes: jnp.ndarray,           # (B,) int32 — stream lane per batch entry
    params: jnp.ndarray,          # (N_GATE_PARAMS,) float32
    blur_size: int = 21,
    motion_blur_size: int = 21,
    rounds: int = 0,              # static; 0 = worst case (B rounds)
    round_width: int = 0,         # static; 0 = worst case (B lanes)
):
    """Run BOTH motion gates for a batch of frames against per-lane state.

    Entries are applied IN BATCH ORDER per lane, so a batch may carry
    several sequential frames of the same stream — each diffs/updates
    against the previous entry's result, exactly like the per-frame host
    gates. Processing is organised as `rounds` sequential rounds of up to
    `round_width` DISTINCT-lane entries updated in one vectorized step
    (`chain_shape` computes the tight static pair on the host; a
    per-camera coordinator batch is a few balanced rounds instead of B
    sequential scan steps — measured 8x fewer sequential MOG2 passes at
    batch 32 over 8 cameras).

    Returns (new_state, aux) with aux:
      motion_area  (B,) float32 — empty-gate changed-pixel count (mask px)
      initialized  (B,) bool    — False for a lane's first-ever frame
                                  (host treats it as motion, reference
                                  empty_frame_filter.py:61-66)
      masks        (B, h, w) bool — post-processed MOG2 foreground
      mean_luma    (B,) float32 — for day/night adaptive thresholds
    """
    b, h, w3 = frames_bgr.shape[0], frames_bgr.shape[1], frames_bgr.shape[2]
    n_lanes = state.prev_blurred.shape[0]
    rounds = rounds or b
    round_width = round_width or b
    gray = bgr_to_gray(frames_bgr)                       # (B, h, w)
    mean_luma = jnp.mean(gray, axis=(1, 2))
    blurred = gaussian_blur(gray, blur_size)
    x = frames_bgr.astype(jnp.float32)
    empty_thr = params[GATE_PARAM_EMPTY_THRESHOLD]
    var_thr = params[GATE_PARAM_VAR_THRESHOLD]
    lr = params[GATE_PARAM_LEARNING_RATE]
    tau = params[GATE_PARAM_SHADOW_TAU]
    detect_shadows = params[GATE_PARAM_DETECT_SHADOWS] > 0.5

    sched = _round_schedule(lanes, rounds, round_width)   # (R, W)

    def round_step(carry, idx_row):
        st, areas, initeds, fgs = carry
        valid = idx_row >= 0                              # (W,)
        entry = jnp.maximum(idx_row, 0)
        lane = lanes[entry]                               # (W,) distinct
        # scatter target: invalid slots drop (index out of range)
        tgt = jnp.where(valid, lane, n_lanes)
        out_pos = jnp.where(valid, idx_row, b)
        blur_r = blurred[entry]                           # (W, h, w)
        frame_r = x[entry]                                # (W, h, w, 3)
        # empty-frame diff gate (reference empty_frame_filter.py:51-98)
        diff = jnp.abs(blur_r - st.prev_blurred[lane])
        area = jnp.sum((diff > empty_thr).astype(jnp.float32), axis=(1, 2))
        inited = st.initialized[lane]
        # MOG2 color mixture, vectorized over the round's distinct lanes
        # (reference motion_filter.py:56-127); the core is written over
        # (..., K) so the gathered (W, h, w, K) slices batch directly
        w_new, mu_new, var_new, fg, shadow = _mog2_color_core(
            st.weights[lane], st.means[lane], st.variances[lane],
            st.frame_count[lane][:, None, None], frame_r, var_thr, lr, tau)
        fg = fg & ~(shadow & detect_shadows)
        new_st = GateState(
            prev_blurred=st.prev_blurred.at[tgt].set(blur_r, mode="drop"),
            initialized=st.initialized.at[tgt].set(True, mode="drop"),
            weights=st.weights.at[tgt].set(w_new, mode="drop"),
            means=st.means.at[tgt].set(mu_new, mode="drop"),
            variances=st.variances.at[tgt].set(var_new, mode="drop"),
            frame_count=st.frame_count.at[tgt].add(1, mode="drop"),
        )
        areas = areas.at[out_pos].set(area, mode="drop")
        initeds = initeds.at[out_pos].set(inited, mode="drop")
        fgs = fgs.at[out_pos].set(fg, mode="drop")
        return (new_st, areas, initeds, fgs), None

    areas0 = jnp.zeros((b,), jnp.float32)
    initeds0 = jnp.zeros((b,), bool)
    fgs0 = jnp.zeros((b, h, w3), bool)
    (new_state, areas, initeds, fgs), _ = jax.lax.scan(
        round_step, (state, areas0, initeds0, fgs0), sched)
    masks = motion_mask_postprocess(fgs, blur_size=motion_blur_size)
    return new_state, {
        "motion_area": areas,
        "initialized": initeds,
        "masks": masks,
        "mean_luma": mean_luma,
    }


def batch_bbox_motion_stats(
    masks: jnp.ndarray,   # (B, h, w) bool
    boxes: jnp.ndarray,   # (B, D, 4) xyxy float, MASK coordinates
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized per-detection motion stats over a batch of masks.

    Returns (ratios (B, D), pixels (B, D)) with the same floor/ceil/clip
    semantics as `bbox_motion_ratios`; pixels = ratio * clipped box area
    (mask-resolution pixel counts)."""
    ratios = jax.vmap(bbox_motion_ratios)(masks, boxes)
    h, w = masks.shape[1:]
    x1 = jnp.clip(boxes[..., 0].astype(jnp.int32), 0, w)
    y1 = jnp.clip(boxes[..., 1].astype(jnp.int32), 0, h)
    x2 = jnp.clip(jnp.ceil(boxes[..., 2]).astype(jnp.int32), 0, w)
    y2 = jnp.clip(jnp.ceil(boxes[..., 3]).astype(jnp.int32), 0, h)
    areas = jnp.maximum((x2 - x1) * (y2 - y1), 1).astype(jnp.float32)
    return ratios, ratios * areas
