import numpy as np
import pytest

from telescope_cam_detection_tpu.ops import motion as motion_ops
from telescope_cam_detection_tpu.pipeline.filters import (
    AdaptiveMotionFilter,
    EmptyFrameFilter,
    MotionFilter,
)
from telescope_cam_detection_tpu.utils.frames import SyntheticFrameSource


def test_bgr_to_gray_matches_cv2_weights():
    frame = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], np.uint8)
    gray = np.asarray(motion_ops.bgr_to_gray(frame))
    assert gray[0, 0] == pytest.approx(0.114 * 255, abs=0.5)   # blue
    assert gray[0, 1] == pytest.approx(0.587 * 255, abs=0.5)   # green
    assert gray[0, 2] == pytest.approx(0.299 * 255, abs=0.5)   # red


def test_gaussian_blur_preserves_mean():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    out = np.asarray(motion_ops.gaussian_blur(img, 5))
    assert out.shape == img.shape
    assert abs(out[8:-8, 8:-8].mean() - img[8:-8, 8:-8].mean()) < 5.0


def test_empty_frame_filter_gates_static_scene():
    filt = EmptyFrameFilter(min_motion_area=50, blur_size=5, threshold=25)
    static = np.full((64, 64, 3), 100, np.uint8)
    assert filt.has_motion(static)            # first frame always passes
    assert not filt.has_motion(static)        # identical frame -> skip
    moved = static.copy()
    moved[20:40, 20:40] = 255
    assert filt.has_motion(moved)             # big bright blob -> motion
    stats = filt.get_stats()
    assert stats["frames_processed"] == 3 and stats["frames_skipped"] == 1


def test_empty_frame_filter_ignores_small_noise():
    filt = EmptyFrameFilter(min_motion_area=500, blur_size=21, threshold=25)
    base = np.full((64, 64, 3), 100, np.uint8)
    filt.has_motion(base)
    speck = base.copy()
    speck[5, 5] = 255  # single pixel, blurred away
    assert not filt.has_motion(speck)


def test_mog2_learns_background_and_flags_novelty():
    hw = (32, 32)
    state = motion_ops.init_mog2_state(hw)
    bg = np.full((*hw, 3), 90, np.uint8)
    import jax.numpy as jnp
    vt = jnp.asarray(16.0)
    lr = jnp.asarray(0.05)
    for _ in range(30):
        state, fg = motion_ops.mog2_update(state, jnp.asarray(bg), vt, lr)
    assert not np.asarray(fg).any()  # background fully learned
    novel = bg.copy()
    novel[10:20, 10:20] = 250
    state, fg = motion_ops.mog2_update(state, jnp.asarray(novel), vt, lr)
    fg = np.asarray(fg)
    assert fg[12:18, 12:18].all()
    assert not fg[:5, :5].any()


def test_motion_filter_rejects_static_detection():
    filt = MotionFilter(history=20, motion_blur_size=5, min_motion_ratio=0.1)
    bg = np.full((64, 64, 3), 90, np.uint8)
    det = {"class_name": "cat", "confidence": 0.9,
           "bbox": {"x1": 10, "y1": 10, "x2": 30, "y2": 30}}
    for _ in range(25):
        filt.filter_detections(bg, [])
    # static scene: detection bbox has no motion -> filtered
    out = filt.filter_detections(bg, [dict(det)])
    assert out == []
    # moving blob inside bbox -> kept
    moved = bg.copy()
    moved[10:30, 10:30] = 240
    out = filt.filter_detections(moved, [dict(det)])
    assert len(out) == 1 and out[0]["motion_ratio"] > 0.1
    stats = filt.get_stats()
    assert stats["total_filtered"] == 1


def test_bbox_motion_ratios_integral_image():
    import jax.numpy as jnp
    mask = np.zeros((20, 20), bool)
    mask[5:10, 5:10] = True
    boxes = np.array([[5, 5, 10, 10], [0, 0, 20, 20], [15, 15, 20, 20]], np.float32)
    ratios = np.asarray(motion_ops.bbox_motion_ratios(jnp.asarray(mask), boxes))
    assert ratios[0] == pytest.approx(1.0)
    assert ratios[1] == pytest.approx(25 / 400)
    assert ratios[2] == pytest.approx(0.0)


def test_adaptive_motion_filter_switches_thresholds():
    filt = AdaptiveMotionFilter(history=10, min_motion_ratio=0.1,
                                night_min_motion_ratio=0.3,
                                night_luma_threshold=60.0)
    day = np.full((16, 16, 3), 150, np.uint8)
    night = np.full((16, 16, 3), 20, np.uint8)
    filt.filter_detections(day, [])
    assert filt.min_motion_ratio == 0.1
    filt.filter_detections(night, [])
    assert filt.min_motion_ratio == 0.3


def test_motion_filter_hot_reload():
    filt = MotionFilter()
    updated = filt.update_params({"var_threshold": 25.0, "enabled": False})
    assert set(updated) == {"var_threshold", "enabled"}
    assert filt.var_threshold == 25.0 and not filt.enabled
    # disabled filter passes everything through
    out = filt.filter_detections(np.zeros((8, 8, 3), np.uint8),
                                 [{"bbox": {"x1": 0, "y1": 0, "x2": 4, "y2": 4}}])
    assert len(out) == 1


def test_motion_filter_absolute_pixel_floor():
    """Reference-parity gates (motion_filter.py:125): motion_pixels >=
    min_motion_pixels (fixed floor, default 10) AND ratio > min_motion_ratio.
    A couple of moving pixels must not pass even at a high ratio.
    (backend="xla": pins the first-party mixture; the cv2 backend treats
    uniform-gray brightening as shadow, which tests/test_motion_cv2_parity.py
    covers on colored content.)"""
    filt = MotionFilter(history=10, motion_blur_size=1, min_motion_ratio=0.05,
                        min_motion_pixels=10, backend="xla")
    bg = np.full((64, 64, 3), 90, np.uint8)
    for _ in range(15):
        filt.filter_detections(bg, [])
    moved = bg.copy()
    moved[10:12, 10:12] = 240  # 4 px of motion
    tiny_box = {"class_name": "bird",
                "bbox": {"x1": 9, "y1": 9, "x2": 13, "y2": 13}}  # 16px box
    out = filt.filter_detections(moved, [dict(tiny_box)])
    # ratio ~0.25 > 0.05 but motion pixels ~4 < 10 -> filtered
    assert out == []
    # a larger moving region passes both gates
    moved2 = bg.copy()
    moved2[8:24, 8:24] = 240
    big_box = {"class_name": "bird",
               "bbox": {"x1": 6, "y1": 6, "x2": 26, "y2": 26}}
    out = filt.filter_detections(moved2, [dict(big_box)])
    assert len(out) == 1


def test_motion_filter_boxes_clipped_to_frame():
    """Boxes extending past frame edges use clipped areas for the absolute
    gate (regression: unclipped area inflated motion_pixels)."""
    filt = MotionFilter(history=10, motion_blur_size=1, min_motion_ratio=0.05,
                        min_motion_pixels=10, backend="xla")
    bg = np.full((32, 32, 3), 90, np.uint8)
    for _ in range(15):
        filt.filter_detections(bg, [])
    moved = bg.copy()
    moved[0:16, 0:16] = 240
    half_out = {"class_name": "cat",
                "bbox": {"x1": -32, "y1": -32, "x2": 16, "y2": 16}}
    out = filt.filter_detections(moved, [dict(half_out)])
    assert len(out) == 1  # clipped area 16x16, fully moving -> passes


def test_mog2_color_shadow_classification():
    """Color mixture: multiplicative darkening of the learned background is
    shadow (foreground but masked), a different-hue object is real motion
    (cv2 detectShadows semantics, reference motion_filter.py:56-66,99)."""
    import jax.numpy as jnp
    hw = (32, 32)
    state = motion_ops.init_mog2_color_state(hw)
    bg = np.zeros((*hw, 3), np.uint8)
    bg[...] = (60, 120, 180)  # saturated warm background
    vt = jnp.asarray(16.0)
    lr = jnp.asarray(0.05)
    tau = jnp.asarray(motion_ops.MOG2_SHADOW_TAU)
    for _ in range(30):
        state, fg, shadow = motion_ops.mog2_update_color(
            state, jnp.asarray(bg), vt, lr, tau)
    assert not np.asarray(fg).any()

    # uniform 40% darkening in a patch: shadow, not motion
    shaded = bg.astype(np.float32)
    shaded[8:24, 8:24] *= 0.6
    state, fg, shadow = motion_ops.mog2_update_color(
        state, jnp.asarray(shaded.astype(np.uint8)), vt, lr, tau)
    fg, shadow = np.asarray(fg), np.asarray(shadow)
    assert fg[10:22, 10:22].all()          # it IS foreground...
    assert shadow[10:22, 10:22].all()      # ...but classified shadow
    assert not fg[:5, :5].any()

    # different-hue object at similar brightness: motion, NOT shadow
    obj = bg.copy()
    obj[8:24, 8:24] = (200, 60, 40)        # cool blue, similar magnitude
    state, fg, shadow = motion_ops.mog2_update_color(
        state, jnp.asarray(obj), vt, lr, tau)
    fg, shadow = np.asarray(fg), np.asarray(shadow)
    assert fg[10:22, 10:22].all()
    assert not shadow[10:22, 10:22].any()

    # darkening below tau (90% darker) is too dark to be shadow
    black = bg.astype(np.float32)
    black[8:24, 8:24] *= 0.1
    state, fg, shadow = motion_ops.mog2_update_color(
        state, jnp.asarray(black.astype(np.uint8)), vt, lr, tau)
    assert np.asarray(fg)[10:22, 10:22].all()
    assert not np.asarray(shadow)[10:22, 10:22].any()


def test_motion_filter_xla_shadow_gate():
    """End-to-end through MotionFilter backend='xla': a shadowed bbox is
    rejected with detect_shadows=True and kept with detect_shadows=False."""
    def run(detect_shadows):
        filt = MotionFilter(history=20, motion_blur_size=5,
                            min_motion_ratio=0.1, backend="xla",
                            detect_shadows=detect_shadows)
        bg = np.zeros((64, 64, 3), np.uint8)
        bg[...] = (60, 120, 180)
        for _ in range(30):
            filt.filter_detections(bg, [])
        shaded = bg.astype(np.float32)
        shaded[8:40, 8:40] *= 0.6
        det = {"class_name": "cat", "confidence": 0.9,
               "bbox": {"x1": 10, "y1": 10, "x2": 38, "y2": 38}}
        return filt.filter_detections(shaded.astype(np.uint8), [dict(det)])

    assert run(True) == []       # shadow pixels are not motion
    assert len(run(False)) == 1  # without shadow modeling they count


def test_chain_shape_quantized():
    from telescope_cam_detection_tpu.ops.motion import chain_shape
    assert chain_shape([]) == (1, 1)
    assert chain_shape([0]) == (1, 1)
    assert chain_shape([0, 1, 2, 3]) == (1, 4)
    assert chain_shape([0, 0, 0, 0]) == (4, 1)
    # balanced 8 cams x 4 frames
    assert chain_shape([c for _ in range(4) for c in range(8)]) == (4, 8)
    # quantization: 3 distinct lanes -> width 4; chains of 3 -> rounds 4
    assert chain_shape([0, 1, 2, 0, 0]) == (4, 4)
    # caps at batch size
    assert chain_shape([0, 0, 0]) == (3, 1)


def test_round_schedule_covers_all_entries():
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.ops.motion import (
        _round_schedule, chain_shape)
    cases = [
        [0, 1, 2, 3],
        [0, 0, 0, 0],
        [0, 1, 0, 1, 0],
        [2, 2, 5, 1, 2, 5],
    ]
    for lanes in cases:
        r, w = chain_shape(lanes)
        sched = np.asarray(_round_schedule(
            jnp.asarray(lanes, jnp.int32), r, w))
        flat = sched[sched >= 0]
        # every entry scheduled exactly once
        assert sorted(flat.tolist()) == list(range(len(lanes)))
        # within a round, lanes are distinct
        for row in sched:
            row_lanes = [lanes[i] for i in row if i >= 0]
            assert len(row_lanes) == len(set(row_lanes))
        # same-lane entries appear in increasing round order of batch order
        for lane in set(lanes):
            entries = [i for i in range(len(lanes)) if lanes[i] == lane]
            rounds_of = [int(np.argwhere(sched == i)[0][0]) for i in entries]
            assert rounds_of == sorted(rounds_of)
