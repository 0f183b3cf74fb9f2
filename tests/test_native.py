"""Native frameio library: build, bindings, and parity with cv2/numpy."""
import os

import numpy as np
import pytest

from telescope_cam_detection_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++?)")


def test_read_exact_pipe():
    r, w = os.pipe()
    payload = np.arange(1000, dtype=np.uint8) % 251
    os.write(w, payload.tobytes())
    os.close(w)
    got = native.read_exact(r, 1000)
    os.close(r)
    assert got is not None
    np.testing.assert_array_equal(got, payload)


def test_read_exact_short_returns_none():
    r, w = os.pipe()
    os.write(w, b"abc")
    os.close(w)
    assert native.read_exact(r, 100) is None
    os.close(r)


def test_resize_matches_cv2():
    import cv2
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (97, 133, 3), np.uint8)
    ours = native.resize_bilinear(frame, (48, 64))
    theirs = cv2.resize(frame, (64, 48), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    # cv2 uses fixed-point arithmetic; float path matches within 2 LSB
    assert diff.max() <= 2, diff.max()
    assert (diff > 1).mean() < 0.01


def test_resize_batch():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (3, 64, 80, 3), np.uint8)
    out = native.resize_batch(frames, (32, 40))
    assert out.shape == (3, 32, 40, 3)
    single = native.resize_bilinear(frames[1], (32, 40))
    np.testing.assert_array_equal(out[1], single)


def test_resize_identity():
    rng = np.random.default_rng(2)
    frame = rng.integers(0, 256, (32, 32, 3), np.uint8)
    out = native.resize_bilinear(frame, (32, 32))
    np.testing.assert_array_equal(out, frame)


def test_bgr_to_yuv420_roundtrip_luma():
    # uniform gray: Y == gray value, U == V == 128
    frame = np.full((16, 16, 3), 130, np.uint8)
    out = native.bgr_to_yuv420(frame)
    assert out.shape == (24, 16)
    y = out[:16]
    uv = out[16:]
    assert np.all(np.abs(y.astype(int) - 130) <= 1)
    assert np.all(np.abs(uv.astype(int) - 128) <= 1)


def test_bgr_to_yuv420_pure_blue():
    frame = np.zeros((8, 8, 3), np.uint8)
    frame[..., 0] = 255  # blue
    out = native.bgr_to_yuv420(frame)
    y = out[:8]
    assert np.all(np.abs(y.astype(int) - 29) <= 1)  # 0.114*255
