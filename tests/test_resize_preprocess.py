import numpy as np
import pytest

from telescope_cam_detection_tpu.ops.preprocess import (
    preprocess_classifier,
    preprocess_rtdetr,
    preprocess_yolox,
    scale_boxes_back,
)
from telescope_cam_detection_tpu.ops.resize import resize_bilinear_nhwc

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("in_hw,out_hw", [
    ((32, 48), (16, 24)),     # downsample
    ((16, 16), (40, 24)),     # upsample
    ((64, 64), (64, 64)),     # identity
    ((1080, 192), (640, 64)), # non-uniform video-ish aspect (narrow for speed)
])
def test_resize_matches_torch_interpolate(in_hw, out_hw):
    """Hard part 7 (SURVEY §7): our matmul resize must match
    F.interpolate(mode='bilinear', align_corners=False) exactly."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear_nhwc(img, out_hw))
    theirs = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        size=out_hw, mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-3)


def test_resize_uint8_input():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(1, 20, 20, 3), dtype=np.uint8)
    ours = np.asarray(resize_bilinear_nhwc(img, (10, 10)))
    theirs = F.interpolate(
        torch.from_numpy(img.astype(np.float32)).permute(0, 3, 1, 2),
        size=(10, 10), mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-3)


def test_preprocess_yolox_raw_range_bgr():
    img = np.full((1, 8, 8, 3), 200, dtype=np.uint8)
    img[..., 0] = 10  # B channel
    out = np.asarray(preprocess_yolox(img, (8, 8)))
    assert out.shape == (1, 8, 8, 3)
    # stays BGR, raw range
    assert np.allclose(out[0, 0, 0], [10, 200, 200])


def test_preprocess_rtdetr_rgb_unit_range():
    img = np.zeros((1, 8, 8, 3), dtype=np.uint8)
    img[..., 0] = 255  # blue in BGR
    out = np.asarray(preprocess_rtdetr(img, (8, 8)))
    # BGR->RGB: blue must land in channel 2, scaled to 1.0
    assert np.allclose(out[0, 0, 0], [0.0, 0.0, 1.0])


def test_preprocess_classifier_normalized():
    img = np.full((2, 16, 16, 3), 128, dtype=np.uint8)
    out = np.asarray(preprocess_classifier(img, (8, 8)))
    assert out.shape == (2, 8, 8, 3)
    # 128/255 normalized by CLIP mean/std: channel 0 (R)
    expected_r = (128 / 255 - 0.48145466) / 0.26862954
    assert np.allclose(out[..., 0], expected_r, atol=1e-5)


def test_scale_boxes_back():
    boxes = np.array([[0, 0, 640, 640], [320, 160, 480, 320]], dtype=np.float32)
    out = np.asarray(scale_boxes_back(boxes, (640, 640), (1080, 1920)))
    assert np.allclose(out[0], [0, 0, 1920, 1080])
    assert np.allclose(out[1], [960, 270, 1440, 540])
