"""Device-side crop extraction: ROI sampling parity with host crop+resize,
and the two-stage device_crops fast path."""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from telescope_cam_detection_tpu.ops.crops import (
    boxes_with_padding,
    sample_crops,
)


def test_sample_crops_matches_host_crop_resize():
    """Device ROI sampling of an integer-aligned box == resize of the host
    crop (same half-pixel bilinear convention)."""
    import cv2
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (120, 160, 3), np.uint8)
    x1, y1, x2, y2 = 20, 30, 84, 94
    boxes = np.array([[0, x1, y1, x2, y2]], np.float32)
    ours = np.asarray(sample_crops(jnp.asarray(frame[None]), boxes, (32, 32)))[0]
    theirs = cv2.resize(frame[y1:y2, x1:x2], (32, 32),
                        interpolation=cv2.INTER_LINEAR).astype(np.float32)
    assert np.abs(ours - theirs).max() <= 2.0  # cv2 fixed-point vs float


def test_sample_crops_identity_box():
    frame = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    boxes = np.array([[0, 0, 0, 4, 4]], np.float32)
    out = np.asarray(sample_crops(jnp.asarray(frame[None]), boxes, (4, 4)))[0]
    np.testing.assert_allclose(out, frame.astype(np.float32), atol=1e-4)


def test_sample_crops_batch_index_selects_frame():
    frames = np.stack([np.full((8, 8, 3), 10, np.uint8),
                       np.full((8, 8, 3), 200, np.uint8)])
    boxes = np.array([[0, 0, 0, 8, 8], [1, 0, 0, 8, 8]], np.float32)
    out = np.asarray(sample_crops(jnp.asarray(frames), boxes, (4, 4)))
    assert np.allclose(out[0], 10) and np.allclose(out[1], 200)


def test_boxes_with_padding():
    bboxes = [{"x1": 40, "y1": 40, "x2": 60, "y2": 60}]
    out = boxes_with_padding((100, 100), bboxes, [0], padding_percent=40, k=4)
    assert out.shape == (4, 5)
    np.testing.assert_allclose(out[0], [0, 36, 36, 64, 64])
    assert (out[1:, 0] == -1).all()  # padding rows
    # clamped at frame edges
    out = boxes_with_padding((100, 100), [{"x1": 0, "y1": 0, "x2": 20,
                                           "y2": 20}], [0], 100, k=1)
    assert out[0, 1] == 0 and out[0, 2] == 0


@pytest.mark.slow
def test_two_stage_device_crops_path(tmp_path):
    from telescope_cam_detection_tpu.pipeline.species import SpeciesClassifier
    from telescope_cam_detection_tpu.pipeline.two_stage import (
        TwoStageDetectionPipeline)
    tax = {str(i): f"Species {i}" for i in range(16)}
    p = tmp_path / "tax.json"
    p.write_text(json.dumps(tax))
    clf = SpeciesClassifier(model_name="eva02-tiny", num_classes=16,
                            input_size=56, taxonomy_file=str(p), seed=0,
                            use_hierarchical=False)
    host_pipe = TwoStageDetectionPipeline(
        species_classifier=clf, min_crop_size=16, confidence_threshold=0.0,
        crop_batch_size_hw=56, device_crops=False)
    dev_pipe = TwoStageDetectionPipeline(
        species_classifier=clf, min_crop_size=16, confidence_threshold=0.0,
        crop_batch_size_hw=56, device_crops=True)
    frame = np.random.default_rng(1).integers(0, 256, (200, 200, 3), np.uint8)
    det = {"class_id": 15, "class_name": "cat", "confidence": 0.9,
           "bbox": {"x1": 30, "y1": 30, "x2": 130, "y2": 130}}
    out_host = host_pipe.process_detections(frame, [dict(det)])
    out_dev = dev_pipe.process_detections(frame, [dict(det)])
    assert "species" in out_dev[0]
    # same crop content through either path -> same top-1 species
    assert out_dev[0]["species"] == out_host[0]["species"]
    assert out_dev[0]["species_confidence"] == pytest.approx(
        out_host[0]["species_confidence"], abs=0.05)
