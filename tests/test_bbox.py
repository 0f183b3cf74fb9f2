import numpy as np

from telescope_cam_detection_tpu.utils.bbox import (
    bbox_iou,
    ensure_valid_bbox,
    is_valid_bbox,
    sanitize_boxes_jax,
    validate_bbox_coords,
)


def test_ensure_valid_bbox_swaps_inverted():
    out = ensure_valid_bbox({"x1": 10, "y1": 20, "x2": 5, "y2": 8})
    assert out["x1"] == 5 and out["x2"] == 10
    assert out["y1"] == 8 and out["y2"] == 20
    assert out["width"] == 5 and out["height"] == 12 and out["area"] == 60


def test_ensure_valid_bbox_min_size():
    out = ensure_valid_bbox({"x1": 3, "y1": 3, "x2": 3, "y2": 3})
    assert out["x2"] == 4 and out["y2"] == 4 and out["area"] == 1


def test_validate_bbox_coords_tuple():
    assert validate_bbox_coords(4, 2, 1, 9) == (1, 2, 4, 9)


def test_is_valid_bbox():
    assert is_valid_bbox({"x1": 0, "y1": 0, "x2": 5, "y2": 5})
    assert not is_valid_bbox({"x1": 5, "y1": 0, "x2": 0, "y2": 5})
    assert not is_valid_bbox({"x1": -1, "y1": 0, "x2": 5, "y2": 5})
    assert not is_valid_bbox({"x1": 0, "y1": 0})
    assert not is_valid_bbox(None)


def test_sanitize_boxes_jax_matches_host():
    boxes = np.array([[10, 20, 5, 8], [0, 0, 0, 0], [1, 2, 3, 4]], dtype=np.float32)
    out = np.asarray(sanitize_boxes_jax(boxes))
    for row_in, row_out in zip(boxes, out):
        exp = validate_bbox_coords(*row_in)
        assert np.allclose(row_out, exp)


def test_bbox_iou():
    a = {"x1": 0, "y1": 0, "x2": 10, "y2": 10}
    assert bbox_iou(a, a) == 1.0
    b = {"x1": 5, "y1": 0, "x2": 15, "y2": 10}
    assert abs(bbox_iou(a, b) - 50.0 / 150.0) < 1e-9
    c = {"x1": 20, "y1": 20, "x2": 30, "y2": 30}
    assert bbox_iou(a, c) == 0.0
