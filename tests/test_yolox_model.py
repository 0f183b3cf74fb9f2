import numpy as np
import pytest

pytestmark = pytest.mark.slow

from telescope_cam_detection_tpu.models.yolox import (
    YOLOX_VARIANTS,
    decode_outputs,
    init_yolox,
)
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram,
    FilterSettings,
    ProgramSpec,
    rows_to_detections,
)


def test_yolox_nano_param_count():
    """YOLOX-nano is published at ~0.91M params — a strong structural check."""
    import jax
    _, variables = init_yolox("yolox-nano", input_hw=(256, 256))
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert 0.85e6 < n < 1.0e6, n


def test_yolox_decode_grid_math():
    """A zero head output at level-0 cell (i,j) must decode to a box centered
    at ((j+0.5... actually (j)*stride, i*stride) with size stride."""
    import jax.numpy as jnp
    h = w = 4
    stride = 8
    reg = np.zeros((1, h, w, 4), np.float32)
    obj = np.zeros((1, h, w, 1), np.float32)
    cls = np.zeros((1, h, w, 2), np.float32)
    boxes, objc, clsp = decode_outputs([(jnp.asarray(reg), jnp.asarray(obj),
                                         jnp.asarray(cls))], strides=[stride])
    boxes = np.asarray(boxes)[0]
    # anchor (0,0): center (0,0), wh = stride
    assert np.allclose(boxes[0], [-4, -4, 4, 4])
    # anchor row 1 col 2 -> index 1*4+2=6: center (16, 8)
    assert np.allclose(boxes[6], [16 - 4, 8 - 4, 16 + 4, 8 + 4])
    assert np.allclose(np.asarray(objc), 0.5)  # sigmoid(0)


def test_variants_table():
    assert set(YOLOX_VARIANTS) == {
        "yolox-nano", "yolox-tiny", "yolox-s", "yolox-m", "yolox-l", "yolox-x"}


@pytest.fixture(scope="module")
def nano_program():
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=(256, 256), max_det=20, pre_nms_topk=100)
    return DetectorProgram(spec, seed=0)


def test_detector_program_end_to_end(nano_program):
    frames = np.random.default_rng(0).integers(
        0, 256, size=(2, 256, 256, 3), dtype=np.uint8)
    rows = nano_program.detect_batch_rows(frames)
    assert rows.shape == (2, 20, 7)
    dets = nano_program.detect_batch(frames)
    assert len(dets) == 2
    for d in dets[0]:
        assert set(d) >= {"class_id", "class_name", "confidence", "bbox"}
        assert d["bbox"]["x2"] >= d["bbox"]["x1"]


def test_detector_program_scale_back(nano_program):
    """Boxes must come back in capture coords (512x384), not model coords."""
    frames = np.random.default_rng(1).integers(
        0, 256, size=(1, 384, 512, 3), dtype=np.uint8)
    nano_program.update_filters(FilterSettings(
        conf_threshold=0.0, wildlife_only=False))
    rows = nano_program.detect_batch_rows(frames)
    valid = rows[0][rows[0][:, 5] >= 0]
    assert valid.shape[0] > 0  # conf 0 keeps everything
    # all boxes inside a loose multiple of the capture frame
    assert np.all(valid[:, [0, 2]] < 512 * 2) and np.all(valid[:, [1, 3]] < 384 * 2)


def test_detector_program_compile_cache(nano_program):
    before = nano_program.stats["compilations"]
    frames = np.zeros((2, 256, 256, 3), np.uint8)
    nano_program.detect_batch_rows(frames)
    nano_program.detect_batch_rows(frames)
    after = nano_program.stats["compilations"]
    assert after <= before + 1  # second call hits the cache


def test_filter_settings_arrays():
    fs = FilterSettings(conf_threshold=0.25,
                        class_confidence_overrides={"person": 0.75},
                        min_box_area=20, wildlife_only=True)
    arrays = fs.to_arrays(80)
    conf = np.asarray(arrays["class_conf"])
    assert conf[0] == pytest.approx(0.75)   # person
    assert conf[14] == pytest.approx(0.25)  # bird default
    allowed = np.asarray(arrays["class_allowed"])
    assert allowed[[0, 14, 15, 16, 21]].all()
    assert not allowed[2]  # car filtered under wildlife_only


def test_rows_to_detections_skips_invalid():
    rows = np.full((5, 7), -1.0, np.float32)
    rows[0] = [10, 20, 30, 60, 0.9, 0.8, 15]
    dets = rows_to_detections(rows)
    assert len(dets) == 1
    d = dets[0]
    assert d["class_name"] == "cat"
    assert d["confidence"] == pytest.approx(0.72)
    assert d["bbox"]["area"] == pytest.approx(20 * 40)
