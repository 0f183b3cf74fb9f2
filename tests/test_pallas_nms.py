"""Pallas NMS suppression kernel vs the XLA fixpoint path (interpret mode on
CPU; the same kernel compiles for TPU)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from telescope_cam_detection_tpu.ops.nms import _greedy_suppress, iou_matrix
from telescope_cam_detection_tpu.ops.pallas_nms import pallas_suppress


def _problem(rng, k=64, img=256):
    centers = rng.uniform(30, img - 30, size=(k, 2))
    wh = rng.uniform(10, 60, size=(k, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2],
                           axis=-1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1]
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_xla_fixpoint(seed):
    rng = np.random.default_rng(seed)
    boxes, scores = _problem(rng)
    valid = scores > 0.2
    want = np.asarray(_greedy_suppress(
        iou_matrix(jnp.asarray(boxes), jnp.asarray(boxes)),
        jnp.asarray(valid), 0.45))
    got = np.asarray(pallas_suppress(
        boxes[None], valid[None], iou_threshold=0.45, interpret=True))[0]
    np.testing.assert_array_equal(got, want)


def test_pallas_batched_and_padded():
    rng = np.random.default_rng(5)
    problems = [_problem(rng, k=50) for _ in range(3)]  # 50 -> padded to 128
    boxes = np.stack([p[0] for p in problems])
    valid = np.stack([p[1] > 0.1 for p in problems])
    got = np.asarray(pallas_suppress(boxes, valid, iou_threshold=0.45,
                                     interpret=True))
    assert got.shape == (3, 50)
    for i in range(3):
        want = np.asarray(_greedy_suppress(
            iou_matrix(jnp.asarray(boxes[i]), jnp.asarray(boxes[i])),
            jnp.asarray(valid[i]), 0.45))
        np.testing.assert_array_equal(got[i], want)


def test_pallas_identical_boxes():
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (8, 1))[None]
    valid = np.ones((1, 8), bool)
    keep = np.asarray(pallas_suppress(boxes, valid, interpret=True))[0]
    assert keep[0] and not keep[1:].any()  # highest-ranked survives


def test_batched_nms_impl_selection():
    """The batched_nms impl knob routes to identical results (rows
    bit-equal between xla and pallas on the same inputs; interpret mode on
    CPU)."""
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.ops import nms as nms_mod
    from telescope_cam_detection_tpu.ops import pallas_nms
    rng = np.random.default_rng(5)
    B, A, C = 2, 200, 10
    boxes = jnp.asarray(rng.uniform(0, 100, (B, A, 4)).astype(np.float32))
    obj = jnp.asarray(rng.uniform(0, 1, (B, A)).astype(np.float32))
    cls = jnp.asarray(rng.dirichlet(np.ones(C), (B, A)).astype(np.float32))
    ref = np.asarray(nms_mod.batched_nms(boxes, obj, cls, impl="xla",
                                         pre_nms_topk=128, max_det=32))
    # CPU lacks the TPU lowering: route pallas through interpret mode
    orig = pallas_nms.pallas_suppress
    try:
        pallas_nms.pallas_suppress = lambda b, v, iou_threshold=0.45: \
            orig(b, v, iou_threshold=iou_threshold, interpret=True)
        got = np.asarray(nms_mod.batched_nms(boxes, obj, cls, impl="pallas",
                                             pre_nms_topk=128, max_det=32))
    finally:
        pallas_nms.pallas_suppress = orig
    np.testing.assert_array_equal(ref, got)


def test_program_spec_nms_impl_validated():
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, ProgramSpec)
    with pytest.raises(ValueError, match="nms_impl"):
        DetectorProgram(ProgramSpec(detector_type="yolox",
                                    variant="yolox-nano",
                                    input_hw=(64, 64), nms_impl="bogus"))
