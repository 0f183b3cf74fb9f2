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
