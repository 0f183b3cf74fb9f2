"""RT-DETR training: loss semantics, gradients, and learning smoke.

The reference never trains RT-DETR (it consumes upstream checkpoints,
reference src/rtdetr_detector.py:60-141); these tests pin the framework's
from-scratch trainable path: Hungarian-matched VFL/L1/GIoU loss with deep
supervision, and a jitted train step that actually reduces the loss.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telescope_cam_detection_tpu.train.detr_loss import (
    cxcywh_to_xyxy, generalized_iou, rtdetr_loss)


def _mk_targets(batch, max_gt, boxes_px, classes):
    t = np.full((batch, max_gt, 5), -1.0, np.float32)
    for b in range(batch):
        for g, (bx, cl) in enumerate(zip(boxes_px[b], classes[b])):
            t[b, g, :4] = bx
            t[b, g, 4] = cl
    return jnp.asarray(t)


def _outputs(logits, boxes):
    return (logits, boxes, {"layers": (), "enc": None})


def test_giou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    assert float(generalized_iou(a, a)[0]) == pytest.approx(1.0)
    b = jnp.asarray([[2.0, 2.0, 3.0, 3.0]])
    assert float(generalized_iou(a, b)[0]) < 0.0  # disjoint -> negative


def test_perfect_predictions_score_lower():
    q, c, hw = 20, 4, (128, 128)
    targets = _mk_targets(1, 6, [[(16, 16, 48, 48), (64, 64, 120, 112)]],
                          [[1, 3]])
    gt_norm = jnp.asarray([[0.25, 0.25, 0.25, 0.25],
                           [0.71875, 0.6875, 0.4375, 0.375]], jnp.float32)

    good_logits = jnp.full((1, q, c), -8.0)
    good_logits = good_logits.at[0, 0, 1].set(8.0).at[0, 1, 3].set(8.0)
    good_boxes = jnp.tile(jnp.asarray([[0.5, 0.5, 0.1, 0.1]]), (q, 1))[None]
    good_boxes = good_boxes.at[0, 0].set(gt_norm[0]).at[0, 1].set(gt_norm[1])

    bad_logits = jnp.zeros((1, q, c))
    bad_boxes = jnp.tile(jnp.asarray([[0.1, 0.9, 0.05, 0.05]]), (q, 1))[None]

    good, gm = rtdetr_loss(_outputs(good_logits, good_boxes), targets, hw, c)
    bad, bm = rtdetr_loss(_outputs(bad_logits, bad_boxes), targets, hw, c)
    assert float(good) < float(bad)
    assert float(gm["l1_loss"]) < 1e-3
    assert float(gm["giou_loss"]) < 1e-3


def test_matching_is_exclusive_and_ignores_padding():
    # two GTs on the same spot as one good query: only one can claim it
    q, c, hw = 8, 2, (64, 64)
    targets = _mk_targets(1, 4, [[(0, 0, 32, 32), (0, 0, 32, 32)]], [[0, 0]])
    logits = jnp.zeros((1, q, c))
    boxes = jnp.tile(jnp.asarray([[0.25, 0.25, 0.5, 0.5]]), (q, 1))[None]
    loss, metrics = rtdetr_loss(_outputs(logits, boxes), targets, hw, c)
    assert float(metrics["num_pos"]) == 2.0
    assert np.isfinite(float(loss))


def test_loss_gradients_finite_and_nonzero():
    q, c, hw = 12, 3, (64, 64)
    targets = _mk_targets(2, 3, [[(8, 8, 40, 40)], [(16, 0, 64, 48)]],
                          [[2], [0]])
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, q, c)), jnp.float32)
    boxes = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(2, q, 4)), jnp.float32))

    def f(lg, bx):
        loss, _ = rtdetr_loss(_outputs(lg, bx), targets, hw, c)
        return loss

    gl, gb = jax.grad(f, argnums=(0, 1))(logits, boxes)
    assert np.all(np.isfinite(np.asarray(gl)))
    assert np.all(np.isfinite(np.asarray(gb)))
    assert float(jnp.abs(gl).sum()) > 0 and float(jnp.abs(gb).sum()) > 0


def test_aux_heads_add_supervision():
    q, c, hw = 10, 2, (64, 64)
    targets = _mk_targets(1, 2, [[(0, 0, 32, 32)]], [[1]])
    rng = np.random.default_rng(1)
    lg = jnp.asarray(rng.normal(size=(1, q, c)), jnp.float32)
    bx = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(1, q, 4)), jnp.float32))
    base, _ = rtdetr_loss(_outputs(lg, bx), targets, hw, c)
    with_aux, _ = rtdetr_loss(
        (lg, bx, {"layers": ((lg, bx),), "enc": (lg, bx)}), targets, hw, c)
    assert float(with_aux) == pytest.approx(3 * float(base), rel=1e-5)


@pytest.mark.slow
def test_rtdetr_train_step_learns():
    """A jitted RT-DETR train step reduces the loss on a fixed tiny batch."""
    from telescope_cam_detection_tpu.train.trainer import build_training

    model, state, step = build_training(
        variant="rtdetrv2-r18vd", num_classes=3, input_hw=(128, 128),
        learning_rate=2e-4, seed=0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)), jnp.float32)
    targets = _mk_targets(2, 4,
                          [[(16, 16, 64, 64)], [(32, 48, 96, 120)]],
                          [[0], [2]])
    losses = []
    for _ in range(8):
        state, metrics = step(state, images, targets)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    # EMA/serving export path still works
    assert state.serving_params() is not None


@pytest.mark.slow
def test_rtdetr_export_serves(tmp_path):
    """Trained RT-DETR weights export without aux heads and load into the
    serving DetectorProgram."""
    from telescope_cam_detection_tpu.models.convert import load_variables
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, ProgramSpec)
    from telescope_cam_detection_tpu.train.checkpoint import (
        export_serving_weights)
    from telescope_cam_detection_tpu.train.trainer import build_training

    model, state, step = build_training(
        variant="rtdetrv2-r18vd", num_classes=3, input_hw=(128, 128),
        learning_rate=1e-4, seed=0)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    targets = _mk_targets(1, 2, [[(16, 16, 64, 64)]], [[0]])
    state, _ = step(state, images, targets)

    path = str(tmp_path / "rtdetr_custom.msgpack")
    export_serving_weights(state, path)
    loaded = load_variables(path)
    assert loaded is not None
    assert not any(str(k).startswith("aux_class_head")
                   or str(k) == "dn_class_embed"
                   for k in loaded["params"])

    spec = ProgramSpec(detector_type="rtdetr", variant="rtdetrv2-r18vd",
                       num_classes=3, input_hw=(128, 128), max_det=10,
                       pre_nms_topk=20)
    program = DetectorProgram(spec)
    program.variables = loaded
    dets = program.detect(np.zeros((128, 128, 3), np.uint8))
    assert isinstance(dets, list)


@pytest.mark.slow
def test_rtdetr_sharded_train_step(jax_devices):
    """The RT-DETR step jits over a (dp=4, mp=2) mesh with real shardings."""
    from telescope_cam_detection_tpu.parallel import mesh as mesh_lib
    from telescope_cam_detection_tpu.train.trainer import build_training

    mesh = mesh_lib.create_mesh(8, model_parallel=2)
    model, state, step = build_training(
        variant="rtdetrv2-r18vd", num_classes=2, input_hw=(128, 128),
        learning_rate=1e-4, mesh=mesh, seed=0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (4, 128, 128, 3)), jnp.float32)
    targets = _mk_targets(4, 2, [[(8, 8, 64, 64)]] * 4, [[1]] * 4)
    state, metrics = step(state, images, targets)
    assert np.isfinite(float(metrics["loss"]))
