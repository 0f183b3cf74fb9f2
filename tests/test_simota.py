"""SimOTA dynamic-k assignment (train/loss.py) + augmentations
(train/augment.py).

Upstream semantics being pinned (the reference gets these via ultralytics /
Megvii training code, training/scripts/train_custom_model.py:48-60):
dynamic k = clip(round(sum top-10 candidate IoUs), 1, 10); candidates from
the center prior; cost = cls BCE + 3*(-log iou) with non-center penalty;
conflicted anchors go to their lowest-cost GT; cls target is IoU-scaled.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from telescope_cam_detection_tpu.train.loss import (
    _anchor_geometry,
    _simota_single,
    yolox_loss,
)
from telescope_cam_detection_tpu.train.augment import (
    Augmenter,
    hflip,
    mixup,
    mosaic,
)

LEVEL_HW = [(8, 8), (4, 4), (2, 2)]   # 64x64 input, strides 8/16/32
A = sum(h * w for h, w in LEVEL_HW)


def _setup(gt_rows, pred_box_at=None, num_classes=4):
    """targets (G,5); boxes default zeros except exact-GT predictions at the
    anchors listed in pred_box_at {anchor_idx: gt_row}."""
    targets = jnp.asarray(np.array(gt_rows, np.float32))
    boxes = np.zeros((A, 4), np.float32)
    for aidx, row in (pred_box_at or {}).items():
        boxes[aidx] = gt_rows[row][:4]
    obj = np.zeros((A,), np.float32)
    cls = np.zeros((A, num_classes), np.float32)
    centers, strides = _anchor_geometry(LEVEL_HW)
    return targets, jnp.asarray(boxes), jnp.asarray(obj), jnp.asarray(cls), \
        centers, strides


def _in_box_anchors(box):
    centers, _ = _anchor_geometry(LEVEL_HW)
    c = np.asarray(centers)
    return np.flatnonzero((c[:, 0] >= box[0]) & (c[:, 0] <= box[2]) &
                          (c[:, 1] >= box[1]) & (c[:, 1] <= box[3]))


def test_dynamic_k_tracks_prediction_quality():
    gt = [[8, 8, 24, 24, 1], [-1, -1, -1, -1, -1]]
    inside = _in_box_anchors(gt[0])
    level0 = [i for i in inside if i < 64]
    assert len(level0) == 4
    # perfect predictions at the 4 in-box level-0 anchors -> k = 4
    t, b, o, c, centers, strides = _setup(
        gt, {int(i): 0 for i in level0})
    fg, box_t, cls_t = _simota_single(t, b, o, c, centers, strides, 4)
    fg = np.asarray(fg)
    assert fg.sum() == 4
    assert set(np.flatnonzero(fg)) == set(int(i) for i in level0)
    # matched boxes and IoU-scaled one-hot targets at the matches
    np.testing.assert_allclose(np.asarray(box_t)[level0],
                               np.tile(np.array(gt[0][:4]), (4, 1)))
    np.testing.assert_allclose(np.asarray(cls_t)[level0, 1], 1.0, atol=1e-6)
    # with NO good predictions k floors at 1 (never zero for a valid GT)
    t, b, o, c, centers, strides = _setup(gt)
    fg, _, _ = _simota_single(t, b, o, c, centers, strides, 4)
    assert np.asarray(fg).sum() == 1


def test_conflicting_gts_each_anchor_single_owner():
    gt = [[8, 8, 24, 24, 1], [8, 8, 24, 24, 2]]   # identical boxes
    inside = [i for i in _in_box_anchors(gt[0]) if i < 64]
    t, b, o, c, centers, strides = _setup(
        gt, {int(i): 0 for i in inside})
    fg, _, cls_t = _simota_single(t, b, o, c, centers, strides, 4)
    fg = np.asarray(fg)
    cls_t = np.asarray(cls_t)
    # every fg anchor belongs to exactly one class column
    assert fg.sum() > 0
    owners = (cls_t[fg > 0] > 0).sum(axis=-1)
    assert (owners == 1).all()


def test_invalid_gts_assign_nothing():
    gt = [[-1, -1, -1, -1, -1]] * 3
    t, b, o, c, centers, strides = _setup(gt)
    fg, box_t, cls_t = _simota_single(t, b, o, c, centers, strides, 4)
    assert np.asarray(fg).sum() == 0
    assert np.asarray(cls_t).sum() == 0


def _tiny_outputs(seed=0, batch=2, num_classes=4):
    rng = np.random.default_rng(seed)
    outs = []
    for h, w in LEVEL_HW:
        outs.append((jnp.asarray(rng.normal(0, 0.1, (batch, h, w, 4)),
                                 jnp.float32),
                     jnp.asarray(rng.normal(0, 0.1, (batch, h, w, 1)),
                                 jnp.float32),
                     jnp.asarray(rng.normal(0, 0.1, (batch, h, w,
                                                     num_classes)),
                                 jnp.float32)))
    return outs


@pytest.mark.parametrize("assigner", ["simota", "center"])
@pytest.mark.slow
def test_loss_jits_finite_and_differentiable(assigner):
    outs = _tiny_outputs()
    targets = np.full((2, 5, 5), -1.0, np.float32)
    targets[0, 0] = [8, 8, 30, 30, 1]
    targets[1, 0] = [16, 16, 48, 48, 2]
    targets = jnp.asarray(targets)

    def loss_of(outs):
        return yolox_loss(outs, targets, num_classes=4,
                          assigner=assigner)[0]

    loss, metrics = jax.jit(
        lambda o: yolox_loss(o, targets, num_classes=4, assigner=assigner)
    )(outs)
    assert np.isfinite(float(loss))
    assert float(metrics["num_pos"]) >= 2
    grads = jax.grad(loss_of)(outs)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_grads_finite_with_degenerate_zero_area_boxes():
    """Regression (yolox-s@640 step-0 all-NaN grads): a predicted box whose
    huge |cx| cancels its tiny wh to ZERO width in f32 meets a zero-area
    padding GT -> union == 0 -> 0/0 inside the IoU division, whose VJP
    poisons every upstream gradient even at loss weight 0. The safe-divide
    in _pairwise_iou_xyxy must keep gradients finite."""
    from telescope_cam_detection_tpu.train.loss import yolox_loss as _loss
    rng = np.random.default_rng(0)
    outs = []
    for li, (h, w) in enumerate(LEVEL_HW):
        reg = rng.normal(0, 0.1, (1, h, w, 4)).astype(np.float32)
        # engineer one anchor into the degenerate regime: center pushed
        # ~exp(reg_wh)/eps_f32 away, wh tiny -> x1 == x2 after f32 rounding
        reg[0, 0, 0] = [4e6, 4e6, -14.0, -14.0]
        outs.append((jnp.asarray(reg),
                     jnp.asarray(rng.normal(0, 0.1, (1, h, w, 1)),
                                 jnp.float32),
                     jnp.asarray(rng.normal(0, 0.1, (1, h, w, 4)),
                                 jnp.float32)))
    targets = np.full((1, 5, 5), -1.0, np.float32)   # row 0 real, rest pads
    targets[0, 0] = [8, 8, 30, 30, 1]
    targets = jnp.asarray(targets)

    # the degenerate anchor really has zero f32 area (guards the setup)
    from telescope_cam_detection_tpu.models.yolox import decode_outputs
    boxes, _, _ = decode_outputs(outs)
    areas = np.clip(np.asarray(boxes[0, :, 2] - boxes[0, :, 0]), 0, None) * \
        np.clip(np.asarray(boxes[0, :, 3] - boxes[0, :, 1]), 0, None)
    assert (areas == 0).any()

    grads = jax.grad(
        lambda o: _loss(o, targets, num_classes=4, assigner="simota")[0]
    )(outs)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


@pytest.mark.slow  # ~16s; dynamic-k behavior also covered by the quick test
def test_simota_assigns_more_anchors_than_center_when_preds_good():
    """The point of dynamic k: good predictions recruit more positives,
    densifying the training signal vs one-anchor-per-GT."""
    outs = _tiny_outputs()
    targets = np.full((2, 5, 5), -1.0, np.float32)
    targets[:, 0] = [8, 8, 40, 40, 1]
    targets = jnp.asarray(targets)
    _, m_center = yolox_loss(outs, targets, num_classes=4, assigner="center")
    _, m_simota = yolox_loss(outs, targets, num_classes=4, assigner="simota")
    assert float(m_simota["num_pos"]) >= float(m_center["num_pos"])


# ---------------------------------------------------------------------------
# augmentations
# ---------------------------------------------------------------------------

def _img_with_box(val, box, size=64):
    img = np.zeros((size, size, 3), np.uint8)
    x1, y1, x2, y2 = box
    img[y1:y2, x1:x2] = val
    tgt = np.full((6, 5), -1.0, np.float32)
    tgt[0] = [x1, y1, x2, y2, 1]
    return img, tgt


def test_hflip_boxes():
    img, tgt = _img_with_box(200, (8, 16, 24, 40))
    out, t = hflip(img, tgt)
    assert (out[16:40, 64 - 24:64 - 8] == 200).all()
    np.testing.assert_allclose(t[0, :4], [64 - 1 - 24, 16, 64 - 1 - 8, 40])
    assert t[1, 4] == -1


def test_mosaic_keeps_boxes_on_content():
    rng = np.random.default_rng(0)
    imgs, tgts = zip(*[_img_with_box(60 + 40 * i, (8, 8, 40, 40))
                       for i in range(4)])
    canvas, tgt = mosaic(list(imgs), list(tgts), rng)
    assert canvas.shape == imgs[0].shape
    valid = tgt[tgt[:, 4] >= 0]
    assert len(valid) >= 1
    for x1, y1, x2, y2, _ in valid:
        assert 0 <= x1 < x2 < 64 and 0 <= y1 < y2 < 64


def test_mixup_unions_targets():
    rng = np.random.default_rng(0)
    a, ta = _img_with_box(200, (4, 4, 20, 20))
    b, tb = _img_with_box(100, (30, 30, 60, 60))
    mixed, t = mixup(a, ta, b, tb, rng)
    assert mixed.shape == a.shape
    valid = t[t[:, 4] >= 0]
    assert len(valid) == 2


def test_augmenter_shapes_stable():
    rng = np.random.default_rng(1)
    imgs = np.stack([_img_with_box(100 + i, (8, 8, 32, 32))[0]
                     for i in range(4)])
    tgts = np.stack([_img_with_box(0, (8, 8, 32, 32))[1]
                     for _ in range(4)])
    aug = Augmenter(seed=3)
    out_i, out_t = aug(imgs, tgts)
    assert out_i.shape == imgs.shape and out_i.dtype == np.uint8
    assert out_t.shape == tgts.shape
    valid = out_t[out_t[:, :, 4] >= 0]
    assert len(valid) >= 1  # augmentation must not wipe out every target
    assert (valid[:, 2] > valid[:, 0]).all()
    assert (valid[:, 3] > valid[:, 1]).all()
