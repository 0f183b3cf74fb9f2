"""Contrastive-denoising (CDN) training construction for RT-DETR.

Pins the DINO leak rules (matching queries NEVER see denoising queries —
verified by an exact output-invariance check), the contrastive noise
split (positives stay closer to their GT than negatives), and the known-
assignment denoising loss.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telescope_cam_detection_tpu.train.cdn import (
    build_cdn_queries, cdn_attention_mask)
from telescope_cam_detection_tpu.train.detr_loss import (
    _dn_layer_loss, cxcywh_to_xyxy, iou_xyxy)


def _targets():
    t = np.full((2, 3, 5), -1.0, np.float32)
    t[0, 0] = [16, 16, 64, 64, 1]
    t[0, 1] = [32, 48, 96, 120, 0]
    t[1, 0] = [8, 8, 120, 120, 2]
    return jnp.asarray(t)


def test_build_cdn_shapes_and_validity():
    meta = build_cdn_queries(jax.random.PRNGKey(0), _targets(), (128, 128),
                             num_classes=3, num_groups=2)
    d = 2 * 2 * 3
    assert meta["labels"].shape == (2, d)
    assert meta["boxes"].shape == (2, d, 4)
    # validity mirrors the GT padding per group slot
    v = np.asarray(meta["valid"])
    assert v[0].sum() == 2 * 4 and v[1].sum() == 1 * 4
    # padding-born queries embed as background id
    lb = np.asarray(meta["labels"])
    assert (lb[~v] == 3).all()
    # positives alternate pos-block/neg-block per group
    p = np.asarray(meta["positive"][0])
    assert p[:3].all() and not p[3:6].any() and p[6:9].all()


def test_cdn_noise_contrastive_split():
    # positives overlap their GT strictly more than negatives, on average
    meta = build_cdn_queries(jax.random.PRNGKey(1), _targets(), (128, 128),
                             num_classes=3, num_groups=4)
    gt_boxes = jnp.asarray([[0.3125, 0.3125, 0.375, 0.375],
                            [0.5, 0.65625, 0.5, 0.5625],
                            [0.0, 0.0, 0.0, 0.0]])  # normalized cxcywh img0
    q_gt = gt_boxes[np.asarray(meta["gt_idx"][0])]
    ious, _ = iou_xyxy(cxcywh_to_xyxy(meta["boxes"][0]), cxcywh_to_xyxy(q_gt))
    ious = np.asarray(ious)
    valid = np.asarray(meta["valid"][0])
    pos = np.asarray(meta["positive"][0]) & valid
    neg = ~np.asarray(meta["positive"][0]) & valid
    # upstream magnitudes: pos corners shift by U[0,1) x half-extent,
    # neg by U[1,2) — positives overlap clearly more on average
    assert ious[pos].mean() > ious[neg].mean() + 0.1
    assert ious[pos].mean() > 0.3


def test_cdn_attention_mask_rules():
    valid = jnp.asarray([[True, True, False, True]])  # D=4 (1 group, G=2)
    mask = cdn_attention_mask(1, 2, 3, valid)         # Q=3, T=7
    m = np.asarray(mask[0, 0])
    # match queries (rows 4..6) never attend dn columns (0..3)
    assert not m[4:, :4].any()
    # dn attends match
    assert m[:4, 4:].all()
    # nobody (except itself) attends the invalid dn col 2
    assert not m[[0, 1, 3, 4, 5, 6], 2].any() and m[2, 2]
    # match-match fully connected
    assert m[4:, 4:].all()


@pytest.mark.slow
def test_match_outputs_invariant_to_dn_presence():
    """The leak rule, end-to-end: adding dn queries must not change the
    matching queries' predictions at all."""
    from telescope_cam_detection_tpu.train.trainer import (
        build_training, rtdetr_query_count)

    model, state, _ = build_training(
        variant="rtdetrv2-r18vd", num_classes=3, input_hw=(96, 96), seed=0)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 96, 96, 3)), jnp.float32)
    targets = _targets()[:1]
    meta = build_cdn_queries(jax.random.PRNGKey(2), targets, (96, 96),
                             num_classes=3, num_groups=1)
    nq = rtdetr_query_count(model, (96, 96))
    dn = {"labels": meta["labels"], "boxes": meta["boxes"],
          "attn_mask": cdn_attention_mask(1, 3, nq, meta["valid"])}

    vars_ = {"params": state.params, "batch_stats": state.batch_stats}
    lg0, bx0, aux0 = model.apply(vars_, images, train=False, return_aux=True)
    lg1, bx1, aux1 = model.apply(vars_, images, train=False, return_aux=True,
                                 dn=dn)
    np.testing.assert_allclose(np.asarray(lg0), np.asarray(lg1),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(bx0), np.asarray(bx1),
                               rtol=2e-4, atol=2e-5)
    assert len(aux1["dn_layers"]) == model.decoder_layers
    assert aux0["dn_layers"] == ()


def test_dn_layer_loss_prefers_reconstruction():
    d, c = 4, 3
    gt_boxes = jnp.tile(jnp.asarray([[0.5, 0.5, 0.25, 0.25]]), (1, d, 1)).reshape(1, d, 4)
    gt_cls = jnp.ones((1, d), jnp.int32)
    pos = jnp.asarray([[True, True, False, False]])
    denom = jnp.float32(2.0)

    good_logits = jnp.full((1, d, c), -8.0).at[:, :2, 1].set(8.0)
    good, gl1, ggiou = _dn_layer_loss(good_logits, gt_boxes, gt_boxes,
                                      gt_cls, pos, denom)
    bad_boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.05, 0.05]]),
                         (1, d, 1)).reshape(1, d, 4)
    bad, bl1, bgiou = _dn_layer_loss(jnp.zeros((1, d, c)), bad_boxes,
                                     gt_boxes, gt_cls, pos, denom)
    assert float(gl1) == pytest.approx(0.0, abs=1e-6)
    assert float(ggiou) == pytest.approx(0.0, abs=1e-5)
    assert float(good) < float(bad) and float(bl1) > 0 and float(bgiou) > 0
