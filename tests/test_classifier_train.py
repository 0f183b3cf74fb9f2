"""EVA02 fine-tuning: loss/recipe semantics and learning smoke.

The reference's Stage-2 classifier is a frozen timm checkpoint
(reference src/species_classifier.py:235-270); these tests pin the
framework's fine-tuning path (train/classifier.py): mixup, label
smoothing, layer-wise LR decay, head re-init from pretrained trunks, and
a jitted step that actually learns.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telescope_cam_detection_tpu.train.classifier import (
    build_classifier_training, classifier_loss, layer_lr_multipliers, mixup)
from telescope_cam_detection_tpu.train.data import (
    SyntheticClassificationDataset)


def test_classifier_loss_prefers_correct_logits():
    labels = jnp.eye(4)[jnp.asarray([0, 1, 2, 3])]
    good = 8.0 * labels
    bad = 8.0 * labels[::-1]
    assert float(classifier_loss(good, labels)) < float(classifier_loss(bad, labels))


def test_label_smoothing_floors_loss():
    labels = jnp.eye(2)[jnp.asarray([0, 1])]
    logits = 50.0 * labels
    no_smooth = float(classifier_loss(logits, labels, label_smoothing=0.0))
    smooth = float(classifier_loss(logits, labels, label_smoothing=0.1))
    assert no_smooth == pytest.approx(0.0, abs=1e-4)
    assert smooth > no_smooth


def test_mixup_mixes_pixels_and_targets():
    rng = jax.random.PRNGKey(3)
    x = jnp.stack([jnp.zeros((4, 4, 3)), jnp.ones((4, 4, 3))])
    y = jnp.eye(2)
    mx, my = mixup(rng, x, y)
    lam = float(mx[0].mean())           # 0*lam + 1*(1-lam)
    assert 0.0 <= lam <= 1.0
    # targets mixed with the same lambda
    assert float(my[0, 1]) == pytest.approx(lam, abs=1e-5)
    assert float(my.sum()) == pytest.approx(2.0, abs=1e-5)


def test_layer_lr_multipliers_monotonic():
    params = {"patch_embed": {"kernel": jnp.zeros((1,))},
              "block0": {"w": jnp.zeros((1,))},
              "block5": {"w": jnp.zeros((1,))},
              "head": {"kernel": jnp.zeros((1,))}}
    mults = layer_lr_multipliers(params, depth=6, layer_decay=0.75)
    m_embed = float(mults["patch_embed"]["kernel"])
    m_b0 = float(mults["block0"]["w"])
    m_b5 = float(mults["block5"]["w"])
    m_head = float(mults["head"]["kernel"])
    assert m_embed < m_b0 < m_b5 < m_head == 1.0


@pytest.mark.slow
def test_head_reinit_on_class_count_change():
    # pretrained trunk with a 7-class head seeds a 3-class fine-tune:
    # trunk transfers, head re-initializes at the new width
    _, pre_state, _ = build_classifier_training(
        model_name="eva02-tiny", num_classes=7, image_size=28,
        use_mixup=False, seed=0)
    model, state, _ = build_classifier_training(
        model_name="eva02-tiny", num_classes=3, image_size=28,
        init_variables={"params": jax.device_get(pre_state.params)}, seed=1)
    assert state.params["head"]["kernel"].shape[-1] == 3
    np.testing.assert_allclose(
        np.asarray(state.params["block0"]["q_proj"]["kernel"]),
        np.asarray(pre_state.params["block0"]["q_proj"]["kernel"]))


@pytest.mark.slow
def test_classifier_train_step_learns():
    ds = SyntheticClassificationDataset(n=32, image_size=28, num_classes=3)
    model, state, step = build_classifier_training(
        model_name="eva02-tiny", num_classes=3, image_size=28,
        learning_rate=3e-4, use_mixup=False, label_smoothing=0.0, seed=0)
    rng = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(6):
        for imgs, labels in ds.batches(8, seed=epoch):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, jnp.asarray(imgs),
                                  jnp.asarray(labels), sub)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.7, losses


@pytest.mark.slow
def test_classifier_sharded_step(jax_devices):
    from telescope_cam_detection_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.create_mesh(8, model_parallel=2)
    model, state, step = build_classifier_training(
        model_name="eva02-tiny", num_classes=2, image_size=28,
        learning_rate=1e-4, mesh=mesh, ema_decay=0.999, seed=0)
    imgs = jnp.zeros((4, 28, 28, 3), jnp.uint8)
    labels = jnp.eye(2)[jnp.asarray([0, 1, 0, 1])]
    state, metrics = step(state, imgs, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert state.serving_params() is not None
