"""Rematerialization (jax.checkpoint) training option.

remat=True recomputes block activations in the backward pass instead of
storing them (bigger batches per chip); it must be a pure memory/FLOPs
trade — gradients equal to the non-remat path up to float reassociation,
and the serving forward / checkpoint tree unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _rel_close(a, b, rtol):
    # per-leaf max-abs diff, scaled by the leaf's own magnitude (remat
    # reassociates float reductions; tiny components differ in ulps)
    diffs = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x - y)) /
                           (jnp.max(jnp.abs(x)) + 1e-8)),
        a, b)
    worst = max(jax.tree.leaves(diffs))
    assert worst < rtol, f"max leaf-scaled grad diff {worst}"


@pytest.mark.slow
def test_yolox_remat_grads_match():
    from telescope_cam_detection_tpu.models.yolox import build_yolox

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (2, 64, 64, 3)),
                    jnp.float32)
    m0 = build_yolox("yolox-nano", 4)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    m1 = build_yolox("yolox-nano", 4, remat=True)

    def loss(m, p):
        outs, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                          x, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(a ** 2) + jnp.sum(b ** 2) + jnp.sum(c ** 2)
                   for a, b, c in outs)

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    _rel_close(g0, g1, 1e-4)


@pytest.mark.slow  # two eva02 grad compiles (~29s); tree test stays quick
def test_eva02_remat_grads_match():
    from telescope_cam_detection_tpu.models.eva02 import build_eva02

    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 28, 28, 3)),
                    jnp.float32)
    m0 = build_eva02("eva02-tiny", 5, 28)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    m1 = build_eva02("eva02-tiny", 5, 28, remat=True)

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, x, train=True) ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    # float reassociation from recompute: relative, not exact
    _rel_close(g0, g1, 1e-3)


def test_remat_param_tree_unchanged():
    from telescope_cam_detection_tpu.models.eva02 import build_eva02

    x = jnp.zeros((1, 28, 28, 3))
    v0 = build_eva02("eva02-tiny", 3, 28).init(jax.random.PRNGKey(0), x)
    v1 = build_eva02("eva02-tiny", 3, 28, remat=True).init(
        jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v0) ==
            jax.tree_util.tree_structure(v1))


@pytest.mark.slow
def test_rtdetr_remat_train_step_runs():
    """RT-DETR with remat trains one step (CDN mask + deep supervision
    through nn.remat'd decoder layers and backbone blocks)."""
    from telescope_cam_detection_tpu.train.trainer import build_training

    model, state, step = build_training(
        variant="rtdetrv2-r18vd", num_classes=2, input_hw=(128, 128),
        learning_rate=1e-4, seed=0, remat=True)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    targets = np.full((1, 2, 5), -1.0, np.float32)
    targets[0, 0] = [16, 16, 64, 64, 1]
    state, metrics = step(state, images, jnp.asarray(targets))
    assert np.isfinite(float(metrics["loss"]))
