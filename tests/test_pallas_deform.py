"""Pallas deformable-attention kernel vs the XLA gather path (interpret mode
on CPU; same kernel compiles for TPU)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from telescope_cam_detection_tpu.models.rtdetr import ms_deformable_attention
from telescope_cam_detection_tpu.ops.pallas_deform import (
    deform_gather_matmul,
    ms_deformable_attention_pallas,
)


def test_gather_matmul_exact_small():
    rng = np.random.default_rng(0)
    bh, hw, hd, q, s = 2, 50, 8, 7, 6
    values = rng.normal(size=(bh, hw, hd)).astype(np.float32)
    idx = rng.integers(0, hw, size=(bh, q, s)).astype(np.int32)
    wgt = rng.uniform(0, 1, size=(bh, q, s)).astype(np.float32)
    got = np.asarray(deform_gather_matmul(values, idx, wgt, interpret=True))
    gathered = np.stack([values[b][idx[b]] for b in range(bh)])  # (bh,q,s,hd)
    want = np.einsum("bqs,bqsd->bqd", wgt, gathered)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gather_matmul_zero_weight_padding_rows():
    values = np.ones((1, 10, 4), np.float32)
    idx = np.zeros((1, 3, 2), np.int32)
    wgt = np.array([[[1.0, 0.5], [0.0, 0.0], [2.0, 0.0]]], np.float32)
    out = np.asarray(deform_gather_matmul(values, idx, wgt, interpret=True))
    np.testing.assert_allclose(out[0, 0], 1.5)
    np.testing.assert_allclose(out[0, 1], 0.0)
    np.testing.assert_allclose(out[0, 2], 2.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla_path(seed):
    rng = np.random.default_rng(seed)
    b, q, heads, hd, p = 2, 30, 4, 8, 4
    level_hw = [(12, 16), (6, 8), (3, 4)]
    values = [jnp.asarray(rng.normal(size=(b, h, w, heads, hd)),
                          jnp.float32) for h, w in level_hw]
    locs = jnp.asarray(rng.uniform(0.05, 0.95,
                                   size=(b, q, heads, len(level_hw), p, 2)),
                       jnp.float32)
    weights = rng.uniform(0, 1, size=(b, q, heads, len(level_hw), p))
    weights = weights / weights.sum(axis=(3, 4), keepdims=True)
    weights = jnp.asarray(weights, jnp.float32)

    want = np.asarray(ms_deformable_attention(values, locs, weights))
    got = np.asarray(ms_deformable_attention_pallas(values, locs, weights,
                                                    interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rtdetr_model_with_pallas_sampling():
    """Full RT-DETR forward with sampling_impl='pallas' (auto-interpret on
    CPU) matches the xla-sampling model on the same weights."""
    import jax
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.models.rtdetr import RTDETR

    kwargs = dict(num_classes=8, depths=(1, 1, 1, 1), decoder_layers=1,
                  num_queries=12)
    model_x = RTDETR(**kwargs, sampling_impl="xla")
    model_p = RTDETR(**kwargs, sampling_impl="pallas")
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)),
                    jnp.float32)
    variables = model_x.init(jax.random.PRNGKey(0), x, train=False)
    lx, bx = model_x.apply(variables, x, train=False)
    lp, bp = model_p.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bp), np.asarray(bx),
                               rtol=1e-4, atol=1e-4)
