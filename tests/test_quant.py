"""int8 (W8A8 dynamic) quantized matmul path: error bounds, nn.Dense
drop-in compatibility, EVA02 end-to-end closeness, and config plumbing.

The quantization scheme is serving-time only — the same f32 checkpoint
serves fp32/bf16/int8 builds (ops/quant.py docstring) — so every test
here loads ONE set of variables into both precisions and compares.
"""
import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from telescope_cam_detection_tpu.ops.quant import (
    QuantDense, int8_matmul, quantize_channels_int8, quantize_rows_int8)


def test_weight_quant_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.3, (64, 48)).astype(np.float32))
    w_q, s = quantize_channels_int8(w)
    assert w_q.dtype == jnp.int8
    err = np.abs(np.asarray(w) - np.asarray(w_q).astype(np.float32) * np.asarray(s))
    # symmetric round-to-nearest: error <= half a quantization step
    assert (err <= np.asarray(s) / 2 + 1e-6).all()


def test_row_quant_error_bound():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 2.0, (5, 7, 32)).astype(np.float32))
    x_q, s = quantize_rows_int8(x)
    assert x_q.shape == x.shape and s.shape == (5, 7, 1)
    err = np.abs(np.asarray(x) - np.asarray(x_q).astype(np.float32) * np.asarray(s))
    assert (err <= np.asarray(s) / 2 + 1e-6).all()


def test_int8_matmul_close_to_f32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1.0, (33, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (128, 96)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (96,)).astype(np.float32))
    exact = np.asarray(x @ w + b)
    quant = np.asarray(int8_matmul(x, w, b))
    rel = np.linalg.norm(exact - quant) / np.linalg.norm(exact)
    assert rel < 0.02, rel


def test_int8_matmul_batched_dims_and_dtype():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1.0, (2, 5, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (16, 8)).astype(np.float32))
    y = int8_matmul(x.astype(jnp.bfloat16), w)
    assert y.shape == (2, 5, 8)
    assert y.dtype == jnp.bfloat16


def test_quantdense_is_a_dense_drop_in():
    """Same param tree as nn.Dense; Dense-initialized params feed QuantDense."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1.0, (9, 40)).astype(np.float32))
    dense = nn.Dense(24)
    qdense = QuantDense(24)
    params = dense.init(jax.random.PRNGKey(0), x)
    qparams = qdense.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(qparams)
    assert all(p.shape == q.shape and p.dtype == q.dtype
               for p, q in zip(jax.tree_util.tree_leaves(params),
                               jax.tree_util.tree_leaves(qparams)))
    exact = np.asarray(dense.apply(params, x))
    quant = np.asarray(qdense.apply(params, x))
    rel = np.linalg.norm(exact - quant) / np.linalg.norm(exact)
    assert rel < 0.02, rel


def test_eva02_int8_matches_f32_checkpoint():
    """One checkpoint, two precisions: int8 logits track f32 logits."""
    from telescope_cam_detection_tpu.models.eva02 import (
        build_eva02, init_eva02)
    model_f, variables = init_eva02("eva02-tiny", num_classes=100,
                                    image_size=84, seed=0)
    model_q = build_eva02("eva02-tiny", num_classes=100, image_size=84,
                          quant="int8")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1.0, (2, 84, 84, 3)).astype(np.float32))
    lf = np.asarray(model_f.apply(variables, x, train=False))
    lq = np.asarray(model_q.apply(variables, x, train=False))
    cos = (lf * lq).sum(-1) / (np.linalg.norm(lf, axis=-1)
                               * np.linalg.norm(lq, axis=-1))
    assert (cos > 0.99).all(), cos
    # random-init logits are near-uniform, so exact top-1 can flip inside
    # quantization noise (a trained model's margin dwarfs it — see
    # tools/compare_classifier_precision.py for the trained-model gate);
    # here pin rank stability: the f32 winner stays in int8's top-5
    top5_q = np.argsort(lq, axis=-1)[:, -5:]
    winners = lf.argmax(-1)
    assert all(w in row for w, row in zip(winners, top5_q))


def test_eva02_rejects_unknown_quant():
    from telescope_cam_detection_tpu.models.eva02 import build_eva02
    with pytest.raises(ValueError, match="quant"):
        build_eva02("eva02-tiny", quant="int4")


def test_species_classifier_int8_smoke():
    """SpeciesClassifier(quant="int8") classifies a crop end to end."""
    from telescope_cam_detection_tpu.pipeline.species import SpeciesClassifier
    clf = SpeciesClassifier(model_name="eva02-tiny", num_classes=20,
                            input_size=84, confidence_threshold=0.0,
                            use_hierarchical=False, quant="int8")
    rng = np.random.default_rng(6)
    crop = rng.integers(0, 256, (56, 64, 3), dtype=np.uint8)
    results = clf.classify(crop, top_k=3)
    assert len(results) == 3
    assert all(0.0 <= r["confidence"] <= 1.0 for r in results)


def test_loader_validates_classifier_precision():
    from telescope_cam_detection_tpu.config.loader import validate_config

    def cfg(precision):
        return {
            "cameras": [{"name": "c0", "protocol": "synthetic",
                         "enabled": True}],
            "detection": {"detector_type": "yolox"},
            "species_classification": {
                "inat_classifier": {"precision": precision}},
        }

    assert not [e for e in validate_config(cfg("int8")) if "precision" in e]
    assert not [e for e in validate_config(cfg("bf16")) if "precision" in e]
    errors = validate_config(cfg("int4"))
    assert any("precision" in e for e in errors), errors


def test_loader_validates_detection_precision():
    from telescope_cam_detection_tpu.config.loader import validate_config
    cfg = {
        "cameras": [{"name": "c0", "protocol": "synthetic", "enabled": True}],
        "detection": {"detector_type": "yolox", "precision": "int8"},
    }
    # int8 W8A8 detector convs are implemented for YOLOX only
    # (models/common.QuantConv2D; tests/test_int8_detector.py)
    assert not [e for e in validate_config(cfg)
                if "detection.precision" in e]
    cfg["detection"]["detector_type"] = "rtdetr"
    errors = validate_config(cfg)
    assert any("detection.precision" in e for e in errors), errors
    cfg["detection"].update(detector_type="yolox", precision="bf16")
    assert not [e for e in validate_config(cfg)
                if "detection.precision" in e]
    cfg["detection"]["precision"] = "int4"
    assert any("detection.precision" in e
               for e in validate_config(cfg))
