"""int8 (W8A8) Stage-1 detector path: checkpoint compatibility, accuracy
against the f32 forward, and the config wiring.

detection.precision: int8 routes every non-grouped conv through
models/common.QuantConv2D (weights per-output-channel, activations
per-tensor dynamic, int8xint8->int32 on the MXU) while BN, activations and
the head prediction convs stay float. Quantization is serving-time only —
the same float checkpoint serves fp32/bf16/int8 (the classifier's
ops/quant.py scheme, extended to convs). Reference analog: the TensorRT
FP16/INT8 engine option (reference tools/convert_yolox_to_tensorrt.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telescope_cam_detection_tpu.models import yolox as yolox_lib
from telescope_cam_detection_tpu.models.common import (
    INT8, ConvBnAct, QuantConv2D, compute_dtype)


def test_compute_dtype_sentinel():
    assert compute_dtype(INT8) == jnp.bfloat16
    assert compute_dtype(jnp.float32) == jnp.float32
    assert compute_dtype(jnp.bfloat16) == jnp.bfloat16


def test_quantconv_param_tree_matches_nn_conv():
    """The int8 build must load float checkpoints unchanged: same param
    names, shapes and float dtype as the nn.Conv it replaces."""
    x = jnp.zeros((1, 8, 8, 16), jnp.float32)
    v_f32 = ConvBnAct(32, 3, 1, dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x)
    v_int8 = ConvBnAct(32, 3, 1, dtype=INT8).init(jax.random.PRNGKey(0), x)
    flat_f = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_f32)
    flat_q = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_int8)
    assert jax.tree_util.tree_structure(flat_f) == \
        jax.tree_util.tree_structure(flat_q)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, flat_f, flat_q))


def test_quantconv_close_to_float_conv():
    """W8A8 error bound on a single conv: int8 symmetric quantization of
    both operands keeps the output within a small relative error of the
    float conv for well-scaled inputs."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16, 16, 24), jnp.float32)
    conv = ConvBnAct(32, 3, 1, use_bn=False, act="identity",
                     dtype=jnp.float32)
    variables = conv.init(jax.random.PRNGKey(2), x)
    ref = conv.apply(variables, x)
    qconv = ConvBnAct(32, 3, 1, use_bn=False, act="identity", dtype=INT8)
    out = qconv.apply(variables, x)
    denom = float(jnp.max(jnp.abs(ref)))
    rel = float(jnp.max(jnp.abs(out - ref))) / denom
    assert rel < 0.05, f"int8 conv relative error {rel:.4f}"


def test_quantconv_grouped_falls_back_to_float():
    """Depthwise convs (feature_group_count > 1) run the float fallback —
    same answer as the float conv to bf16 tolerance."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 16), jnp.float32)
    conv = ConvBnAct(16, 3, 1, groups=16, use_bn=False, act="identity",
                     dtype=jnp.float32)
    variables = conv.init(jax.random.PRNGKey(4), x)
    ref = conv.apply(variables, x)
    out = ConvBnAct(16, 3, 1, groups=16, use_bn=False, act="identity",
                    dtype=INT8).apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_int8_yolox_decode_agrees_with_f32():
    """Full yolox-tiny forward+decode: the int8 build must produce the
    same detection structure as f32 — top-anchor agreement and high
    correlation of objectness, using ONE float checkpoint for both."""
    model_f32, variables = yolox_lib.init_yolox(
        "yolox-tiny", num_classes=8, input_hw=(128, 128), seed=5)
    model_q = yolox_lib.build_yolox("yolox-tiny", num_classes=8, dtype=INT8)
    img = jax.random.uniform(jax.random.PRNGKey(6), (1, 128, 128, 3),
                             jnp.float32) * 255.0
    boxes_f, obj_f, cls_f = yolox_lib.decode_outputs(
        model_f32.apply(variables, img, train=False))
    boxes_q, obj_q, cls_q = yolox_lib.decode_outputs(
        model_q.apply(variables, img, train=False))
    assert boxes_q.shape == boxes_f.shape
    of, oq = np.asarray(obj_f[0]), np.asarray(obj_q[0])
    corr = np.corrcoef(of, oq)[0, 1]
    assert corr > 0.95, f"objectness correlation {corr:.4f}"
    # the strongest anchor must survive quantization into the top few
    assert int(np.argmax(of)) in np.argsort(oq)[-5:].tolist()
    # boxes at the top-f32 anchor within a few pixels at 128 px
    top = int(np.argmax(of))
    np.testing.assert_allclose(np.asarray(boxes_q[0, top]),
                               np.asarray(boxes_f[0, top]), atol=6.0)


def test_loader_validates_int8_precision():
    from telescope_cam_detection_tpu.config.loader import validate_config

    cams = [{"id": "cam1", "name": "A", "ip": "192.168.1.2",
             "protocol": "rtsp-tcp", "enabled": True}]
    base = {
        "cameras": cams,
        "detection": {"detector_type": "yolox", "precision": "int8"},
        "web": {"host": "0.0.0.0", "port": 8000},
    }
    assert validate_config(base) == []

    bad = {
        "cameras": cams,
        "detection": {"detector_type": "rtdetr", "precision": "int8"},
        "web": {"host": "0.0.0.0", "port": 8000},
    }
    errors = validate_config(bad)
    assert any("int8" in e for e in errors)


@pytest.mark.slow
def test_int8_program_rows_match_f32_structure():
    """DetectorProgram with param_dtype='int8': dispatch produces rows in
    capture coordinates with the same high-confidence detection as f32."""
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, ProgramSpec)

    spec = ProgramSpec(detector_type="yolox", variant="yolox-tiny",
                       input_hw=(128, 128), max_det=16, pre_nms_topk=64,
                       num_classes=8, transfer="host")
    prog_f = DetectorProgram(spec, seed=7, param_dtype=jnp.float32)
    prog_q = DetectorProgram(spec, seed=7, param_dtype="int8",
                             variables=prog_f.variables)
    frames = (np.random.RandomState(0)
              .randint(0, 255, (2, 128, 128, 3)).astype(np.uint8))
    rows_f = prog_f.detect_batch_rows(frames)
    rows_q = prog_q.detect_batch_rows(frames)
    assert rows_q.shape == rows_f.shape
