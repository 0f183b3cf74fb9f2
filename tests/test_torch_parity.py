"""Cross-framework parity: Flax YOLOX vs an independent torch execution.

The north star requires bbox parity IoU>=0.99 vs the torch reference
(reference decode semantics: src/yolox_detector.py:222-314). Real Megvii
weights are unreachable (zero-egress), so this harness proves parity modulo
weights: the SAME converter-exported state dict runs through (a) our Flax
model + jitted decode + batched NMS and (b) a from-scratch torch mirror
(tools/torch_yolox.py) + torch decode + the numpy greedy NMS, and every
stage must agree — preprocess/BN/conv/decode divergence fails here.

Weights are sharpened after init (obj bias down, pred kernels scaled up) so
score distributions look like a trained detector (saturated sigmoids, sparse
positives) instead of everything hovering at 0.25 — the regime where NMS
selection order actually gets exercised (VERDICT round-1 weak point 5).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from telescope_cam_detection_tpu.models.convert import (  # noqa: E402
    export_yolox_to_torch_names,
)
from telescope_cam_detection_tpu.models.yolox import (  # noqa: E402
    decode_outputs,
    init_yolox,
)
from telescope_cam_detection_tpu.ops.nms import (  # noqa: E402
    batched_nms,
    nms_reference_numpy,
)
from telescope_cam_detection_tpu.utils.frames import (  # noqa: E402
    SyntheticFrameSource,
)
from tools.torch_yolox import TorchYOLOX, forward_numpy  # noqa: E402


def _sharpen(variables, seed=0):
    """Shared bench/test weight sharpening (models/convert.py) — spreads
    pred-head logits so random init yields trained-like score spreads."""
    from telescope_cam_detection_tpu.models.convert import (
        sharpen_random_variables)
    return sharpen_random_variables(variables, seed)


def _frames(n, hw, seed=0):
    src = SyntheticFrameSource(width=hw[1], height=hw[0], seed=seed)
    return np.stack([src.frame_at(i) for i in range(n)]).astype(np.float32)


@pytest.fixture(scope="module", params=[
    "yolox-nano",
    # same code path at different depth/width multipliers; the -s compile
    # costs ~26s on this host, so it rides the slow tier
    pytest.param("yolox-s", marks=pytest.mark.slow),
])
def both_models(request):
    variant = request.param
    _, variables = init_yolox(variant, num_classes=80, input_hw=(256, 256),
                              seed=3)
    variables = _sharpen(variables)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_yolox_to_torch_names(variables).items()}
    tm = TorchYOLOX(variant)
    # strict load: any naming/shape drift in the converter fails loudly here
    missing, unexpected = tm.load_state_dict(state, strict=False)
    # num_batches_tracked buffers exist only on the torch side
    assert not unexpected, unexpected
    real_missing = [m for m in missing if "num_batches_tracked" not in m]
    assert not real_missing, real_missing
    return variant, variables, tm


def _flax_decode(variant, variables, frames):
    from telescope_cam_detection_tpu.models.yolox import build_yolox
    model = build_yolox(variant, 80)
    outs = model.apply(variables, jnp.asarray(frames), train=False)
    boxes, obj, cls = decode_outputs(outs)
    return np.asarray(boxes), np.asarray(obj), np.asarray(cls)


def test_decode_parity(both_models):
    """Raw decoded (boxes, obj, cls) agree between frameworks."""
    variant, variables, tm = both_models
    frames = _frames(2, (256, 256))
    fb, fo, fc = _flax_decode(variant, variables, frames)
    tb, to, tc = forward_numpy(tm, frames)
    # boxes are in pixel units (0..256); conv stacks accumulate float error
    np.testing.assert_allclose(fb, tb, atol=0.35, rtol=1e-3)
    np.testing.assert_allclose(fo, to, atol=5e-3)
    np.testing.assert_allclose(fc, tc, atol=5e-3)


def test_end_to_end_nms_parity_iou99(both_models):
    """Full path: detections from both frameworks match 1:1 with IoU>=0.99,
    identical classes, and tight score agreement — the north-star gate."""
    variant, variables, tm = both_models
    frames = _frames(2, (256, 256), seed=1)
    conf, iou_thr, max_det = 0.30, 0.45, 50

    fb, fo, fc = _flax_decode(variant, variables, frames)
    flax_rows = np.asarray(batched_nms(
        jnp.asarray(fb), jnp.asarray(fo), jnp.asarray(fc),
        conf_threshold=conf, iou_threshold=iou_thr, max_det=max_det,
        pre_nms_topk=256))

    tb, to, tc = forward_numpy(tm, frames)

    def match(det, others):
        """Best IoU partner of det among others; (iou, row)."""
        a = det[:4]
        ob = others[:, :4]
        lt = np.maximum(a[None, :2], ob[:, :2])
        rb = np.minimum(a[None, 2:4], ob[:, 2:4])
        inter = np.prod(np.clip(rb - lt, 0, None), axis=-1)
        area = (np.prod(a[2:4] - a[:2]) +
                np.prod(ob[:, 2:4] - ob[:, :2], axis=-1) - inter)
        iou = np.where(area > 0, inter / np.maximum(area, 1e-9), 0.0)
        j = int(np.argmax(iou))
        return float(iou[j]), others[j]

    # scores exactly at the confidence threshold legitimately flip inclusion
    # between frameworks (5e-3 float drift); parity is asserted for every
    # detection comfortably above threshold, in BOTH directions
    margin = 0.01
    matched = 0
    for i in range(len(frames)):
        torch_rows = nms_reference_numpy(
            tb[i], to[i], tc[i], conf_threshold=conf,
            iou_threshold=iou_thr, max_det=max_det)
        ours = flax_rows[i][flax_rows[i][:, 5] >= 0]
        assert len(ours) and len(torch_rows), "no detections fired"
        n_conf_ours = (ours[:, 4] * ours[:, 5] >= conf + margin).sum()
        n_conf_torch = (torch_rows[:, 4] * torch_rows[:, 5]
                        >= conf + margin).sum()
        assert abs(int(n_conf_ours) - int(n_conf_torch)) == 0, (
            f"frame {i}: {n_conf_ours} vs torch {n_conf_torch} confident dets")
        for src_rows, dst_rows in ((ours, torch_rows), (torch_rows, ours)):
            for row in src_rows:
                if row[4] * row[5] < conf + margin:
                    continue
                iou, partner = match(row, dst_rows)
                assert iou >= 0.99, f"IoU {iou:.4f} below parity gate"
                assert int(row[6]) == int(partner[6]), "class mismatch"
                assert abs(row[4] * row[5] -
                           partner[4] * partner[5]) < 5e-3
                matched += 1
    assert matched > 0, "no confident detections — sharpening failed"


def test_converter_strict_name_coverage(both_models):
    """Every torch-side parameter/buffer (minus num_batches_tracked) is
    covered by the converter export — no silent orphans either way."""
    variant, variables, tm = both_models
    exported = set(export_yolox_to_torch_names(variables))
    torch_names = {k for k, _ in tm.state_dict().items()
                   if "num_batches_tracked" not in k}
    assert exported == torch_names, (
        exported.symmetric_difference(torch_names))


def test_eva02_stage2_parity_vs_torch_mirror():
    """Stage-2 cross-framework parity: the same Flax EVA02 params through
    (a) the jitted Flax model and (b) the from-scratch torch mirror
    (tools/torch_eva02.py) must produce matching logits and identical
    top-1/top-5 class rankings — patch embed, RoPE, attention, sub-LN,
    SwiGLU divergence all fail here. Reference path: timm EVA02 wrapped by
    species_classifier.py:235-353."""
    import jax
    from telescope_cam_detection_tpu.models.eva02 import init_eva02
    from tools.torch_eva02 import torch_eva02_forward

    image_size = 112  # 8x8 patch grid: fast but exercises the 2D rope fully
    model, variables = init_eva02("eva02-tiny", num_classes=64,
                                  image_size=image_size, seed=3)
    rng = np.random.default_rng(0)
    # normalized-crop regime (species.py feeds (x/255 - mean)/std)
    images = rng.normal(0.0, 1.0, (3, image_size, image_size, 3)) \
        .astype(np.float32)

    flax_logits = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables,
                                                     jnp.asarray(images)))
    torch_logits = torch_eva02_forward(variables["params"], images,
                                       variant="eva02-tiny",
                                       image_size=image_size)
    assert flax_logits.shape == torch_logits.shape == (3, 64)
    np.testing.assert_allclose(flax_logits, torch_logits,
                               rtol=2e-4, atol=2e-4)
    # ranking-level agreement (what Stage-2 consumes)
    assert (flax_logits.argmax(-1) == torch_logits.argmax(-1)).all()
    top5_f = np.argsort(-flax_logits, -1)[:, :5]
    top5_t = np.argsort(-torch_logits, -1)[:, :5]
    np.testing.assert_array_equal(top5_f, top5_t)


@pytest.mark.slow
def test_rtdetr_parity_vs_torch_mirror():
    """RT-DETR cross-framework parity: same Flax variables through the
    jitted Flax model and the from-scratch torch mirror
    (tools/torch_rtdetr.py) — backbone BN, AIFI positions, CCFF fusion,
    deformable sampling, decoder refinement, and the NMS-free top-k rows
    must all agree (reference drives torch RT-DETR via
    src/rtdetr_detector.py:26-425)."""
    import jax
    from telescope_cam_detection_tpu.models.rtdetr import RTDETR
    from tools.torch_rtdetr import (torch_rtdetr_forward,
                                    torch_rtdetr_predict_rows)

    num_q, num_c = 60, 12
    model = RTDETR(num_classes=num_c, depths=(2, 2, 2, 2), bottleneck=False,
                   decoder_layers=3, num_queries=num_q, sampling_impl="xla")
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 256, 256, 3)), train=False)
    rng = np.random.default_rng(1)
    images = rng.uniform(0.0, 1.0, (2, 256, 256, 3)).astype(np.float32)

    flax_logits, flax_boxes = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables,
                                                     jnp.asarray(images))
    flax_logits = np.asarray(flax_logits)
    flax_boxes = np.asarray(flax_boxes)
    t_logits, t_boxes = torch_rtdetr_forward(
        variables, images, variant="rtdetrv2-r18vd", num_classes=num_c,
        num_queries=num_q)
    assert flax_logits.shape == t_logits.shape == (2, num_q, num_c)
    np.testing.assert_allclose(flax_boxes, t_boxes, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(flax_logits, t_logits, rtol=1e-3, atol=5e-3)

    # full deploy path: predict() rows vs the mirror's rows
    flax_rows = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False,
                                 method=model.predict))(variables,
                                                        jnp.asarray(images)))
    t_rows = torch_rtdetr_predict_rows(
        variables, images, variant="rtdetrv2-r18vd", num_classes=num_c,
        num_queries=num_q)
    # IoU >= 0.99 + same class on the top-10 confident rows of each frame
    for i in range(2):
        for j in range(10):
            fa, ta = flax_rows[i, j], t_rows[i, j]
            assert int(fa[6]) == int(ta[6]), (i, j, fa, ta)
            xx1, yy1 = max(fa[0], ta[0]), max(fa[1], ta[1])
            xx2, yy2 = min(fa[2], ta[2]), min(fa[3], ta[3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (fa[2] - fa[0]) * (fa[3] - fa[1])
            a2 = (ta[2] - ta[0]) * (ta[3] - ta[1])
            iou = inter / max(a1 + a2 - inter, 1e-9)
            assert iou >= 0.99, (i, j, iou, fa, ta)
            assert abs(fa[5] - ta[5]) < 1e-3
