"""Fused Stage-2 (DetectorProgram.attach_classifier): the species
classifier runs INSIDE the gated detector dispatch — one packed readback
carries rows + gate aux + per-crop top-k species; lax.cond skips the
classifier compute on empty frames. The reference pays a second full
host->device round trip per detection-bearing frame
(two_stage_pipeline_yolox.py:475-481)."""
import queue
import time

import numpy as np
import pytest

from telescope_cam_detection_tpu.models.eva02 import build_eva02, init_eva02
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram,
    FilterSettings,
    ProgramSpec,
)

HW = (96, 96)
S2_SIZE = 56
N_CLASSES = 16


@pytest.fixture(scope="module")
def fused_program():
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, gates="device", gate_lanes=2,
                       gate_blur_size=5, gate_motion_blur_size=5,
                       max_det=16)
    prog = DetectorProgram(spec, seed=0)
    prog.update_filters(FilterSettings(conf_threshold=0.0,
                                       wildlife_only=False))
    model, variables = init_eva02("eva02-tiny", N_CLASSES, S2_SIZE, seed=1)
    prog.attach_classifier(model, variables, input_size=S2_SIZE,
                           max_crops=3, crop_padding_percent=20)
    return prog, model, variables


def _frame(seed=0):
    rng = np.random.default_rng(seed)
    f = rng.integers(40, 90, (*HW, 3), np.uint8)
    f[20:60, 30:70] = 220
    return f


def test_requires_device_gates():
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, max_det=8)
    prog = DetectorProgram(spec, seed=0)
    with pytest.raises(ValueError, match="gates"):
        prog.attach_classifier(object(), {}, input_size=S2_SIZE)


def test_fused_dispatch_returns_species(fused_program):
    prog, _, _ = fused_program
    prog.reset_gate_state()
    rows, aux = prog.detect_batch_gated(_frame()[None], lanes=[0])
    assert aux["species_prob"].shape == (1, 3, 10)
    assert aux["species_id"].shape == (1, 3, 10)
    # probabilities are a descending top-k of a softmax
    p = aux["species_prob"][0, 0]
    assert (np.diff(p) <= 1e-6).all()
    assert 0.0 <= p[0] <= 1.0
    # gate aux still intact alongside
    assert "motion_area" in aux and "motion_ratio" in aux


def test_fused_species_matches_classify_boxes_device(fused_program):
    """The fused classifier output for a detection equals
    SpeciesClassifier.classify_boxes_device's raw top-k on the SAME padded
    box (identical crop/preprocess/model math)."""
    import jax
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.ops.crops import (
        boxes_with_padding, sample_crops)
    from telescope_cam_detection_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
    prog, model, variables = fused_program
    prog.reset_gate_state()
    frame = _frame(3)
    rows, aux = prog.detect_batch_gated(frame[None], lanes=[0])
    valid = rows[0][rows[0][:, 5] >= 0]
    if not len(valid):
        pytest.skip("random-init detector produced no rows on this frame")
    row = valid[0]
    bbox = {"x1": row[0], "y1": row[1], "x2": row[2], "y2": row[3]}
    boxes = boxes_with_padding(HW, [bbox], [0], 20, 1)
    crops = sample_crops(jnp.asarray(frame[None]), jnp.asarray(boxes),
                         (S2_SIZE, S2_SIZE))
    x = crops[..., ::-1] * (1.0 / 255.0)
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    logits = model.apply(variables, x, train=False)
    probs = jax.nn.softmax(np.asarray(logits, np.float32), axis=-1)
    top_p, top_i = jax.lax.top_k(jnp.asarray(probs), 10)
    np.testing.assert_allclose(aux["species_prob"][0, 0],
                               np.asarray(top_p)[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(aux["species_id"][0, 0],
                                  np.asarray(top_i)[0])


def test_engine_two_stage_fused_flow(fused_program):
    """Engine + TwoStageDetectionPipeline: detections gain species fields
    from the fused dispatch; species_raw never reaches the result dict."""
    from telescope_cam_detection_tpu.pipeline.species import SpeciesClassifier
    from telescope_cam_detection_tpu.pipeline.two_stage import (
        TwoStageDetectionPipeline)
    from telescope_cam_detection_tpu.runtime.engine import InferenceEngine
    prog, model, variables = fused_program
    prog.reset_gate_state()
    tax = {str(i): f"Species {i}" for i in range(N_CLASSES)}
    classifier = SpeciesClassifier(model_name="eva02-tiny",
                                   num_classes=N_CLASSES,
                                   input_size=S2_SIZE,
                                   confidence_threshold=0.0,
                                   use_hierarchical=False,
                                   variables=variables)
    classifier.taxonomy = tax
    pipe = TwoStageDetectionPipeline(classifier, confidence_threshold=0.0,
                                     min_crop_size=2)
    pipe.classify_classes = {i: "any" for i in range(80)}
    out_q = queue.Queue(10)
    engine = InferenceEngine(
        queue.Queue(2), out_q, camera_id="fused", program=prog,
        detection_config={"conf_threshold": 0.0, "wildlife_only": False},
        two_stage_pipeline=pipe)
    engine._handle_frame({"frame": _frame(5), "frame_id": 0,
                          "timestamp": time.time()})
    result = out_q.get_nowait()
    assert result["detections"], "no detections from random-init"
    classified = [d for d in result["detections"] if "species" in d]
    assert classified, "no detection carried fused species info"
    for d in result["detections"]:
        assert "species_raw" not in d       # transport field popped
    assert classifier.total_classified > 0
    # classifier.classify was never dispatched separately
    assert classifier.total_batches == 0


def test_system_wiring_fused(tmp_path):
    import json
    import textwrap
    from telescope_cam_detection_tpu.system import TelescopeDetectionSystem
    tax_path = tmp_path / "tax.json"
    tax_path.write_text(json.dumps(
        {str(i): f"S{i}" for i in range(N_CLASSES)}))
    cfg = textwrap.dedent(f"""
        cameras:
          - id: cam1
            protocol: synthetic
            target_width: 96
            target_height: 96
        detection:
          detector_type: yolox
          yolox: {{model_name: yolox-nano}}
          input_size: [96, 96]
          gates: device
          use_two_stage: true
          batching: {{enabled: false}}
        species_classification:
          enabled: true
          fused: true
          fused_max_crops: 2
          inat_classifier:
            model_name: eva02-tiny
            num_classes: {N_CLASSES}
            input_size: {S2_SIZE}
            taxonomy_file: {tax_path}
        web: {{host: 127.0.0.1, port: 18098}}
        camera_health: {{enabled: false}}
        snapshots: {{enabled: false}}
    """)
    path = tmp_path / "config.yaml"
    path.write_text(cfg)
    sys_obj = TelescopeDetectionSystem(str(path), load_weights=False)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    try:
        assert sys_obj.program._stage2 is not None
        assert sys_obj.program._stage2["max_crops"] == 2
    finally:
        sys_obj.stop()


def test_fused_skips_classifier_on_empty(fused_program):
    """No valid rows -> the lax.cond skip branch yields zero species (and
    on hardware skips the classifier compute entirely)."""
    from telescope_cam_detection_tpu.runtime.program import FilterSettings
    prog, _, _ = fused_program
    prog.reset_gate_state()
    prog.update_filters(FilterSettings(conf_threshold=1.1,
                                       wildlife_only=False))
    try:
        rows, aux = prog.detect_batch_gated(_frame(7)[None], lanes=[1])
        assert (rows[..., 5] < 0).all()
        assert (aux["species_prob"] == 0).all()
        assert (aux["species_id"] == 0).all()
    finally:
        prog.update_filters(FilterSettings(conf_threshold=0.0,
                                           wildlife_only=False))
