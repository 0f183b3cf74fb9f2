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
    # every eligible detection is annotated: the fused window covers the
    # top-scoring rows, anything beyond it falls back to ONE host batch
    big = [d for d in result["detections"]
           if min(d["bbox"]["x2"] - d["bbox"]["x1"],
                  d["bbox"]["y2"] - d["bbox"]["y1"]) >= 2]
    assert big and all("species" in d for d in big)
    assert classifier.total_batches <= 1
    if len(big) > 3:                 # beyond the fused window (max_crops=3)
        assert classifier.total_batches == 1


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


def test_rows_to_detections_species_row_mapping():
    """Fused species results map to detections by the device-selected ROW
    INDEX, not by slot position (the device picks eligible rows by score)."""
    from telescope_cam_detection_tpu.runtime.program import rows_to_detections
    rows = np.full((4, 7), -1.0, np.float32)
    rows[0] = [0, 0, 5, 5, 0.9, 0.9, 2]      # higher-scoring, e.g. non-target
    rows[2] = [1, 1, 10, 10, 0.8, 0.8, 14]   # the classified bird row
    dets = rows_to_detections(
        rows,
        species_prob=np.asarray([[0.5, 0.3]], np.float32),
        species_id=np.asarray([[7, 3]], np.int32),
        species_row=np.asarray([2], np.int32),
        species_valid=np.asarray([True]))
    assert len(dets) == 2
    by_cls = {d["class_id"]: d for d in dets}
    ids, probs = by_cls[14]["species_raw"]
    assert ids == [7, 3]
    np.testing.assert_allclose(probs, [0.5, 0.3], rtol=1e-6)
    assert "species_raw" not in by_cls[2]
    # an invalid slot attaches nothing even with a row index present
    dets2 = rows_to_detections(
        rows,
        species_prob=np.asarray([[0.5, 0.3]], np.float32),
        species_id=np.asarray([[7, 3]], np.int32),
        species_row=np.asarray([0], np.int32),
        species_valid=np.asarray([False]))
    assert all("species_raw" not in d for d in dets2)


def test_fused_readback_maps_species_to_valid_rows(fused_program):
    prog, _, _ = fused_program
    prog.reset_gate_state()
    rows, aux = prog.detect_batch_gated(_frame(11)[None], lanes=[0])
    assert aux["species_row"].shape == (1, 3)
    assert aux["species_valid"].shape == (1, 3)
    valid_rows = {i for i in range(rows.shape[1]) if rows[0][i][5] >= 0}
    if not valid_rows:
        pytest.skip("random-init detector produced no rows")
    mapped = set()
    for c in range(3):
        if aux["species_valid"][0, c]:
            r = int(aux["species_row"][0, c])
            assert r in valid_rows          # every slot holds a REAL row
            assert r not in mapped          # and a DISTINCT one
            mapped.add(r)
    assert mapped, "no classification slot mapped to a valid row"
    # the selected rows are the top-scoring valid rows
    scores = {i: float(rows[0][i][4] * rows[0][i][5]) for i in valid_rows}
    top = sorted(scores, key=scores.get, reverse=True)[:len(mapped)]
    assert mapped == set(top)


@pytest.mark.slow  # builds two extra fused programs (~28s CPU compile)
def test_fused_class_mask_limits_slots(fused_program):
    """With classify_class_ids restricted, rows of other classes never take
    classification slots even when they outscore eligible rows."""
    prog, model, variables = fused_program
    prog.reset_gate_state()
    rows, _ = prog.detect_batch_gated(_frame(11)[None], lanes=[0])
    valid = rows[0][rows[0][:, 5] >= 0]
    classes = sorted({int(r[6]) for r in valid})
    if len(classes) < 2:
        pytest.skip("need two distinct predicted classes")
    target = classes[0]
    try:
        prog.attach_classifier(model, variables, input_size=S2_SIZE,
                               max_crops=3, crop_padding_percent=20,
                               classify_class_ids=[target])
        prog.reset_gate_state()
        rows2, aux2 = prog.detect_batch_gated(_frame(11)[None], lanes=[0])
        assert aux2["species_valid"][0].any()
        for c in range(3):
            if aux2["species_valid"][0, c]:
                r = int(aux2["species_row"][0, c])
                assert int(rows2[0][r][6]) == target
    finally:  # restore the module fixture's attachment
        prog.attach_classifier(model, variables, input_size=S2_SIZE,
                               max_crops=3, crop_padding_percent=20)


@pytest.mark.slow  # own classifier pipeline compile (~10s)
def test_use_fused_raw_false_ignores_device_results():
    """A camera whose Stage-2 settings diverge from the fused globals
    discards species_raw (popped, never on the wire) and classifies
    host-side with its own settings."""
    from telescope_cam_detection_tpu.models.eva02 import init_eva02
    from telescope_cam_detection_tpu.pipeline.species import SpeciesClassifier
    from telescope_cam_detection_tpu.pipeline.two_stage import (
        TwoStageDetectionPipeline)
    model, variables = init_eva02("eva02-tiny", N_CLASSES, S2_SIZE, seed=1)
    classifier = SpeciesClassifier(model_name="eva02-tiny",
                                   num_classes=N_CLASSES,
                                   input_size=S2_SIZE,
                                   confidence_threshold=0.0,
                                   use_hierarchical=False,
                                   variables=variables)
    classifier.taxonomy = {str(i): f"Species {i}" for i in range(N_CLASSES)}
    pipe = TwoStageDetectionPipeline(classifier, confidence_threshold=0.0,
                                     min_crop_size=2, use_fused_raw=False)
    pipe.classify_classes = {14: "bird"}
    det = {"class_id": 14, "class_name": "bird", "confidence": 0.9,
           "bbox": {"x1": 10, "y1": 10, "x2": 60, "y2": 60,
                    "width": 50, "height": 50, "area": 2500},
           "species_raw": ([3], [0.99])}
    out = pipe.process_detections(_frame(5), [det])
    assert "species_raw" not in out[0]
    assert classifier.total_batches == 1      # host classification ran
    assert "species" in out[0]


def test_system_fused_with_enhancement_runs_unfused(tmp_path):
    """Enhancement needs host pixel work before classification, so fused
    device results would be paid twice and superseded — the system must NOT
    attach the classifier to the program."""
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
          enhancement: {{enabled: true, method: clahe}}
          inat_classifier:
            model_name: eva02-tiny
            num_classes: {N_CLASSES}
            input_size: {S2_SIZE}
            taxonomy_file: {tax_path}
        web: {{host: 127.0.0.1, port: 18099}}
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
        assert sys_obj.program._stage2 is None
        pipe = sys_obj.engines["cam1"].two_stage_pipeline
        assert pipe is not None and pipe.enhancer is not None
    finally:
        sys_obj.stop()


def test_system_per_camera_stage2_override_disables_fused_raw(tmp_path):
    """A camera whose stage2_preprocessing diverges from the fused globals
    classifies host-side (use_fused_raw=False); matching cameras keep the
    fused path."""
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
          - id: cam2
            protocol: synthetic
            target_width: 96
            target_height: 96
            stage2_preprocessing: {{crop_padding_percent: 40}}
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
          preprocessing: {{crop_padding_percent: 20, min_crop_size: 8}}
          inat_classifier:
            model_name: eva02-tiny
            num_classes: {N_CLASSES}
            input_size: {S2_SIZE}
            taxonomy_file: {tax_path}
        web: {{host: 127.0.0.1, port: 18097}}
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
        # the device slot eligibility mirrors the host rules
        assert sys_obj.program._stage2["min_crop"] == 8
        assert sys_obj.program._stage2["class_mask"] is not None
        assert sys_obj.engines["cam1"].two_stage_pipeline.use_fused_raw
        assert not sys_obj.engines["cam2"].two_stage_pipeline.use_fused_raw
        assert (sys_obj.engines["cam2"].two_stage_pipeline
                .crop_padding_percent == 40)
    finally:
        sys_obj.stop()


@pytest.mark.slow
def test_fused_small_class_head_clamps_topk():
    """A fine-tuned classifier head with fewer classes than the default
    top-k window (10) must not crash the fused program (regression:
    lax.top_k(k=10) on 4 logits fails at trace time)."""
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, gates="device", gate_lanes=1,
                       gate_blur_size=5, gate_motion_blur_size=5, max_det=8)
    prog = DetectorProgram(spec, seed=0)
    prog.update_filters(FilterSettings(conf_threshold=0.0,
                                       wildlife_only=False))
    model, variables = init_eva02("eva02-tiny", 4, S2_SIZE, seed=1)
    prog.attach_classifier(model, variables, input_size=S2_SIZE, max_crops=2)
    rows, aux = prog.detect_batch_gated(_frame()[None], lanes=[0])
    assert aux["species_prob"].shape == (1, 2, 4)   # top-k clamped to 4
    assert aux["species_id"].shape == (1, 2, 4)


@pytest.mark.slow
def test_fused_int8_classifier_tracks_f32(fused_program):
    """attach_classifier with an int8-quantized EVA02 (the
    `inat_classifier.precision: int8` serving path) runs inside the fused
    dispatch and its species ranking tracks the f32 build of the SAME
    checkpoint (ops/quant.py is serving-time only)."""
    prog_f, _, variables = fused_program
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, gates="device", gate_lanes=2,
                       gate_blur_size=5, gate_motion_blur_size=5,
                       max_det=16)
    prog_q = DetectorProgram(spec, seed=0)
    prog_q.update_filters(FilterSettings(conf_threshold=0.0,
                                         wildlife_only=False))
    model_q = build_eva02("eva02-tiny", N_CLASSES, S2_SIZE, quant="int8")
    prog_q.attach_classifier(model_q, variables, input_size=S2_SIZE,
                             max_crops=3, crop_padding_percent=20)
    frame = _frame(3)
    prog_f.reset_gate_state()
    rows_f, aux_f = prog_f.detect_batch_gated(frame[None], lanes=[0])
    prog_q.reset_gate_state()
    rows_q, aux_q = prog_q.detect_batch_gated(frame[None], lanes=[0])
    # detector path identical (same seed/spec): same rows
    np.testing.assert_allclose(rows_f, rows_q, rtol=1e-5, atol=1e-5)
    if not (rows_f[0][:, 5] >= 0).any():
        pytest.skip("random-init detector produced no rows on this frame")
    # int8 classifier: same top-k id SET up to quantization-noise
    # reordering of near-ties, probabilities close
    ids_f = set(aux_f["species_id"][0, 0].tolist())
    ids_q = set(aux_q["species_id"][0, 0].tolist())
    assert len(ids_f & ids_q) >= 8  # >=8 of top-10 shared
    np.testing.assert_allclose(aux_q["species_prob"][0, 0].sum(),
                               aux_f["species_prob"][0, 0].sum(), atol=0.05)
