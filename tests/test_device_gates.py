"""Fused device gates (ProgramSpec.gates='device', SURVEY §7): the
empty-frame diff gate and the MOG2 background model run INSIDE the detector
program with per-lane HBM state; one dispatch returns (rows, gate aux) and
the host only applies thresholds.

Parity contract: gate DECISIONS match the host-side filters (which share the
same ops/motion.py math) on identical frame sequences.
"""
import queue
import time

import numpy as np
import pytest

from telescope_cam_detection_tpu.ops import motion as motion_ops
from telescope_cam_detection_tpu.pipeline.filters import (
    DeviceEmptyFrameGate,
    EmptyFrameFilter,
    MotionFilter,
)
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram,
    FilterSettings,
    ProgramSpec,
    rows_to_detections,
)

HW = (96, 96)


def _clip(n=10, moving_from=3, seed=0):
    """Static background; a bright square moves from frame `moving_from`."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(40, 90, (*HW, 3), np.uint8)
    frames = []
    for i in range(n):
        f = bg.copy()
        if i >= moving_from:
            x = 8 + 6 * (i - moving_from)
            f[20:48, x:x + 28] = 230
        frames.append(f)
    return frames


@pytest.fixture(scope="module")
def gated_program():
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, gates="device", gate_lanes=3,
                       gate_blur_size=5, gate_motion_blur_size=5,
                       max_det=16)
    prog = DetectorProgram(spec, seed=0)
    prog.update_filters(FilterSettings(conf_threshold=0.0,
                                       wildlife_only=False))
    prog.update_gate_params(empty_threshold=25, var_threshold=16,
                            learning_rate=1.0 / 50, detect_shadows=True)
    return prog


def test_empty_gate_decision_parity(gated_program):
    """Device empty-gate area -> threshold decisions == host XLA gate."""
    prog = gated_program
    prog.reset_gate_state()
    host = EmptyFrameFilter(min_motion_area=200, blur_size=5, threshold=25,
                            backend="xla")
    gate = DeviceEmptyFrameGate(min_motion_area=200)
    for f in _clip():
        _, aux = prog.detect_batch_gated(f[None], lanes=[0])
        dev = gate.decide(float(aux["motion_area"][0]),
                          bool(aux["initialized"][0]))
        assert dev == host.has_motion(f)
    assert gate.frames_skipped > 0          # static frames were gated
    assert gate.frames_processed == len(_clip())


@pytest.mark.slow
def test_motion_filter_decision_parity():
    """Per-detection MOG2 pass/fail: the fused gate_step's per-box stats
    (the exact code the gated program embeds) vs the host XLA MotionFilter
    on the same clip with the same thresholds."""
    import jax.numpy as jnp
    host = MotionFilter(backend="xla", history=50, var_threshold=16,
                        motion_blur_size=5, min_motion_ratio=0.05,
                        min_motion_pixels=10)
    consumer = MotionFilter(backend="program", history=50, var_threshold=16,
                            motion_blur_size=5, min_motion_ratio=0.05,
                            min_motion_pixels=10)
    # two fixed probe boxes: one over the moving square's path, one static
    probes = [{"class_id": 14, "class_name": "bird", "confidence": 0.9,
               "bbox": {"x1": 8.0, "y1": 20.0, "x2": 60.0, "y2": 48.0}},
              {"class_id": 14, "class_name": "bird", "confidence": 0.9,
               "bbox": {"x1": 70.0, "y1": 70.0, "x2": 90.0, "y2": 90.0}}]
    boxes = jnp.asarray([[d["bbox"]["x1"], d["bbox"]["y1"],
                          d["bbox"]["x2"], d["bbox"]["y2"]]
                         for d in probes])[None]
    state = motion_ops.init_gate_state(HW, 1)
    params = jnp.asarray([25.0, 16.0, 1.0 / 50, 0.5, 1.0], jnp.float32)
    decisions_match = 0
    clip = _clip(n=12)
    for f in clip:
        state, g = motion_ops.gate_step(state, jnp.asarray(f[None]),
                                        jnp.asarray([0], jnp.int32), params,
                                        blur_size=5, motion_blur_size=5)
        ratios, pixels = motion_ops.batch_bbox_motion_stats(g["masks"], boxes)
        dev_pass = [
            len(consumer.filter_detections(
                f, [dict(p, motion_ratio=float(ratios[0][i]),
                         motion_pixels=float(pixels[0][i]))])) == 1
            for i, p in enumerate(probes)]
        host_out = host.filter_detections(f, [dict(d) for d in probes])
        host_pass = [any(abs(d["bbox"]["x1"] - p["bbox"]["x1"]) < 1e-6
                         for d in host_out) for p in probes]
        if dev_pass == host_pass:
            decisions_match += 1
    # identical math and state trajectory -> identical decisions
    assert decisions_match == len(clip)


@pytest.mark.slow
def test_lane_chaining_matches_sequential(gated_program):
    """Two same-lane frames in ONE batch must produce the same areas as two
    single-frame dispatches (the in-batch scan chains state)."""
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, gates="device", gate_lanes=2,
                       gate_blur_size=5, gate_motion_blur_size=5, max_det=8)
    a = DetectorProgram(spec, seed=0)
    b = DetectorProgram(spec, seed=0)
    for p in (a, b):
        p.update_filters(FilterSettings(conf_threshold=0.0,
                                        wildlife_only=False))
        p.update_gate_params(empty_threshold=25, var_threshold=16,
                             learning_rate=1.0 / 50)
    clip = _clip(n=4)
    # a: batch of 2 same-lane frames, twice
    areas_batched = []
    for i in (0, 2):
        _, aux = a.detect_batch_gated(
            np.stack([clip[i], clip[i + 1]]), lanes=[0, 0])
        areas_batched += list(np.asarray(aux["motion_area"]))
    # b: one frame at a time
    areas_serial = []
    for f in clip:
        _, aux = b.detect_batch_gated(f[None], lanes=[0])
        areas_serial.append(float(np.asarray(aux["motion_area"])[0]))
    np.testing.assert_allclose(areas_batched, areas_serial, rtol=1e-5)


def test_engine_device_gate_end_to_end(gated_program):
    """Standalone engine over a gated program: static frames produce
    skipped-empty results; detections carry motion fields."""
    from telescope_cam_detection_tpu.runtime.engine import InferenceEngine
    prog = gated_program
    prog.reset_gate_state()
    out_q = queue.Queue(50)
    engine = InferenceEngine(
        queue.Queue(5), out_q, camera_id="camA", program=prog,
        detection_config={"conf_threshold": 0.0, "wildlife_only": False,
                          "min_box_area": 0},
        empty_frame_filter=DeviceEmptyFrameGate(min_motion_area=200))
    clip = _clip(n=6)
    for i, f in enumerate(clip):
        engine._handle_frame({"frame": f, "frame_id": i,
                              "timestamp": time.time()})
    results = [out_q.get_nowait() for _ in range(out_q.qsize())]
    assert len(results) == len(clip)
    # static mid-clip frames (1, 2) were gated empty
    skipped = [r["skipped_empty_frame"] for r in results]
    assert skipped[1] and skipped[2]
    assert not skipped[0]          # first frame always passes
    assert engine.frames_skipped_empty >= 2
    # every non-skipped result's detections carry device motion stats
    for r in results:
        if not r["skipped_empty_frame"]:
            assert "mean_luma" in r
            for d in r["detections"]:
                assert "motion_ratio" in d and "motion_pixels" in d


def test_coordinator_device_gate_flow(gated_program):
    """Coordinator mode: callbacks receive gate aux; engine applies it."""
    from telescope_cam_detection_tpu.runtime.coordinator import (
        SharedInferenceCoordinator)
    from telescope_cam_detection_tpu.runtime.engine import InferenceEngine
    prog = gated_program
    prog.reset_gate_state()
    prog._lane_registry.clear()
    coord = SharedInferenceCoordinator(prog, max_batch_size=2,
                                       max_batch_wait_ms=10,
                                       pipeline_depth=2)
    out_q = queue.Queue(50)
    engine = InferenceEngine(
        queue.Queue(5), out_q, camera_id="camB", coordinator=coord,
        detection_config={"conf_threshold": 0.0, "wildlife_only": False},
        empty_frame_filter=DeviceEmptyFrameGate(min_motion_area=200))
    coord.start()
    try:
        for i, f in enumerate(_clip(n=6)):
            engine._handle_frame({"frame": f, "frame_id": i,
                                  "timestamp": time.time()})
        deadline = time.time() + 60
        results = []
        while len(results) < 6 and time.time() < deadline:
            try:
                results.append(out_q.get(timeout=1.0))
            except queue.Empty:
                pass
    finally:
        coord.stop()
    assert len(results) == 6
    results.sort(key=lambda r: r["frame_id"])
    assert results[1]["skipped_empty_frame"]
    assert not results[0]["skipped_empty_frame"]


def test_gate_params_hot_reload_no_recompile(gated_program):
    """Threshold changes ride runtime arrays — compilations stay flat."""
    prog = gated_program
    prog.reset_gate_state()
    f = _clip(n=1)[0]
    prog.detect_batch_gated(f[None], lanes=[0])
    before = prog.stats["compilations"]
    prog.update_gate_params(empty_threshold=5, var_threshold=50,
                            learning_rate=0.1, detect_shadows=False)
    prog.detect_batch_gated(f[None], lanes=[0])
    assert prog.stats["compilations"] == before


def test_system_wiring_device_gates(tmp_path):
    """detection.gates: device wires DeviceEmptyFrameGate + program-backed
    MotionFilter and reports blur sizes as restart-required on reload."""
    import textwrap
    from telescope_cam_detection_tpu.system import TelescopeDetectionSystem
    cfg = textwrap.dedent("""
        cameras:
          - id: cam1
            protocol: synthetic
            target_width: 96
            target_height: 96
        detection:
          detector_type: yolox
          yolox: {model_name: yolox-nano}
          input_size: [96, 96]
          gates: device
          batching: {enabled: false}
        performance:
          empty_frame_filter: {enabled: true, min_motion_area: 150,
                               threshold: 30, blur_size: 5}
        motion_filter:
          enabled: true
          var_threshold: 20
          history: 100
          motion_blur_size: 5
        web: {host: 127.0.0.1, port: 18099}
        camera_health: {enabled: false}
        snapshots: {enabled: false}
    """)
    path = tmp_path / "config.yaml"
    path.write_text(cfg)
    sys_obj = TelescopeDetectionSystem(str(path), load_weights=False)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    try:
        assert sys_obj.program.spec.gates == "device"
        eng = sys_obj.engines["cam1"]
        assert isinstance(eng.empty_frame_filter, DeviceEmptyFrameGate)
        assert eng.empty_frame_filter.min_motion_area == 150
        assert sys_obj.motion_filters["cam1"].backend == "program"
        # program gate params picked up config values
        params = np.asarray(sys_obj.program._gate_params)
        assert params[0] == 30.0 and params[1] == 20.0
        assert abs(params[2] - 1 / 100) < 1e-9
        # hot reload: threshold change reloads; blur change requires restart
        path.write_text(cfg.replace("threshold: 30", "threshold: 12")
                        .replace("min_motion_area: 150",
                                 "min_motion_area: 99")
                        .replace("blur_size: 5}", "blur_size: 7}"))
        res = sys_obj.reload_config()
        assert res["success"]
        assert any("empty_gate.min_motion_area" in r
                   for r in res["reloaded"])
        assert "performance.empty_frame_filter.blur_size" in \
            res["requires_restart"]
        assert np.asarray(sys_obj.program._gate_params)[0] == 12.0
        assert eng.empty_frame_filter.min_motion_area == 99
    finally:
        sys_obj.stop()


def test_coordinator_resize_at_assembly_capture_coords(gated_program):
    """When capture resolution exceeds model input, the coordinator resizes
    during batch assembly and passes capture_hw through — detections must
    come back in CAPTURE coordinates and gate areas in capture px units."""
    from telescope_cam_detection_tpu.runtime.coordinator import (
        SharedInferenceCoordinator)
    prog = gated_program
    prog.reset_gate_state()
    prog._lane_registry.clear()
    coord = SharedInferenceCoordinator(prog, max_batch_size=2,
                                       max_batch_wait_ms=5,
                                       pipeline_depth=2)
    results = []
    done = []

    def cb(rows, gate=None):
        results.append((rows, gate))
        done.append(1)

    big = np.zeros((2 * HW[0], 2 * HW[1], 3), np.uint8)  # 2x capture
    big[40:120, 40:120] = 200
    coord.start()
    try:
        coord.infer_async(big, cb, camera_id="camZ")
        deadline = time.time() + 60
        while not done and time.time() < deadline:
            time.sleep(0.05)
    finally:
        coord.stop()
    assert done, "no callback"
    rows, gate = results[0]
    assert gate is not None
    # first frame: uninitialized lane
    assert not bool(gate["initialized"])
    valid = rows[rows[:, 5] >= 0]
    # any valid boxes must lie within CAPTURE bounds (2*HW), and at least
    # plausibly exceed the model-input range proving the scale-back
    if len(valid):
        assert valid[:, [0, 2]].max() <= 2 * HW[1] + 1
        assert valid[:, [1, 3]].max() <= 2 * HW[0] + 1


@pytest.mark.slow
def test_rtdetr_gated_program():
    """Device gates compose with the RT-DETR (NMS-free) detect core too:
    one dispatch returns rows + gate aux, lanes chain, parity of the
    empty-gate decision with the host XLA gate."""
    spec = ProgramSpec(detector_type="rtdetr", variant="rtdetrv2-r18vd",
                       input_hw=(96, 96), gates="device", gate_lanes=2,
                       gate_blur_size=5, gate_motion_blur_size=5,
                       max_det=16)
    prog = DetectorProgram(spec, seed=0)
    prog.update_filters(FilterSettings(conf_threshold=0.0,
                                       wildlife_only=False))
    prog.update_gate_params(empty_threshold=25, var_threshold=16,
                            learning_rate=1.0 / 50)
    host = EmptyFrameFilter(min_motion_area=200, blur_size=5, threshold=25,
                            backend="xla")
    gate = DeviceEmptyFrameGate(min_motion_area=200)
    for f in _clip(n=5):
        rows, aux = prog.detect_batch_gated(f[None], lanes=[0])
        assert rows.shape == (1, 16, 7)
        assert set(aux) >= {"motion_area", "initialized", "motion_ratio",
                            "motion_pixels", "mean_luma"}
        dev = gate.decide(float(aux["motion_area"][0]),
                          bool(aux["initialized"][0]))
        assert dev == host.has_motion(f)


def test_chain_shape_excludes_padding():
    """Padding entries (lane -1) must not inflate the round schedule: a
    bucket-8 batch with 3 real cameras and 5 pads needs ONE round, not
    eight."""
    assert motion_ops.chain_shape([0, 1, 2, -1, -1, -1, -1, -1]) == (1, 4)
    assert motion_ops.chain_shape([-1, -1]) == (1, 1)   # all-pad batch
    assert motion_ops.chain_shape([0, 0, 1, -1]) == (2, 2)


def test_round_schedule_drops_padding():
    import jax.numpy as jnp
    sched = np.asarray(motion_ops._round_schedule(
        jnp.asarray([0, 1, -1, -1], jnp.int32), rounds=1, width=2))
    assert sorted(sched[0].tolist()) == [0, 1]          # pads absent


@pytest.mark.slow  # extra padded-batch program compile (~19s)
def test_padded_batch_matches_unpadded(gated_program):
    """A batch padded with -1 lanes yields identical gate results for the
    real entry and leaves that lane's state exactly as a pad-free dispatch
    sequence would (pads carry no gate state)."""
    prog = gated_program
    clip = _clip(n=4)
    prog.reset_gate_state()
    areas_padded = []
    for f in clip:
        frames = np.stack([f] + [np.zeros_like(f)] * 3)
        _, aux = prog.detect_batch_gated(frames, lanes=[0, -1, -1, -1])
        areas_padded.append(float(np.asarray(aux["motion_area"])[0]))
    prog.reset_gate_state()
    areas_serial = []
    for f in clip:
        _, aux = prog.detect_batch_gated(f[None], lanes=[0])
        areas_serial.append(float(np.asarray(aux["motion_area"])[0]))
    np.testing.assert_allclose(areas_padded, areas_serial, rtol=1e-5)


def test_gate_lane_validation_allows_pad_marker(gated_program):
    with pytest.raises(ValueError, match="lane out of range"):
        gated_program.detect_batch_gated(
            np.zeros((1, *HW, 3), np.uint8), lanes=[-2])
