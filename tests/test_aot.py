"""AOT serving artifacts (runtime/aot.py): export the plain detector
program with jax.export, reload it cold, and pin bit-exact parity with
the live program — the TPU analog of the reference's TensorRT engine
export (reference tools/convert_yolox_to_tensorrt.py), except weights
remain call arguments so one artifact serves any checkpoint."""
import json
import os

import numpy as np
import pytest

from telescope_cam_detection_tpu.runtime.aot import (
    AotDetector, export_detector)
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram, FilterSettings, ProgramSpec)

HW = (96, 96)


@pytest.fixture(scope="module")
def plain_program():
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, max_det=16)
    prog = DetectorProgram(spec, seed=0)
    prog.update_filters(FilterSettings(conf_threshold=0.0,
                                       wildlife_only=False))
    return prog


@pytest.fixture(scope="module")
def artifact(plain_program, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("aot"))
    manifest = export_detector(plain_program, out, batches=(1, 2),
                               include_weights=True)
    return out, manifest


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, *HW, 3), np.uint8)


def _filter_args(prog):
    f = prog._filter_arrays
    return (f["class_conf"], f["min_area"], f["max_area"],
            f["class_allowed"])


def test_manifest_contents(artifact):
    out, manifest = artifact
    assert manifest["variant"] == "yolox-nano"
    assert sorted(manifest["batches"]) == ["1", "2"]
    for entry in manifest["batches"].values():
        assert os.path.getsize(os.path.join(out, entry["file"])) > 0
    # manifest on disk matches the returned one
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f) == manifest


def test_aot_matches_live_program(plain_program, artifact):
    out, _ = artifact
    det = AotDetector(out)
    frames = _frames(2, seed=1)
    live = np.asarray(plain_program.dispatch_batch(frames))
    aot = np.asarray(det.call(plain_program.variables, frames,
                              *_filter_args(plain_program)))
    np.testing.assert_array_equal(live, aot)


def test_aot_pads_to_bucket(plain_program, artifact):
    """A 1-frame call through the 2-bucket must equal the 1-bucket row."""
    out, _ = artifact
    det = AotDetector(out)
    frames = _frames(1, seed=2)
    rows_1 = np.asarray(det.call(plain_program.variables, frames,
                                 *_filter_args(plain_program)))
    assert rows_1.shape[0] == 1
    det._fns.pop(1)   # force the padded 2-bucket path
    rows_padded = np.asarray(det.call(plain_program.variables, frames,
                                      *_filter_args(plain_program)))
    np.testing.assert_array_equal(rows_1, rows_padded)


def test_aot_filters_are_runtime_args(plain_program, artifact):
    """Filter arrays are call args: a higher conf threshold invalidates
    rows with no re-export."""
    out, _ = artifact
    det = AotDetector(out)
    frames = _frames(2, seed=3)
    loose = np.asarray(det.call(plain_program.variables, frames,
                                *_filter_args(plain_program)))
    strict_settings = FilterSettings(conf_threshold=0.999999,
                                     wildlife_only=False)
    f = strict_settings.to_arrays(plain_program.spec.num_classes)
    strict = np.asarray(det.call(
        plain_program.variables, frames, f["class_conf"], f["min_area"],
        f["max_area"], f["class_allowed"]))
    assert (strict[..., 5] >= 0).sum() <= (loose[..., 5] >= 0).sum()
    assert (strict[..., 5] >= 0).sum() == 0


def test_aot_bundled_weights_load(artifact):
    out, _ = artifact
    det = AotDetector(out)
    assert det.variables is not None


def test_aot_oversize_batch_rejected(plain_program, artifact):
    out, _ = artifact
    det = AotDetector(out)
    with pytest.raises(ValueError, match="bucket"):
        det.call(plain_program.variables, _frames(3),
                 *_filter_args(plain_program))


def test_export_rejects_stateful_variants():
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, max_det=8, transfer="delta",
                       delta_lanes=1)
    prog = DetectorProgram(spec, seed=0)
    with pytest.raises(ValueError, match="delta"):
        export_detector(prog, "/tmp/never")
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, max_det=8, gates="device", gate_lanes=1,
                       gate_blur_size=5, gate_motion_blur_size=5)
    prog = DetectorProgram(spec, seed=0)
    with pytest.raises(ValueError, match="gate"):
        export_detector(prog, "/tmp/never")
    # yuv420 expects host-packed planar frames, not the artifact's
    # (B, H, W, 3) layout — must reject explicitly, not trace-crash
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, max_det=8, transfer="yuv420")
    prog = DetectorProgram(spec, seed=0)
    with pytest.raises(ValueError, match="yuv420"):
        export_detector(prog, "/tmp/never")


# ---------------------------------------------------------------------------
# Config-served artifacts (VERDICT r3 #4): detection.artifact_dir boots the
# deployment from the frozen program — the reference's "serve the prebuilt
# TensorRT engine" path (yolox_detector.py:152-184).
# ---------------------------------------------------------------------------

def test_aot_program_adapter_matches_live(plain_program, artifact):
    """The DetectorProgram-compatible adapter returns IDENTICAL rows to the
    live-traced program, including the dispatch/materialize split the
    pipelined coordinator drives and the hot-reloadable filter arrays."""
    from telescope_cam_detection_tpu.runtime.aot import AotDetectorProgram
    out, _ = artifact
    prog = AotDetectorProgram(out, variables=plain_program.variables)
    prog.update_filters(plain_program.filters)
    frames = _frames(2, seed=4)
    live, _ = plain_program.materialize(
        plain_program.dispatch_batch(frames), 2)
    rows, aux = prog.materialize(prog.dispatch_batch(frames), 2)
    assert aux is None
    np.testing.assert_array_equal(live, rows)
    # detection-dict surface
    assert prog.detect(frames[0]) == plain_program.detect(frames[0])


def test_aot_program_host_resize_capture_coords(plain_program, artifact):
    """Capture frames above the model input resize on host and come back in
    CAPTURE coordinates, exactly like the live program."""
    from telescope_cam_detection_tpu.runtime.aot import AotDetectorProgram
    out, _ = artifact
    prog = AotDetectorProgram(out, variables=plain_program.variables)
    prog.update_filters(plain_program.filters)
    frames = _frames(2, seed=5)
    big = np.stack([np.kron(f, np.ones((2, 2, 1))).astype(np.uint8)
                    for f in frames])   # 2x capture resolution
    rows = prog.detect_batch_rows(big)
    live = plain_program.detect_batch_rows(big)
    np.testing.assert_allclose(rows, live, rtol=1e-5, atol=1e-4)


def test_aot_program_rejects_spec_mismatch(artifact):
    from telescope_cam_detection_tpu.runtime.aot import AotDetectorProgram
    out, _ = artifact
    bad = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                      input_hw=(2 * HW[0], 2 * HW[1]), max_det=16)
    with pytest.raises(ValueError, match="mismatch"):
        AotDetectorProgram(out, spec=bad)


@pytest.mark.slow
def test_system_boots_from_artifact(plain_program, artifact, tmp_path):
    """detection.artifact_dir end to end: the system initializes, serves the
    frozen program through the coordinator, and its rows match the live
    program's on the same frame."""
    import socket
    import textwrap
    from telescope_cam_detection_tpu.models.convert import save_variables
    from telescope_cam_detection_tpu.system import TelescopeDetectionSystem
    out, _ = artifact
    wpath = tmp_path / "weights.msgpack"
    save_variables(plain_program.variables, str(wpath))
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    cfg = textwrap.dedent(f"""
        cameras:
          - id: cam1
            protocol: synthetic
            target_width: {HW[1]}
            target_height: {HW[0]}
            fps: 5
        detection:
          detector_type: yolox
          yolox: {{model_name: yolox-nano, weights: {wpath}}}
          input_size: [{HW[0]}, {HW[1]}]
          conf_threshold: 0.0
          wildlife_only: false
          min_box_area: 0
          max_detections: 16
          artifact_dir: {out}
          batching: {{enabled: true, max_batch_size: 2, max_batch_wait_ms: 20.0}}
        motion_filter: {{enabled: false}}
        time_of_day_filter: {{enabled: false}}
        snapshots: {{enabled: false}}
        web: {{host: 127.0.0.1, port: {port}}}
        camera_health: {{enabled: false}}
    """)
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(cfg)
    sys_obj = TelescopeDetectionSystem(str(cfg_path))
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    try:
        from telescope_cam_detection_tpu.runtime.aot import AotDetectorProgram
        assert isinstance(sys_obj.program, AotDetectorProgram)
        frames = _frames(2, seed=6)
        np.testing.assert_array_equal(
            sys_obj.program.detect_batch_rows(frames),
            plain_program.detect_batch_rows(frames))
    finally:
        sys_obj.stop()


@pytest.mark.slow
def test_aot_program_through_pipelined_coordinator(plain_program, artifact):
    """The adapter's dispatch/materialize split works under the pipelined
    coordinator (drainer thread forces readbacks in dispatch order)."""
    import threading
    from telescope_cam_detection_tpu.runtime.aot import AotDetectorProgram
    from telescope_cam_detection_tpu.runtime.coordinator import (
        SharedInferenceCoordinator)
    out, _ = artifact
    prog = AotDetectorProgram(out, variables=plain_program.variables)
    prog.update_filters(plain_program.filters)
    coord = SharedInferenceCoordinator(prog, max_batch_size=2,
                                       max_batch_wait_ms=30.0,
                                       pipeline_depth=2)
    done = threading.Event()
    got = []

    def cb(rows):
        got.append(np.asarray(rows))
        if len(got) == 4:
            done.set()

    frames = _frames(4, seed=7)
    for i in range(4):
        assert coord.infer_async(frames[i], cb, f"cam{i % 2}")
    coord.start()
    try:
        assert done.wait(timeout=120.0)
    finally:
        coord.stop()
    assert len(got) == 4
    live = plain_program.detect_batch_rows(frames)
    # per-camera order holds; match each callback row against the live rows
    for rows in got:
        assert any(np.allclose(rows, live[i], atol=1e-4) for i in range(4))


def test_config_rejects_artifact_with_stateful_features(tmp_path):
    """Validation refuses artifact_dir + gates/delta/mesh/fused — the frozen
    plain program cannot serve them (config/loader.py)."""
    import textwrap
    from telescope_cam_detection_tpu.system import TelescopeDetectionSystem
    cfg = textwrap.dedent("""
        cameras:
          - id: cam1
            protocol: synthetic
        detection:
          detector_type: yolox
          artifact_dir: /tmp/somewhere
          gates: device
          transfer: delta
          mesh_devices: 4
    """)
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(cfg)
    sys_obj = TelescopeDetectionSystem(str(cfg_path))
    sys_obj.load_config()
    with pytest.raises(Exception) as ei:
        sys_obj.validate_config()
    msg = str(ei.value)
    assert "artifact_dir" in msg


def test_export_rejects_capture_hw_without_device_transfer(plain_program):
    # plain_program fixture uses the default transfer (not "device"):
    # capture_hw would bake a lie into the artifact
    if plain_program.spec.transfer == "device":
        pytest.skip("fixture uses device transfer")
    with pytest.raises(ValueError, match="capture_hw"):
        export_detector(plain_program, "/tmp/never",
                        capture_hw=(2 * HW[0], 2 * HW[1]))
