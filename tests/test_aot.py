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


def test_export_rejects_capture_hw_without_device_transfer(plain_program):
    # plain_program fixture uses the default transfer (not "device"):
    # capture_hw would bake a lie into the artifact
    if plain_program.spec.transfer == "device":
        pytest.skip("fixture uses device transfer")
    with pytest.raises(ValueError, match="capture_hw"):
        export_detector(plain_program, "/tmp/never",
                        capture_hw=(2 * HW[0], 2 * HW[1]))
