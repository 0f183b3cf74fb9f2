"""bench.py measure_device_exec: hermetic CPU pin of the helper that puts
device-compute evidence (`device_exec_ms_b4`) into the recorded bench JSON.

The helper must work against a DetectorProgram regardless of its transfer
mode (the throughput bench hands it a delta-mode program and it builds the
PLAIN variant of the same model/weights internally), return a positive
per-dispatch time, and leave the program's delta/gate state untouched.
"""
import numpy as np
import pytest

import bench
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram, ProgramSpec)


@pytest.mark.slow
def test_measure_device_exec_on_delta_program():
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=(128, 128), max_det=20, pre_nms_topk=50,
                       transfer="delta", delta_lanes=2, readback_topk=8)
    program = DetectorProgram(spec, seed=0)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
              for _ in range(2)]
    ms = bench.measure_device_exec(program, frames, batch=2, iters=3)
    assert ms > 0.0
    # the helper's plain-variant compile must not disturb delta state
    assert program._delta_ref is None
    # and a frame list shorter than the batch must be cycled, not crash
    ms2 = bench.measure_device_exec(program, frames[:1], batch=2, iters=2)
    assert ms2 > 0.0
    # an empty frame list is a caller bug, reported as such
    with pytest.raises(ValueError, match="at least one frame"):
        bench.measure_device_exec(program, [], batch=2)


@pytest.mark.slow
def test_serial_latency_probe_and_scene_map():
    """The two artifact additions (VERDICT r3 #2/#3): strictly-serial batch
    p50 and served-program mAP50 on held-out bench scenes both run against
    a live program and return sane values."""
    from telescope_cam_detection_tpu.runtime.program import FilterSettings
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=(128, 128), max_det=20, pre_nms_topk=50,
                       transfer="delta", delta_lanes=4, readback_topk=8)
    program = DetectorProgram(spec, seed=0)
    program.update_filters(FilterSettings(conf_threshold=0.25,
                                          wildlife_only=True))
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
              for _ in range(8)]
    lanes = [i % 4 for i in range(8)]
    p50 = bench.serial_latency_probe(program, frames, lanes, (128, 128),
                                     n_cams=4, iters=3)
    assert p50 > 0.0
    m = bench.eval_scene_map50(program, n_cams=4, n=8)
    # random weights: ~0, but the path must run and report both sweeps
    assert 0.0 <= m["mAP50"] <= 1.0
    assert 0.0 <= m["mAP50_95"] <= 1.0


@pytest.mark.slow
def test_measure_device_exec_serving_delta_variant():
    """The serving-variant exec probe (VERDICT r4 #5) times the DELTA
    program with device-resident payloads: positive time, program delta
    state untouched (standalone encoders), works when a lane has a single
    frame (degenerate zero-tile delta)."""
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=(128, 128), max_det=20, pre_nms_topk=50,
                       transfer="delta", delta_lanes=2, readback_topk=8)
    program = DetectorProgram(spec, seed=0)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
              for _ in range(6)]
    lanes = [i % 2 for i in range(6)]
    ms = bench.measure_device_exec_serving(program, frames, lanes,
                                           batch=2, iters=3)
    assert ms > 0.0
    assert program._delta_ref is None   # serving state untouched
    # single frame, no lanes given: degenerate delta still times
    ms2 = bench.measure_device_exec_serving(program, frames[:1], None,
                                            batch=2, iters=2)
    assert ms2 > 0.0
    with pytest.raises(ValueError, match="at least one frame"):
        bench.measure_device_exec_serving(program, [], batch=2)


@pytest.mark.slow
def test_bench_main_smoke_end_to_end(monkeypatch, capsys):
    """The FULL bench harness (health gate -> warmup -> adaptive guard ->
    gated passes -> probes -> artifact assembly) runs hermetically in
    BENCH_SMOKE mode and emits one parseable JSON line with every new
    round-5 field present."""
    import json
    monkeypatch.setenv("BENCH_SMOKE", "1")
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_PASSES", "2")
    monkeypatch.setenv("BENCH_WARMUP", "1")
    monkeypatch.setenv("BENCH_CYCLE", "4")
    monkeypatch.setenv("BENCH_BATCH", "8")
    monkeypatch.setenv("BENCH_HEALTH_WAIT_S", "2")
    monkeypatch.setenv("BENCH_HEALTH_INTERVAL_S", "1")
    # first probe degraded (forces one wait), then healthy: exercises both
    # gate branches without a real degraded chip
    values = iter([0.5])
    monkeypatch.setattr(bench, "measure_device_health",
                        lambda iters=10: next(values, 50.0))
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "SMOKE_wiring_fps_meaningless"
    assert out["value"] > 0
    assert out["degraded_window"] is False
    assert out["waited_s"] == pytest.approx(1.0)
    assert len(out["tflops_samples"]) >= 3   # pre-warmup + 2 passes
    assert len(out["pass_tflops"]) == 2
    # dispatch round trip is its own axis (congested relay windows bound
    # fps via dispatch cost independently of delivered compute)
    assert out["dispatch_rtt_ms"] > 0
    assert len(out["dispatch_rtt_ms_samples"]) == len(out["tflops_samples"])
    assert out["device_exec_ms_b4"] > 0
    assert out["device_exec_ms_b4_serving"] > 0
    assert out["p50_serial_dispatch_ms"] > 0
    assert out["weights"] == "sharpened-random"   # smoke skips checkpoints
    assert "mAP50_scene" not in out   # quality only rides real weights


def test_health_gate_waits_then_gives_up(monkeypatch):
    """HealthGate: degraded probes sleep+re-probe until the budget is
    spent; a healthy probe returns immediately; the artifact annotation
    carries samples, waited_s, and the floor."""
    monkeypatch.setenv("BENCH_HEALTH_FLOOR", "2.0")
    monkeypatch.setenv("BENCH_HEALTH_WAIT_S", "3")
    monkeypatch.setenv("BENCH_HEALTH_INTERVAL_S", "1.5")
    values = iter([0.1, 0.2, 0.3])
    monkeypatch.setattr(bench, "measure_device_health",
                        lambda iters=10: next(values))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    gate = bench.HealthGate()
    assert gate.wait_for_healthy("test") is False
    assert len(slept) == 2 and sum(slept) == 3.0   # budget fully used
    assert len(gate.samples) == 3
    out = {}
    gate.annotate(out)
    assert out["waited_s"] == 3.0
    assert out["health_floor_tflops"] == 2.0
    assert out["device_matmul_tflops"] == 0.3
    assert [s[1] for s in out["tflops_samples"]] == [0.1, 0.2, 0.3]

    # healthy first probe: no sleeping, no budget spent
    monkeypatch.setattr(bench, "measure_device_health", lambda iters=10: 9.0)
    gate2 = bench.HealthGate()
    assert gate2.wait_for_healthy("test") is True
    assert gate2.waited_s == 0.0

    # disabled: never probes
    monkeypatch.setenv("BENCH_HEALTH", "0")
    gate3 = bench.HealthGate()
    monkeypatch.setattr(bench, "measure_device_health",
                        lambda iters=10: 1 / 0)
    assert gate3.wait_for_healthy("test") is True
    assert gate3.samples == []


def test_scene_dataset_ground_truth_marks_the_object():
    """SceneDetectionDataset labels must frame the generator's bright blob:
    mean intensity inside the GT box far exceeds the background."""
    from telescope_cam_detection_tpu.train.data import SceneDetectionDataset
    ds = SceneDetectionDataset(n=6, input_hw=(160, 160), seed=3)
    for i in range(len(ds)):
        img, lbl = ds.load(i)
        x1, y1, x2, y2, cls = lbl[0]
        assert cls == 14
        assert x2 > x1 and y2 > y1
        box = img[int(y1):max(int(np.ceil(y2)), int(y1) + 1),
                  int(x1):max(int(np.ceil(x2)), int(x1) + 1)]
        assert box.mean() > img.mean() + 40   # blob is bright vs background
