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
