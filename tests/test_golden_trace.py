"""Golden-trace regression: the seed-0 yolox-nano program on deterministic
synthetic frames must keep producing the committed detections (IoU >= 0.9,
score drift <= 0.02). Guards against numerical drift in preprocess / model /
decode / NMS across refactors.
"""
import json
from pathlib import Path

import pytest

from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram,
    FilterSettings,
    ProgramSpec,
)
from telescope_cam_detection_tpu.utils.frames import SyntheticFrameSource
from telescope_cam_detection_tpu.utils.golden import compare_detections

FIXTURE = Path(__file__).parent / "fixtures" / "golden_yolox_nano_seed0.json"


def test_golden_trace_replay():
    golden = json.loads(FIXTURE.read_text())
    spec_d = golden["spec"]
    spec = ProgramSpec(variant=spec_d["variant"],
                       input_hw=tuple(spec_d["input_hw"]),
                       max_det=spec_d["max_det"],
                       pre_nms_topk=spec_d["pre_nms_topk"])
    prog = DetectorProgram(spec, seed=spec_d["seed"])
    prog.update_filters(FilterSettings(
        conf_threshold=spec_d["conf_threshold"], wildlife_only=False))
    src = SyntheticFrameSource(**golden["source"])
    for i, want in enumerate(golden["detections"]):
        got = prog.detect(src.frame_at(i))
        report = compare_detections(want, got, iou_threshold=0.9,
                                    score_tolerance=0.02)
        assert report.ok, f"frame {i}: {report.details[:3]}"
        assert report.matched == len(want)
