from datetime import datetime

import pytest

from telescope_cam_detection_tpu.pipeline.time_of_day import (
    TimeOfDay,
    TimeOfDayFilter,
    classify_time_of_day,
)


@pytest.mark.parametrize("hour,expected", [
    (5, TimeOfDay.DAWN), (7, TimeOfDay.DAWN),
    (8, TimeOfDay.DAY), (12, TimeOfDay.DAY), (16, TimeOfDay.DAY),
    (17, TimeOfDay.DUSK), (20, TimeOfDay.DUSK),
    (21, TimeOfDay.NIGHT), (23, TimeOfDay.NIGHT), (2, TimeOfDay.NIGHT),
    (4, TimeOfDay.NIGHT),
])
def test_classify_time_of_day(hour, expected):
    assert classify_time_of_day(datetime(2026, 6, 1, hour, 30)) == expected


def _bird(conf=0.8):
    return {"class_name": "bird", "confidence": conf}


def test_bird_at_night_penalized_with_alternatives():
    filt = TimeOfDayFilter(confidence_penalty=0.3)
    out = filt.filter_detections([_bird()], datetime(2026, 6, 1, 23, 0))
    assert len(out) == 1
    d = out[0]
    assert d["confidence"] == pytest.approx(0.24)
    assert d["original_confidence"] == pytest.approx(0.8)
    assert d["time_of_day_penalty"] is True
    assert "bat" in d["time_of_day_alternatives"]
    assert d["time_of_day"] == "night"


def test_bird_at_day_untouched():
    filt = TimeOfDayFilter()
    out = filt.filter_detections([_bird()], datetime(2026, 6, 1, 12, 0))
    assert out[0]["confidence"] == pytest.approx(0.8)
    assert "time_of_day_penalty" not in out[0]


def test_hard_filter_removes():
    filt = TimeOfDayFilter(hard_filter=True)
    out = filt.filter_detections([_bird()], datetime(2026, 6, 1, 23, 0))
    assert out == []
    assert filt.filtered_count == 1


def test_owl_at_night_allowed_person_any_time():
    filt = TimeOfDayFilter()
    dets = [{"class_name": "owl", "confidence": 0.9},
            {"class_name": "person", "confidence": 0.9}]
    out = filt.filter_detections(dets, datetime(2026, 6, 1, 23, 0))
    assert all("time_of_day_penalty" not in d for d in out)


def test_coyote_crepuscular():
    filt = TimeOfDayFilter()
    det = {"class_name": "coyote", "confidence": 0.9}
    out = filt.filter_detections([dict(det)], datetime(2026, 6, 1, 6, 0))
    assert "time_of_day_penalty" not in out[0]  # dawn ok
    out = filt.filter_detections([dict(det)], datetime(2026, 6, 1, 12, 0))
    assert out[0].get("time_of_day_penalty")    # midday not typical


def test_unknown_class_allowed():
    filt = TimeOfDayFilter()
    out = filt.filter_detections([{"class_name": "zebra", "confidence": 0.5}],
                                 datetime(2026, 6, 1, 23, 0))
    assert "time_of_day_penalty" not in out[0]


def test_disabled_passthrough_and_hot_reload():
    filt = TimeOfDayFilter(enabled=False)
    dets = [_bird()]
    assert filt.filter_detections(dets, datetime(2026, 6, 1, 23, 0)) is dets
    updated = filt.update_params({"enabled": True, "confidence_penalty": 0.5})
    assert set(updated) == {"enabled", "confidence_penalty"}
    out = filt.filter_detections([_bird()], datetime(2026, 6, 1, 23, 0))
    assert out[0]["confidence"] == pytest.approx(0.4)


def test_penalty_idempotent_for_reused_dicts():
    """The sparse-keyframe gate re-delivers the SAME detection dicts; the
    penalty must not compound (regression)."""
    filt = TimeOfDayFilter(confidence_penalty=0.3)
    det = {"class_name": "bird", "confidence": 0.8}
    at_night = datetime(2026, 6, 1, 23, 0)
    out1 = filt.filter_detections([det], at_night)
    assert out1[0]["confidence"] == pytest.approx(0.24)
    out2 = filt.filter_detections(out1, at_night)  # same dicts again
    assert out2[0]["confidence"] == pytest.approx(0.24)  # not 0.072
    assert out2[0]["original_confidence"] == pytest.approx(0.8)
