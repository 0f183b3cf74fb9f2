"""Phase-3 collision / danger-zone detection.

The reference ships only a placeholder (detection_processor.py:388-437
CollisionDetector: empty risk dict, TODO list: distances, velocity vectors,
intersection prediction) plus the scenario-capture tooling. This module
implements the feature the placeholder promised:

  * polygon danger zones per camera (config ``collision_detection.zones``),
  * exact point-in-polygon containment ("critical" risk),
  * distance-to-polygon-edge proximity within ``danger_threshold`` px
    ("warning" risk),
  * short-horizon approach prediction from per-class center velocity
    ("approaching" risk) — the reference TODO's "track velocity vectors,
    predict intersection points".

Alerts ride the result dicts through the detection queue to the WebSocket
clients (``collision_alerts``), and the dashboard draws the zones.
"""
from __future__ import annotations

import logging
import math
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)

Point = Tuple[float, float]


def point_in_polygon(pt: Point, poly: Sequence[Point]) -> bool:
    """Ray-casting containment test (edges count as inside)."""
    x, y = pt
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if _on_segment((x, y), (x1, y1), (x2, y2)):
            return True
        if (y1 > y) != (y2 > y):
            x_cross = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < x_cross:
                inside = not inside
    return inside


def _on_segment(p: Point, a: Point, b: Point, eps: float = 1e-9) -> bool:
    cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    if abs(cross) > eps * max(abs(b[0] - a[0]) + abs(b[1] - a[1]), 1.0):
        return False
    return (min(a[0], b[0]) - eps <= p[0] <= max(a[0], b[0]) + eps and
            min(a[1], b[1]) - eps <= p[1] <= max(a[1], b[1]) + eps)


def distance_to_polygon(pt: Point, poly: Sequence[Point]) -> float:
    """Euclidean distance from pt to the polygon boundary (0 inside)."""
    if point_in_polygon(pt, poly):
        return 0.0
    best = math.inf
    n = len(poly)
    for i in range(n):
        best = min(best, _point_segment_distance(pt, poly[i],
                                                 poly[(i + 1) % n]))
    return best


def _point_segment_distance(p: Point, a: Point, b: Point) -> float:
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    if seg2 <= 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / seg2))
    cx, cy = ax + t * dx, ay + t * dy
    return math.hypot(px - cx, py - cy)


class CollisionDetector:
    """Danger-zone checks for one camera's detections.

    zones: [{name, points: [[x, y], ...], alert_on_entry: [class, ...]}].
    A zone with an ``alert_on_entry`` list only fires for those classes;
    otherwise every detection class can trigger it.
    """

    def __init__(self, zones: Optional[List[Dict[str, Any]]] = None,
                 danger_threshold: float = 50.0, enabled: bool = True,
                 predict_horizon_frames: int = 5,
                 alert_cooldown_seconds: float = 5.0):
        self.enabled = enabled
        self.danger_threshold = float(danger_threshold)
        self.predict_horizon = int(predict_horizon_frames)
        self.alert_cooldown = float(alert_cooldown_seconds)
        self.zones: List[Dict[str, Any]] = []
        for zone in zones or []:
            self.add_danger_zone(zone)
        # last center per class for velocity estimation (no tracker IDs:
        # nearest-previous-center of the same class within a gate)
        self._last_centers: Dict[str, List[Point]] = {}
        self._last_alert: Dict[Tuple[str, str, str], float] = {}
        self.alerts_raised = 0

    def add_danger_zone(self, zone: Dict[str, Any]) -> None:
        pts = [(float(p[0]), float(p[1])) for p in zone.get("points") or []]
        if len(pts) < 3:
            logger.warning("collision zone %r needs >= 3 points; ignored",
                           zone.get("name"))
            return
        self.zones.append({"name": zone.get("name", f"zone{len(self.zones)}"),
                           "points": pts,
                           "alert_on_entry": list(zone.get("alert_on_entry")
                                                  or [])})

    def set_zones(self, zones: List[Dict[str, Any]]) -> None:
        """Replace every zone (live zone-editor path, server/web.py
        POST /api/zones). Alert cooldown state resets with the zones.
        The swap is a single reference assignment so a processor thread
        iterating concurrently sees either the old or the new list, never
        a partially-built one."""
        staged = CollisionDetector(zones=zones, enabled=False)
        self._last_alert.clear()
        self.zones = staged.zones

    def zones_payload(self) -> List[Dict[str, Any]]:
        """JSON-safe copy of the live zones."""
        return [{"name": z["name"],
                 "points": [[x, y] for x, y in z["points"]],
                 "alert_on_entry": list(z["alert_on_entry"])}
                for z in self.zones]

    # -- main entry -----------------------------------------------------------
    def check(self, detections: List[Dict[str, Any]],
              now: Optional[float] = None) -> List[Dict[str, Any]]:
        """Returns alert dicts: {zone, class_name, risk, distance_px,
        predicted (bool)}; stamps nothing on the detections themselves."""
        if not self.enabled or not self.zones:
            return []
        now = time.time() if now is None else now
        alerts: List[Dict[str, Any]] = []
        new_centers: Dict[str, List[Point]] = {}
        for det in detections:
            bbox = det.get("bbox") or {}
            cx = (bbox.get("x1", 0.0) + bbox.get("x2", 0.0)) / 2.0
            cy = (bbox.get("y1", 0.0) + bbox.get("y2", 0.0)) / 2.0
            cls = det.get("class_name", "?")
            new_centers.setdefault(cls, []).append((cx, cy))
            # a tracked detection carries a Kalman-filtered per-object
            # velocity (pipeline/tracker.py) — strictly better than the
            # nearest-previous-center heuristic below, which mis-pairs
            # whenever two same-class animals pass within the gate
            tv = det.get("track_velocity")
            if tv is not None:
                vel: Optional[Point] = (float(tv.get("vx", 0.0)),
                                        float(tv.get("vy", 0.0)))
            else:
                vel = self._velocity(cls, (cx, cy))
            for zone in self.zones:
                watch = zone["alert_on_entry"]
                if watch and cls not in watch:
                    continue
                risk, dist, predicted = self._zone_risk((cx, cy), vel, zone)
                if risk is None:
                    continue
                key = (zone["name"], cls, risk)
                if now - self._last_alert.get(key, 0.0) < self.alert_cooldown:
                    continue
                self._last_alert[key] = now
                self.alerts_raised += 1
                alerts.append({
                    "zone": zone["name"], "class_name": cls, "risk": risk,
                    "distance_px": round(dist, 1), "predicted": predicted,
                })
        self._last_centers = new_centers
        return alerts

    # -- internals --------------------------------------------------------------
    def _velocity(self, cls: str, center: Point) -> Optional[Point]:
        """Per-frame velocity vs the nearest previous center of the same
        class (gated at 150 px so unrelated detections don't pair up)."""
        prev = self._last_centers.get(cls)
        if not prev:
            return None
        best, best_d = None, 150.0
        for p in prev:
            d = math.hypot(center[0] - p[0], center[1] - p[1])
            if d < best_d:
                best, best_d = p, d
        if best is None:
            return None
        return (center[0] - best[0], center[1] - best[1])

    def _zone_risk(self, center: Point, vel: Optional[Point],
                   zone: Dict[str, Any]):
        """(risk, distance, predicted): 'critical' inside, 'warning' within
        danger_threshold, 'approaching' if the extrapolated path enters the
        warning band within predict_horizon frames."""
        pts = zone["points"]
        dist = distance_to_polygon(center, pts)
        if dist <= 0.0:
            return "critical", 0.0, False
        if dist <= self.danger_threshold:
            return "warning", dist, False
        if vel is not None and self.predict_horizon > 0:
            speed = math.hypot(*vel)
            if speed > 1.0:  # px/frame; ignore jitter
                future = (center[0] + vel[0] * self.predict_horizon,
                          center[1] + vel[1] * self.predict_horizon)
                fdist = distance_to_polygon(future, pts)
                if fdist <= self.danger_threshold:
                    return "approaching", dist, True
        return None, dist, False

    def get_stats(self) -> Dict[str, Any]:
        return {"enabled": self.enabled, "zones": len(self.zones),
                "alerts_raised": self.alerts_raised,
                "danger_threshold": self.danger_threshold}
