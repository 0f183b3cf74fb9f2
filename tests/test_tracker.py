"""Multi-object tracker: identity persistence, Kalman velocity, lifecycle.

Beyond-reference feature (the reference's collision placeholder lists
"track velocity vectors" as a TODO, detection_processor.py:388-437);
hermetic — pure host math, no jax."""
import queue

import pytest

from telescope_cam_detection_tpu.config.loader import validate_config
from telescope_cam_detection_tpu.pipeline.collision import CollisionDetector
from telescope_cam_detection_tpu.pipeline.tracker import MultiObjectTracker
from telescope_cam_detection_tpu.runtime.processor import DetectionProcessor


def det(x1, y1, x2, y2, cls="coyote", conf=0.9):
    return {"class_name": cls, "confidence": conf,
            "bbox": {"x1": float(x1), "y1": float(y1),
                     "x2": float(x2), "y2": float(y2)}}


def moving_det(i, cls="coyote", vx=8.0, vy=3.0, x0=100.0, y0=100.0, size=60):
    return det(x0 + vx * i, y0 + vy * i,
               x0 + vx * i + size, y0 + vy * i + size, cls=cls)


class TestLifecycle:
    def test_id_persists_along_trajectory(self):
        tr = MultiObjectTracker(min_hits=3)
        ids = []
        for i in range(10):
            out = tr.update([moving_det(i)])
            ids.append(out[0].get("track_id"))
        # tentative (no id) for the first min_hits-1 frames, then stable
        assert ids[0] is None and ids[1] is None
        confirmed = [t for t in ids if t is not None]
        assert confirmed and len(set(confirmed)) == 1

    def test_velocity_converges_to_true_motion(self):
        tr = MultiObjectTracker(min_hits=1)
        out = None
        for i in range(12):
            out = tr.update([moving_det(i, vx=8.0, vy=3.0)])
        v = out[0]["track_velocity"]
        assert v["vx"] == pytest.approx(8.0, abs=1.5)
        assert v["vy"] == pytest.approx(3.0, abs=1.5)
        assert out[0]["track_age"] == 12

    def test_survives_occlusion_via_prediction(self):
        tr = MultiObjectTracker(min_hits=1, max_age=10, iou_min=0.2)
        tid = None
        for i in range(6):
            tid = tr.update([moving_det(i)])[0]["track_id"]
        for i in range(6, 10):   # occluded: no detections
            assert tr.update([]) == []
        # reappears where the constant-velocity prediction expects it
        out = tr.update([moving_det(10)])
        assert out[0]["track_id"] == tid

    def test_new_id_after_max_age(self):
        tr = MultiObjectTracker(min_hits=1, max_age=2)
        tid = tr.update([moving_det(0)])[0]["track_id"]
        for _ in range(3):
            tr.update([])
        out = tr.update([moving_det(1)])
        assert out[0]["track_id"] != tid

    def test_tentative_track_dies_on_first_miss(self):
        tr = MultiObjectTracker(min_hits=3, max_age=10)
        tr.update([moving_det(0)])
        tr.update([])   # tentative track missed -> culled
        assert tr.get_stats()["live_tracks"] == 0


class TestAssociation:
    def test_two_classes_keep_distinct_ids_through_crossing(self):
        tr = MultiObjectTracker(min_hits=1, class_consistent=True)
        ids = {"coyote": set(), "bobcat": set()}
        for i in range(12):
            # crossing paths: one moves right, the other left, same row
            a = moving_det(i, cls="coyote", vx=10, vy=0, x0=50, y0=200)
            b = moving_det(i, cls="bobcat", vx=-10, vy=0, x0=250, y0=200)
            for d in tr.update([a, b]):
                ids[d["class_name"]].add(d["track_id"])
        assert len(ids["coyote"]) == 1 and len(ids["bobcat"]) == 1
        assert ids["coyote"] != ids["bobcat"]

    def test_greedy_prefers_higher_iou(self):
        tr = MultiObjectTracker(min_hits=1, class_consistent=False)
        tr.update([det(100, 100, 160, 160), det(300, 100, 360, 160)])
        out = tr.update([det(302, 101, 362, 161), det(101, 99, 161, 159)])
        # detection order flipped; IDs must follow position, not order
        assert out[0]["track_id"] == 2 and out[1]["track_id"] == 1

    def test_malformed_bbox_ignored(self):
        tr = MultiObjectTracker(min_hits=1)
        out = tr.update([{"class_name": "x", "bbox": {"x1": 5}},
                         det(10, 10, 0, 0),    # inverted
                         moving_det(0)])
        assert "track_id" not in out[0] and "track_id" not in out[1]
        assert out[2]["track_id"] == 1

    def test_max_tracks_cap(self):
        tr = MultiObjectTracker(min_hits=1, max_tracks=2)
        dets = [det(i * 100, 10, i * 100 + 50, 60) for i in range(4)]
        out = tr.update(dets)
        assert sum(1 for d in out if "track_id" in d) == 2
        assert tr.get_stats()["live_tracks"] == 2

    def test_saturation_warning_once_per_episode(self, caplog):
        """ADVICE r4: at 30 fps a saturated tracker must not log the
        max_tracks warning every frame — once per episode, re-armed when
        tracks retire."""
        import logging
        tr = MultiObjectTracker(min_hits=1, max_tracks=1, max_age=0)
        two = [det(10, 10, 60, 60), det(300, 10, 350, 60)]
        with caplog.at_level(logging.WARNING,
                             logger="telescope_cam_detection_tpu.pipeline"
                                    ".tracker"):
            for _ in range(5):   # 5 saturated frames -> ONE warning
                tr.update(list(two))
            n_first = sum("max_tracks" in r.message for r in caplog.records)
            assert n_first == 1
            tr.update([])   # both boxes gone; track ages out -> episode ends
            tr.update([])
            tr.update(list(two))   # saturates again -> a second warning
            assert sum("max_tracks" in r.message
                       for r in caplog.records) == 2


class TestControlPlane:
    def test_update_params_reports_changes(self):
        tr = MultiObjectTracker()
        assert tr.update_params({"iou_min": 0.3}) == []   # unchanged
        updated = tr.update_params({"iou_min": 0.5, "max_age": 30})
        assert set(updated) == {"iou_min", "max_age"}
        assert tr.iou_min == 0.5 and tr.max_age == 30

    def test_stats_contract(self):
        tr = MultiObjectTracker(min_hits=1)
        for i in range(3):
            tr.update([moving_det(i)])
        s = tr.get_stats()
        assert s["active_tracks"] == 1 and s["tracks_created"] == 1
        assert s["tracks_confirmed"] == 1 and s["frames_processed"] == 3

    def test_config_validation(self):
        base = {"cameras": [], "detection": {}}
        assert not [e for e in validate_config(dict(base, tracking={
            "enabled": True, "iou_min": 0.4, "max_age": 20, "min_hits": 2,
            "max_tracks": 64})) if "tracking" in e]
        errs = validate_config(dict(base, tracking={
            "iou_min": 1.5, "min_hits": 0, "max_age": -1,
            "max_tracks": True}))
        assert sum("tracking." in e for e in errs) == 4
        assert any("tracking must be a mapping" in e
                   for e in validate_config(dict(base, tracking=[1])))


class TestSnapshotDedup:
    """snapshots.dedup_tracks: one event per animal visit (track), not one
    per (class, cooldown window)."""

    def _saver(self, **kw):
        from telescope_cam_detection_tpu.runtime.snapshot import SnapshotSaver
        kw.setdefault("dedup_tracks", True)
        return SnapshotSaver(trigger_classes=["coyote"], min_confidence=0.5,
                             cooldown_seconds=45.0, **kw)

    def _tracked(self, tid):
        d = det(10, 10, 60, 60, cls="coyote")
        if tid is not None:
            d["track_id"] = tid
        return d

    def test_one_event_per_track_two_animals_both_fire(self):
        sv = self._saver()
        assert sv.should_save([self._tracked(1)], "c1") is not None
        # the same animal loitering: suppressed (class cooldown would also
        # suppress here, but forever-per-track, not per window)
        assert sv.should_save([self._tracked(1)], "c1") is None
        # a SECOND animal of the same class arriving inside the cooldown
        # window: fires — this is the case per-class cooldown gets wrong
        assert sv.should_save([self._tracked(2)], "c1") is not None
        assert sv.triggers_suppressed == 1

    def test_untracked_detection_keeps_class_cooldown(self):
        sv = self._saver()
        assert sv.should_save([self._tracked(None)], "c1") is not None
        assert sv.should_save([self._tracked(None)], "c1") is None

    def test_disabled_dedup_ignores_track_ids(self):
        sv = self._saver(dedup_tracks=False)
        assert sv.should_save([self._tracked(1)], "c1") is not None
        assert sv.should_save([self._tracked(2)], "c1") is None  # cooldown

    def test_hot_reload_and_prune(self):
        import time as _t
        sv = self._saver(dedup_tracks=False)
        assert "dedup_tracks" in sv.update_settings({"dedup_tracks": True})
        assert sv.dedup_tracks is True
        now = _t.time()
        # hard cap, oldest-first: 5000 stale + 1 fresh track stamps + 1
        # class key = 5002 entries -> evict the 906 OLDEST track stamps
        # down to the 4096 cap; class keys and the fresh stamp survive
        # even though every stale stamp is inside no age horizon at all
        sv._last_save = {("c1", f"track:{i}"): now - 7200 + i
                         for i in range(5000)}
        sv._last_save[("c1", "coyote")] = now - 7200   # class keys survive
        sv._last_save[("c1", "track:fresh")] = now
        sv._prune_track_stamps(now)
        assert len(sv._last_save) == 4096
        assert ("c1", "coyote") in sv._last_save
        assert ("c1", "track:fresh") in sv._last_save
        # the evicted ones are exactly the oldest track stamps
        assert ("c1", "track:0") not in sv._last_save
        assert ("c1", "track:4999") in sv._last_save
        # under the cap: prune is a no-op (no dict rebuild)
        before = dict(sv._last_save)
        sv._prune_track_stamps(now)
        assert sv._last_save == before

    def test_tentative_to_confirmed_single_event(self):
        """ADVICE r4 (medium): a new animal's first frames carry no
        track_id (tentative track); its first save fires via the class
        cooldown. When the track confirms moments later, that must NOT
        fire a second event — the confirmation consumes the claim."""
        sv = self._saver()
        assert sv.should_save([self._tracked(None)], "c1") is not None
        # track confirms: same animal, now stamped with an id -> silent
        assert sv.should_save([self._tracked(1)], "c1") is None
        assert sv.triggers_suppressed == 1
        # and the track is stamped: it stays silent forever after
        assert sv.should_save([self._tracked(1)], "c1") is None
        # a DIFFERENT animal confirming later (claim already consumed)
        # fires its own event
        assert sv.should_save([self._tracked(2)], "c1") is not None

    def test_two_animals_arriving_together_two_events(self):
        """Claim consumption is one-shot: animal A's pre-confirmation save
        is claimed by A's confirmation; animal B confirming right after
        still fires (two coyotes together = two events)."""
        sv = self._saver()
        assert sv.should_save([self._tracked(None)], "c1") is not None  # A
        assert sv.should_save([self._tracked(1)], "c1") is None   # A claims
        assert sv.should_save([self._tracked(2)], "c1") is not None  # B

    def test_stale_claim_does_not_suppress(self, monkeypatch):
        """A claim older than the confirmation grace is abandoned (the
        tentative track died); a track confirming much later is a new
        visit and fires."""
        import time as _t
        sv = self._saver()
        t0 = _t.time()
        monkeypatch.setattr(_t, "time", lambda: t0)
        assert sv.should_save([self._tracked(None)], "c1") is not None
        monkeypatch.setattr(
            _t, "time", lambda: t0 + sv.track_confirm_grace + 1)
        assert sv.should_save([self._tracked(1)], "c1") is not None


class TestIntegration:
    def test_processor_stamps_and_reports(self):
        in_q, out_q = queue.Queue(), queue.Queue()
        tr = MultiObjectTracker(min_hits=1)
        proc = DetectionProcessor(in_q, out_q, camera_id="c1", tracker=tr)
        for i in range(3):
            proc._process({"timestamp": 0.0, "frame_id": i,
                           "detections": [moving_det(i)]})
        result = None
        while not out_q.empty():
            result = out_q.get_nowait()
        assert result["detections"][0]["track_id"] == 1
        assert proc.get_stats()["tracking"]["active_tracks"] == 1

    def test_collision_uses_track_velocity(self):
        zone = {"name": "den", "points": [[500, 80], [640, 80], [640, 220],
                                          [500, 220]]}
        cd = CollisionDetector(zones=[zone], danger_threshold=30.0,
                               predict_horizon_frames=5)
        # first-ever frame: the heuristic has no previous centers, but the
        # tracker-stamped velocity predicts entry within the horizon
        d = moving_det(0, x0=330, y0=120, vx=0, vy=0)
        d["track_velocity"] = {"vx": 25.0, "vy": 0.0}
        alerts = cd.check([d], now=100.0)
        assert [a["risk"] for a in alerts] == ["approaching"]
        assert alerts[0]["predicted"] is True
        # same geometry without the stamp: no velocity -> no prediction
        cd2 = CollisionDetector(zones=[zone], danger_threshold=30.0,
                                predict_horizon_frames=5)
        assert cd2.check([moving_det(0, x0=330, y0=120)], now=100.0) == []
