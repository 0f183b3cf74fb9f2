import json
import time

import numpy as np
import pytest

from telescope_cam_detection_tpu.pipeline.face_mask import (
    FaceMasker,
    FaceMaskingCache,
)
from telescope_cam_detection_tpu.runtime.snapshot import SnapshotSaver
from telescope_cam_detection_tpu.utils.visualization import (
    class_color,
    draw_detections,
    format_label,
)


def _det(name="cat", conf=0.9, species=None):
    d = {"class_id": 15, "class_name": name, "confidence": conf,
         "bbox": {"x1": 10, "y1": 10, "x2": 60, "y2": 60}}
    if species:
        d.update({"species": species, "species_confidence": 0.8,
                  "taxonomic_level": "species"})
    return d


def test_format_label_stage1_and_stage2():
    assert format_label(_det()) == "cat 90%"
    assert format_label(_det(species="Bobcat")) == "Bobcat 80%"
    d = _det(species="Leporidae")
    d["taxonomic_level"] = "family"
    assert "[family]" in format_label(d)


def test_draw_detections_modifies_pixels():
    frame = np.zeros((100, 100, 3), np.uint8)
    out = draw_detections(frame, [_det()])
    assert out is not frame
    assert out.sum() > 0
    assert frame.sum() == 0  # original untouched
    assert class_color("person") == (0, 0, 255)


def test_snapshot_trigger_rules(tmp_path):
    saver = SnapshotSaver(output_dir=str(tmp_path), trigger_classes=["cat"],
                          min_confidence=0.5, cooldown_seconds=100)
    assert saver.should_save([_det("dog", 0.9)]) is None          # not in classes
    assert saver.should_save([_det("cat", 0.3)]) is None          # low conf
    trig = saver.should_save([_det("cat", 0.9)])
    assert trig is not None
    assert saver.should_save([_det("cat", 0.9)]) is None          # cooldown
    assert saver.triggers_suppressed == 1
    # another camera has its own cooldown
    assert saver.should_save([_det("cat", 0.9)], camera_id="other") is not None


def test_snapshot_image_products(tmp_path):
    saver = SnapshotSaver(output_dir=str(tmp_path), trigger_classes=["cat"],
                          min_confidence=0.5, save_annotated=True,
                          face_masker=FaceMasker())
    frame = np.random.default_rng(0).integers(0, 256, (120, 160, 3), np.uint8)
    dets = [_det("cat", 0.9, species="Bobcat")]
    path = saver.process_detections("cam1", frame, dets)
    assert path is not None
    base = tmp_path / "cam1"
    raws = list((base / "raw").glob("*.jpg"))
    assert len(raws) == 1
    assert len(list((base / "masked").glob("*.jpg"))) == 1
    assert len(list((base / "annotated").glob("*.jpg"))) == 1
    metas = list(base.glob("*.json"))
    assert len(metas) == 1
    meta = json.loads(metas[0].read_text())
    assert meta["trigger_class"] == "cat"
    assert meta["detections"][0]["species"] == "Bobcat"
    assert saver.snapshots_saved == 1


def _wait_for(predicate, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(0.02)
    return False


def _det_at(name, conf, x1, y1, x2, y2):
    return {"class_id": 15, "class_name": name, "confidence": conf,
            "bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2}}


def test_snapshot_alert_zones(tmp_path):
    """snapshots.alert_zones (the reference's planned 'Alert zones — save
    only when detection in specific area'): with zones configured for a
    camera, only detections whose bbox center is inside trigger; an
    out-of-zone detection never consumes the class cooldown; cameras
    without zones keep the plain rule."""
    square = [{"name": "porch", "points": [[0, 0], [100, 0],
                                           [100, 100], [0, 100]]}]
    saver = SnapshotSaver(output_dir=str(tmp_path), trigger_classes=["cat"],
                          min_confidence=0.5, cooldown_seconds=100,
                          alert_zones={"cam1": square})
    outside = _det_at("cat", 0.9, 200, 200, 260, 260)  # center (230, 230)
    inside = _det_at("cat", 0.9, 20, 20, 60, 60)       # center (40, 40)
    assert saver.should_save([outside], "cam1") is None
    # out-of-zone did NOT burn the cooldown: in-zone still triggers
    assert saver.should_save([inside], "cam1") is not None
    # camera without configured zones: plain rule applies
    assert saver.should_save([outside], "cam2") is not None
    # hot reload: dropping the zones re-opens the whole frame
    assert saver.update_settings({"alert_zones": {}}) == ["alert_zones"]
    saver.cooldown_seconds = 0
    assert saver.should_save([outside], "cam1") is not None


def test_snapshot_notification_on_save(tmp_path):
    """Detection-trigger notifications (the reference's planned
    'Email/SMS notifications on trigger'): fired after a successful save,
    never on suppressed triggers, and a failing sink never breaks saving."""
    events = []
    saver = SnapshotSaver(output_dir=str(tmp_path), trigger_classes=["cat"],
                          min_confidence=0.5, cooldown_seconds=100,
                          notify_callback=events.append)
    frame = np.random.default_rng(1).integers(0, 256, (120, 160, 3), np.uint8)
    dets = [_det("cat", 0.9, species="Bobcat"), _det("cat", 0.8)]
    path = saver.process_detections("cam1", frame, dets)
    assert path is not None
    assert len(events) == 1
    ev = events[0]
    assert ev["event"] == "detection:cat"
    assert ev["camera_id"] == "cam1"
    assert ev["class_name"] == "cat" and ev["confidence"] == 0.9
    assert ev["species"] == "Bobcat"
    assert ev["detection_counts"] == {"cat": 2}
    assert ev["path"] == path and ev["save_mode"] == "image"

    # cooldown-suppressed trigger: no save, no event
    assert saver.process_detections("cam1", frame, dets) is None
    assert len(events) == 1

    def _bad(_):
        raise RuntimeError("sink down")
    saver.notify_callback = _bad
    assert saver.process_detections("cam2", frame, dets) is not None
    assert saver.snapshots_saved == 2  # save succeeded despite the sink


def test_snapshot_notification_webhook_end_to_end(tmp_path):
    """Config -> build_alerter -> real HTTP POST on a snapshot save."""
    import http.server
    import threading

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from telescope_cam_detection_tpu.utils.alerts import build_alerter
        notifier = build_alerter(
            {"webhook_url": f"http://127.0.0.1:{srv.server_port}/hook",
             "min_interval_seconds": 0.0})
        saver = SnapshotSaver(output_dir=str(tmp_path),
                              trigger_classes=["cat"], min_confidence=0.5,
                              notify_callback=notifier)
        frame = np.zeros((60, 80, 3), np.uint8)
        assert saver.process_detections("cam1", frame,
                                        [_det("cat", 0.9)]) is not None
        deadline = time.time() + 5
        while time.time() < deadline and not received:
            time.sleep(0.05)
        assert received and received[0]["event"] == "detection:cat"
        notifier.stop()
    finally:
        srv.shutdown()
        srv.server_close()


def test_clip_mode_with_prebuffer(tmp_path):
    saver = SnapshotSaver(output_dir=str(tmp_path), save_mode="clip",
                          trigger_classes=["cat"], min_confidence=0.5,
                          pre_buffer_seconds=0.2, fps=10)
    frame = np.random.default_rng(1).integers(0, 256, (64, 80, 3), np.uint8)
    for i in range(5):
        saver.add_frame_to_buffer("cam1", frame, time.time())
    path = saver.process_detections("cam1", frame, [_det("cat", 0.9)])
    assert path is not None and path.endswith(".mp4")
    import cv2
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n >= 3  # pre-buffer (maxlen=2) + trigger frame
    assert saver.clips_saved == 1


def test_clip_post_buffer_records_pre_and_post(tmp_path):
    """True pre+post clip recording (the reference's save_clip concedes it
    saves pre-buffer only): with post_buffer_seconds > 0 the clip stays
    open, collects post-trigger frames, finalizes at the deadline, and the
    notification fires at finalize time with the final path."""
    import cv2
    events = []
    saver = SnapshotSaver(output_dir=str(tmp_path), save_mode="clip",
                          trigger_classes=["cat"], min_confidence=0.5,
                          pre_buffer_seconds=1.0, fps=5,
                          post_buffer_seconds=2.0,
                          notify_callback=events.append)
    frame = np.zeros((48, 64, 3), np.uint8)
    t0 = time.time()
    for i in range(3):  # pre-buffer
        saver.add_frame_to_buffer("cam1", frame, t0 - 1 + 0.1 * i)
    assert saver.process_detections("cam1", frame,
                                    [_det("cat", 0.9)]) is None  # pending
    assert saver.get_stats()["clips_recording"] == ["cam1"]
    assert not events  # notification deferred to finalize
    saver.add_frame_to_buffer("cam1", frame, t0 + 0.5)   # post frame
    assert saver.clips_saved == 0
    saver.add_frame_to_buffer("cam1", frame, t0 + 2.5)   # past deadline
    # finalization runs on a writer thread (must not stall the processor)
    assert _wait_for(lambda: saver.clips_saved == 1)
    assert saver.get_stats()["clips_recording"] == []
    assert _wait_for(lambda: len(events) == 1)
    assert events[0]["path"].endswith(".mp4")
    cap = cv2.VideoCapture(events[0]["path"])
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    # 3 pre + trigger + 2 post
    assert n == 6


def test_clip_post_motion_extend_capped(tmp_path, monkeypatch):
    from telescope_cam_detection_tpu.runtime import snapshot as snap_mod
    t0 = time.time()
    fake_now = [t0]
    monkeypatch.setattr(snap_mod.time, "time", lambda: fake_now[0])
    saver = SnapshotSaver(output_dir=str(tmp_path), save_mode="clip",
                          trigger_classes=["cat"], min_confidence=0.5,
                          cooldown_seconds=0, fps=5,
                          post_buffer_seconds=1.0, post_motion_extend=True,
                          max_post_seconds=3.0)
    frame = np.zeros((48, 64, 3), np.uint8)
    saver.add_frame_to_buffer("cam1", frame, t0)
    assert saver.process_detections("cam1", frame,
                                    [_det("cat", 0.9)]) is None
    # detections at t0+1.4 extend the deadline to t0+2.4 (the re-trigger
    # is absorbed by the already-recording guard)...
    fake_now[0] = t0 + 1.4
    assert saver.process_detections("cam1", frame,
                                    [_det("cat", 0.9)]) is None
    saver.add_frame_to_buffer("cam1", frame, t0 + 1.5)  # < extended deadline
    assert saver.clips_saved == 0
    saver.add_frame_to_buffer("cam1", frame, t0 + 2.5)  # past it
    assert _wait_for(lambda: saver.clips_saved == 1)
    # hard cap: extensions can never push past trigger + max_post_seconds
    fake_now[0] = t0 + 10
    saver.add_frame_to_buffer("cam2", frame, t0 + 10)
    assert saver.process_detections("cam2", frame,
                                    [_det("cat", 0.9)]) is None
    fake_now[0] = t0 + 12.9
    saver.process_detections("cam2", frame, [_det("cat", 0.9)])
    with saver._pending_lock:
        assert (saver._pending_clips["cam2"]["deadline"]
                == pytest.approx(t0 + 13.0))  # clamped to hard deadline


def test_trigger_during_open_clip_does_not_burn_cooldown(tmp_path,
                                                         monkeypatch):
    """A distinct class appearing while a clip is recording is absorbed
    (it's on the open clip's video) WITHOUT consuming its cooldown — it
    can trigger its own clip as soon as the current one closes."""
    from telescope_cam_detection_tpu.runtime import snapshot as snap_mod
    t0 = time.time()
    fake_now = [t0]
    monkeypatch.setattr(snap_mod.time, "time", lambda: fake_now[0])
    saver = SnapshotSaver(output_dir=str(tmp_path), save_mode="clip",
                          trigger_classes=["cat", "dog"],
                          min_confidence=0.5, cooldown_seconds=45, fps=5,
                          post_buffer_seconds=2.0)
    frame = np.zeros((48, 64, 3), np.uint8)
    saver.add_frame_to_buffer("cam1", frame, t0)
    assert saver.process_detections("cam1", frame,
                                    [_det("cat", 0.9)]) is None  # open
    fake_now[0] = t0 + 1.0
    saver.process_detections("cam1", frame, [_det("dog", 0.9)])  # absorbed
    saver.add_frame_to_buffer("cam1", frame, t0 + 2.5)           # finalize
    assert _wait_for(lambda: saver.clips_saved == 1)
    fake_now[0] = t0 + 3.0  # well inside dog's 45s cooldown IF it burned
    assert saver.process_detections("cam1", frame,
                                    [_det("dog", 0.9)]) is None  # new clip
    assert saver.get_stats()["clips_recording"] == ["cam1"]


def test_extension_requires_trigger_eligible_detection(tmp_path,
                                                       monkeypatch):
    """An unrelated class must not extend the recording deadline."""
    from telescope_cam_detection_tpu.runtime import snapshot as snap_mod
    t0 = time.time()
    fake_now = [t0]
    monkeypatch.setattr(snap_mod.time, "time", lambda: fake_now[0])
    saver = SnapshotSaver(output_dir=str(tmp_path), save_mode="clip",
                          trigger_classes=["cat"], min_confidence=0.5,
                          fps=5, post_buffer_seconds=1.0,
                          post_motion_extend=True, max_post_seconds=10.0)
    frame = np.zeros((48, 64, 3), np.uint8)
    saver.add_frame_to_buffer("cam1", frame, t0)
    assert saver.process_detections("cam1", frame,
                                    [_det("cat", 0.9)]) is None
    fake_now[0] = t0 + 0.9
    saver.process_detections("cam1", frame, [_det("car", 0.9)])  # ineligible
    with saver._pending_lock:
        assert (saver._pending_clips["cam1"]["deadline"]
                == pytest.approx(t0 + 1.0))  # NOT extended


def test_person_mask_clamps_edge_boxes():
    """Pixelate on a person box extending past the frame edge must not
    crash (detector boxes are unclamped, unlike Haar faces)."""
    masker = FaceMasker(mask_style="pixelate", mask_person_boxes=True)
    frame = np.random.default_rng(9).integers(0, 256, (100, 100, 3),
                                              np.uint8)
    person = {"class_id": 0, "class_name": "person", "confidence": 0.9,
              "bbox": {"x1": 80, "y1": -10, "x2": 150, "y2": 120}}
    out = masker.mask_frame(frame, detections=[person])
    assert out.shape == frame.shape
    assert not np.array_equal(out[:, 80:], frame[:, 80:])  # region masked
    np.testing.assert_array_equal(out[:, :80], frame[:, :80])


def test_close_finalizes_open_clips(tmp_path):
    saver = SnapshotSaver(output_dir=str(tmp_path), save_mode="clip",
                          trigger_classes=["cat"], min_confidence=0.5,
                          fps=5, post_buffer_seconds=60.0)
    frame = np.zeros((48, 64, 3), np.uint8)
    saver.add_frame_to_buffer("cam1", frame, time.time())
    assert saver.process_detections("cam1", frame,
                                    [_det("cat", 0.9)]) is None
    saver.close()
    assert saver.clips_saved == 1
    assert saver.get_stats()["clips_recording"] == []


def test_snapshot_hot_reload(tmp_path):
    saver = SnapshotSaver(output_dir=str(tmp_path))
    updated = saver.update_settings({"min_confidence": 0.7,
                                     "trigger_classes": ["dog"],
                                     "cooldown_seconds": 5})
    assert set(updated) == {"min_confidence", "trigger_classes",
                            "cooldown_seconds"}
    assert saver.trigger_classes == {"dog"}


def test_cleanup_unmasked_retention_window(tmp_path):
    """Privacy retention: the unmasked raw/ tree uses a SHORTER window
    than masked/annotated products (the reference's own best-practice
    doc recommends this but its cleanup is never even called)."""
    import os
    saver = SnapshotSaver(output_dir=str(tmp_path))
    ten_days_ago = time.time() - 10 * 86400
    for rel in ("cam1/raw/old.jpg", "cam1/masked/old.jpg",
                "cam1/annotated/old.jpg", "cam1/old_clip.mp4"):
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
        os.utime(p, (ten_days_ago, ten_days_ago))
    fresh = tmp_path / "cam1" / "raw" / "new.jpg"
    fresh.write_bytes(b"x")

    removed = saver.cleanup_old_files(max_age_days=30,
                                      unmasked_max_age_days=7)
    assert removed == 1
    assert not (tmp_path / "cam1" / "raw" / "old.jpg").exists()
    assert (tmp_path / "cam1" / "masked" / "old.jpg").exists()
    assert (tmp_path / "cam1" / "annotated" / "old.jpg").exists()
    assert (tmp_path / "cam1" / "old_clip.mp4").exists()
    assert fresh.exists()


def test_retention_thread_sweeps_and_stops(tmp_path):
    import os
    saver = SnapshotSaver(output_dir=str(tmp_path))
    old = tmp_path / "cam1" / "raw" / "stale.jpg"
    old.parent.mkdir(parents=True)
    old.write_bytes(b"x")
    two_days_ago = time.time() - 2 * 86400
    os.utime(old, (two_days_ago, two_days_ago))
    saver.start_retention(max_age_days=30, unmasked_max_age_days=1,
                          interval_hours=24)
    # the thread sweeps once immediately on start
    assert _wait_for(lambda: not old.exists())
    saver.close()
    assert saver._retention_thread is None


def test_cleanup_old_files(tmp_path):
    saver = SnapshotSaver(output_dir=str(tmp_path))
    old = tmp_path / "cam1" / "raw"
    old.mkdir(parents=True)
    f = old / "old.jpg"
    f.write_bytes(b"x")
    import os
    os.utime(f, (time.time() - 90 * 86400,) * 2)
    assert saver.cleanup_old_files(max_age_days=30) == 1
    assert not f.exists()


def test_face_masker_styles():
    frame = np.random.default_rng(0).integers(0, 256, (100, 100, 3), np.uint8)
    faces = [(20, 20, 40, 40)]
    for style in ("gaussian_blur", "pixelate", "black_box", "adaptive_blur"):
        m = FaceMasker(mask_style=style)
        out = m.apply_mask(frame, faces)
        assert out.shape == frame.shape
        assert not np.array_equal(out[20:60, 20:60], frame[20:60, 20:60])
        # pixels outside the face untouched
        assert np.array_equal(out[:10, :10], frame[:10, :10])
    m = FaceMasker(mask_style="black_box")
    assert (m.apply_mask(frame, faces)[20:60, 20:60] == 0).all()
    with pytest.raises(ValueError):
        FaceMasker(mask_style="nope")


def test_person_box_masking():
    """privacy.mask_person_boxes: whole-body masking of person detections
    (the reference's planned enhancement, PRIVACY_MASKING.md)."""
    frame = np.full((100, 100, 3), 200, np.uint8)
    person = {"class_id": 0, "class_name": "person", "confidence": 0.9,
              "bbox": {"x1": 20, "y1": 30, "x2": 60, "y2": 80}}
    cat = _det("cat", 0.9)

    on = FaceMasker(mask_style="black_box", mask_person_boxes=True)
    out = on.mask_frame(frame, detections=[person, cat])
    assert (out[30:80, 20:60] == 0).all()        # person region masked
    assert (out[:30, :] == 200).all()            # outside untouched
    assert (frame == 200).all()                  # copy semantics

    off = FaceMasker(mask_style="black_box")     # default: faces only
    out = off.mask_frame(frame, detections=[person])
    assert (out == 200).all()

    # cat boxes never masked even with the flag on
    out = on.mask_frame(frame, detections=[cat])
    assert (out == 200).all()


def test_person_box_masking_through_cache_and_snapshot(tmp_path):
    masker = FaceMasker(mask_style="black_box", mask_person_boxes=True)
    cache = FaceMaskingCache(masker, detection_interval=5)
    frame = np.full((100, 100, 3), 200, np.uint8)
    person = {"class_id": 0, "class_name": "person", "confidence": 0.9,
              "bbox": {"x1": 10, "y1": 10, "x2": 40, "y2": 90}}
    out = cache.mask_frame("cam1", frame, detections=[person])
    assert (out[10:90, 10:40] == 0).all()

    saver = SnapshotSaver(output_dir=str(tmp_path),
                          trigger_classes=["person"], min_confidence=0.5,
                          face_masker=masker)
    assert saver.process_detections("cam1", frame, [person]) is not None
    import cv2
    masked_files = list((tmp_path / "cam1" / "masked").glob("*.jpg"))
    assert len(masked_files) == 1
    img = cv2.imread(str(masked_files[0]))
    assert img[15:85, 15:35].max() <= 16   # masked (JPEG ringing tolerance)
    assert img[:5, :].min() >= 180         # outside region intact


def test_face_masking_camera_overrides():
    masker = FaceMasker(mask_style="black_box")
    cache = FaceMaskingCache(masker, camera_overrides={
        "cam1": {"enable_face_masking": False}})
    masker.detect_faces = lambda f: [(2, 2, 4, 4)]
    frame = np.full((10, 10, 3), 200, np.uint8)
    # cam1 disabled -> untouched; cam2 default -> masked
    assert np.array_equal(cache.mask_frame("cam1", frame), frame)
    assert (cache.mask_frame("cam2", frame)[2:6, 2:6] == 0).all()
    assert cache.enabled_for("cam1") is False
    assert cache.enabled_for("cam2") is True


def test_face_masking_cache_interval():
    masker = FaceMasker()
    calls = []
    orig = masker.detect_faces
    masker.detect_faces = lambda f: (calls.append(1), orig(f))[1]
    cache = FaceMaskingCache(masker, detection_interval=3, ttl_seconds=100)
    frame = np.zeros((50, 50, 3), np.uint8)
    for _ in range(6):
        cache.mask_frame("cam1", frame)
    assert len(calls) == 2  # frames 0 and 3 only
