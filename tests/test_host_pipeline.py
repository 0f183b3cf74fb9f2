"""Hermetic host-pipeline tests: capture -> engine -> coordinator -> processor
with a real (tiny, random-weight) detector program on CPU jax. This is the
fake-camera/fake-backend harness the reference lacks (SURVEY §4)."""
import queue
import time

import numpy as np
import pytest

from telescope_cam_detection_tpu.runtime.capture import (
    SyntheticStreamCapture,
    create_rtsp_url,
    create_stream_capture,
)
from telescope_cam_detection_tpu.runtime.coordinator import (
    SharedInferenceCoordinator,
    bucket_for,
)
from telescope_cam_detection_tpu.runtime.engine import InferenceEngine
from telescope_cam_detection_tpu.runtime.memory import MemoryManager, MemoryPressure
from telescope_cam_detection_tpu.runtime.processor import DetectionProcessor
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram,
    FilterSettings,
    ProgramSpec,
)


@pytest.fixture(scope="module")
def program():
    spec = ProgramSpec(variant="yolox-nano", input_hw=(128, 128), max_det=10,
                       pre_nms_topk=50)
    p = DetectorProgram(spec, seed=0)
    p.update_filters(FilterSettings(conf_threshold=0.0, wildlife_only=False))
    return p


def test_create_rtsp_url_schemes():
    cam = {"ip": "10.0.0.5", "username": "u", "password": "p",
           "stream": "main", "protocol": "rtsp-tcp"}
    assert create_rtsp_url(cam) == "rtsp://u:p@10.0.0.5:554/h264Preview_01_main"
    cam["protocol"] = "h265"
    cam["stream"] = "sub"
    assert create_rtsp_url(cam) == "rtsp://u:p@10.0.0.5:554/h265Preview_01_sub"
    cam["protocol"] = "onvif"
    assert "onvif" in create_rtsp_url(cam)
    cam["protocol"] = "neolink"
    cam["id"] = "cam9"
    assert create_rtsp_url(cam) == "rtsp://10.0.0.5:8554/cam9/sub"
    assert create_rtsp_url({"url": "rtsp://explicit"}) == "rtsp://explicit"


def test_synthetic_capture_produces_frames():
    q = queue.Queue(maxsize=4)
    cap = SyntheticStreamCapture(q, width=64, height=48, fps=200, seed=1,
                                 camera_id="test")
    assert cap.start()
    item = q.get(timeout=2)
    cap.stop()
    assert item["frame"].shape == (48, 64, 3)
    assert item["camera_id"] == "test"
    assert {"frame", "timestamp", "frame_id", "camera_id", "camera_name"} <= set(item)
    stats = cap.get_stats()
    assert stats["frames_captured"] >= 1
    assert not stats["is_running"]


def test_capture_queue_drop_oldest():
    q = queue.Queue(maxsize=1)
    cap = SyntheticStreamCapture(q, width=16, height=16, fps=500, seed=0)
    cap.start()
    time.sleep(0.3)
    cap.stop()
    assert cap.frames_dropped > 0
    newest = q.get_nowait()
    assert newest["frame_id"] > 0  # oldest was evicted


def test_create_stream_capture_factory_synthetic():
    q = queue.Queue()
    cap = create_stream_capture(
        {"id": "s1", "protocol": "synthetic", "target_width": 32,
         "target_height": 32}, q)
    assert isinstance(cap, SyntheticStreamCapture)


def test_factory_plumbs_rtsp_retry_settings():
    # reference main.py:920 passes performance.rtsp_retry_delay into the
    # capture's reconnect sleep; rtsp_max_failures sets the failure cap.
    q = queue.Queue()
    cap = create_stream_capture(
        {"id": "f1", "protocol": "file", "path": "/nonexistent.mp4"}, q,
        performance={"rtsp_retry_delay": 2.5, "rtsp_max_failures": 7})
    assert cap.reconnect_delay == 2.5
    assert cap.max_failures == 7


def test_bucket_for():
    assert bucket_for(1) == 1
    assert bucket_for(3) == 4
    assert bucket_for(5) == 8
    assert bucket_for(17) == 32
    assert bucket_for(33) == 64
    assert bucket_for(100) == 64


def test_engine_standalone_end_to_end(program):
    in_q, out_q = queue.Queue(4), queue.Queue(16)
    engine = InferenceEngine(in_q, out_q, camera_id="e2e", program=program,
                             detection_config={"conf_threshold": 0.0,
                                               "wildlife_only": False,
                                               "min_box_area": 0})
    engine.start()
    frame = np.random.default_rng(0).integers(0, 256, (128, 128, 3), np.uint8)
    in_q.put({"frame": frame, "timestamp": time.time(), "frame_id": 0,
              "camera_id": "e2e", "camera_name": "E2E"})
    result = out_q.get(timeout=30)
    engine.stop()
    assert result["frame_id"] == 0
    assert result["camera_id"] == "e2e"
    assert isinstance(result["detections"], list)
    assert result["inference_time"] > 0
    assert engine.get_stats()["frames_processed"] == 1


def test_engine_sparse_gate_reuses_detections(program):
    in_q, out_q = queue.Queue(8), queue.Queue(16)
    engine = InferenceEngine(in_q, out_q, camera_id="sparse", program=program,
                             sparse_interval=3,
                             detection_config={"conf_threshold": 0.0,
                                               "wildlife_only": False})
    engine.start()
    frame = np.random.default_rng(1).integers(0, 256, (128, 128, 3), np.uint8)
    for i in range(3):
        in_q.put({"frame": frame, "timestamp": time.time(), "frame_id": i,
                  "camera_id": "sparse", "camera_name": ""})
    results = [out_q.get(timeout=120) for _ in range(3)]
    engine.stop()
    by_id = {r["frame_id"]: r for r in results}
    assert not by_id[0]["detections_reused"]
    assert by_id[1]["detections_reused"] and by_id[2]["detections_reused"]
    assert engine.frames_skipped_sparse == 2
    # reused results carry the keyframe's detections
    assert [d["bbox"] for d in by_id[1]["detections"]] == \
        [d["bbox"] for d in by_id[0]["detections"]]


def test_coordinator_batches_across_cameras(program):
    coord = SharedInferenceCoordinator(program, max_batch_size=4,
                                       max_batch_wait_ms=100.0)
    coord.start()
    results = {}
    done = []

    def make_cb(cam):
        def cb(rows):
            results[cam] = rows
            done.append(cam)
        return cb

    rng = np.random.default_rng(0)
    for cam in ("a", "b", "c"):
        frame = rng.integers(0, 256, (128, 128, 3), np.uint8)
        coord.infer_async(frame, make_cb(cam), cam)
    deadline = time.time() + 60
    while len(done) < 3 and time.time() < deadline:
        time.sleep(0.02)
    coord.stop()
    assert sorted(done) == ["a", "b", "c"]
    stats = coord.get_stats()
    assert stats["total_frames"] == 3
    assert stats["total_batches"] == 1  # one fused forward for all three
    assert stats["avg_batch_size"] == 3.0
    assert stats["bucket_counts"] == {4: 1}  # 3 frames pad to the 4 bucket
    assert results["a"].shape == (10, 7)


def test_coordinator_groups_by_resolution(program):
    coord = SharedInferenceCoordinator(program, max_batch_size=4,
                                       max_batch_wait_ms=50.0)
    coord.start()
    done = []
    rng = np.random.default_rng(0)
    coord.infer_async(rng.integers(0, 256, (128, 128, 3), np.uint8),
                      lambda r: done.append("small"), "a")
    coord.infer_async(rng.integers(0, 256, (96, 128, 3), np.uint8),
                      lambda r: done.append("large"), "b")
    deadline = time.time() + 60
    while len(done) < 2 and time.time() < deadline:
        time.sleep(0.02)
    coord.stop()
    assert sorted(done) == ["large", "small"]
    assert coord.get_stats()["total_batches"] == 2  # one per resolution group


def test_coordinator_drop_oldest_when_saturated(program):
    coord = SharedInferenceCoordinator(program, max_batch_size=1,
                                       max_batch_wait_ms=1.0)
    # don't start the thread: queue just fills
    dropped_rows = []
    frame = np.zeros((128, 128, 3), np.uint8)
    for i in range(coord.MAX_QUEUE_DEPTH + 5):
        coord.infer_async(frame, lambda rows, i=i: dropped_rows.append(i), "x")
    assert coord.total_dropped == 5
    assert len(coord._queue) == coord.MAX_QUEUE_DEPTH


def test_memory_manager_degrades_batch_limit():
    mm = MemoryManager()
    mm.memory_fraction = lambda: 0.5  # type: ignore
    mm.check_interval = 0.0
    assert mm.recommended_batch_limit(8) == 8
    mm.memory_fraction = lambda: 0.80  # type: ignore
    assert mm.recommended_batch_limit(8) == 4
    mm.memory_fraction = lambda: 0.90  # type: ignore
    assert mm.recommended_batch_limit(8) == 2
    mm.memory_fraction = lambda: 0.99  # type: ignore
    assert mm.recommended_batch_limit(8) == 1
    # hysteresis: dropping just below the threshold keeps the level
    mm.memory_fraction = lambda: 0.945  # type: ignore
    assert mm.check_memory_pressure() == MemoryPressure.EXTREME
    mm.memory_fraction = lambda: 0.5  # type: ignore
    assert mm.check_memory_pressure() == MemoryPressure.NORMAL
    assert mm.get_stats()["degradation_events"] >= 1


def test_processor_end_to_end_latency_and_counts():
    in_q, out_q = queue.Queue(4), queue.Queue(4)
    frame = np.zeros((32, 32, 3), np.uint8)
    proc = DetectionProcessor(in_q, out_q, camera_id="p1",
                              get_latest_frame=lambda: frame.copy())
    proc.start()
    t0 = time.time() - 0.05  # pretend capture was 50ms ago
    in_q.put({"frame_id": 1, "timestamp": t0, "camera_id": "p1",
              "camera_name": "P", "inference_time": 0.01,
              "detections": [
                  {"class_name": "cat", "confidence": 0.9,
                   "bbox": {"x1": 1, "y1": 1, "x2": 10, "y2": 10}},
                  {"class_name": "cat", "confidence": 0.8,
                   "bbox": {"x1": 20, "y1": 20, "x2": 30, "y2": 30}},
              ],
              "frame_shape": (32, 32, 3)})
    result = out_q.get(timeout=5)
    proc.stop()
    assert result["total_detections"] == 2
    assert result["detection_counts"] == {"cat": 2}
    assert result["total_latency_ms"] >= 50.0
    stats = proc.get_stats()
    assert stats["results_processed"] == 1
    assert stats["latency_ms_p50"] >= 50.0
    assert len(proc.history) == 1


def test_processor_skips_frame_copy_when_saver_disabled():
    """A DISABLED snapshot saver is still constructed (hot reload may
    enable it later) but consumes no pixels — the processor must not pay
    the latest-frame grab-and-copy for it (measured 26.8% of the host
    core at 8-cam 1440p before the fix)."""
    class DisabledSaver:
        enabled = False

    class EnabledSaver:
        enabled = True

        def maybe_save(self, *a, **k):
            return None

        def process(self, *a, **k):
            return None

    grabs = []

    def make(saver):
        in_q, out_q = queue.Queue(4), queue.Queue(4)
        proc = DetectionProcessor(
            in_q, out_q, camera_id="snap",
            get_latest_frame=lambda: grabs.append(1) or np.zeros(
                (8, 8, 3), np.uint8),
            snapshot_saver=saver)
        return proc

    assert make(DisabledSaver())._needs_frame() is False
    assert make(EnabledSaver())._needs_frame() is True
    assert make(None)._needs_frame() is False


def test_processor_strips_gated_transport_fields():
    """motion_ratio/motion_pixels/species_raw are gated-program transport,
    not reference output — the processor must strip them before the result
    reaches the wire (even with no motion filter / Stage-2 configured)."""
    in_q, out_q = queue.Queue(4), queue.Queue(4)
    frame = np.zeros((32, 32, 3), np.uint8)
    proc = DetectionProcessor(in_q, out_q, camera_id="p2",
                              get_latest_frame=lambda: frame.copy())
    proc.start()
    in_q.put({"frame_id": 1, "timestamp": time.time(), "camera_id": "p2",
              "camera_name": "P", "inference_time": 0.01,
              "detections": [
                  {"class_name": "cat", "confidence": 0.9,
                   "bbox": {"x1": 1, "y1": 1, "x2": 10, "y2": 10},
                   "motion_ratio": 0.5, "motion_pixels": 12.0,
                   "species_raw": ([3], [0.9])},
              ],
              "frame_shape": (32, 32, 3)})
    result = out_q.get(timeout=5)
    proc.stop()
    det = result["detections"][0]
    assert "motion_ratio" not in det
    assert "motion_pixels" not in det
    assert "species_raw" not in det
    assert det["class_name"] == "cat"


def test_full_pipeline_capture_to_detection(program):
    """Synthetic camera -> engine (standalone) -> processor -> detection queue."""
    frame_q, infer_q, det_q = (queue.Queue(2), queue.Queue(10), queue.Queue(10))
    cap = SyntheticStreamCapture(frame_q, width=128, height=128, fps=30,
                                 seed=0, camera_id="full")
    engine = InferenceEngine(frame_q, infer_q, camera_id="full",
                             program=program,
                             detection_config={"conf_threshold": 0.0,
                                               "wildlife_only": False})
    proc = DetectionProcessor(infer_q, det_q, camera_id="full",
                              get_latest_frame=cap.get_latest_frame)
    cap.start()
    engine.start()
    proc.start()
    result = det_q.get(timeout=60)
    proc.stop()
    engine.stop()
    cap.stop()
    assert result["camera_id"] == "full"
    assert "total_latency_ms" in result
    assert isinstance(result["detections"], list)


def test_engine_wildlife_only_per_camera(program):
    """Per-camera wildlife_only must filter non-wildlife classes host-side
    (regression: the setting was stored but never enforced)."""
    from telescope_cam_detection_tpu.runtime.engine import InferenceEngine
    engine = InferenceEngine(queue.Queue(1), queue.Queue(1), program=program,
                             detection_config={"conf_threshold": 0.0,
                                               "wildlife_only": True,
                                               "min_box_area": 0})
    dets = [
        {"class_id": 15, "class_name": "cat", "confidence": 0.9,
         "bbox": {"x1": 0, "y1": 0, "x2": 10, "y2": 10}},
        {"class_id": 2, "class_name": "car", "confidence": 0.9,
         "bbox": {"x1": 0, "y1": 0, "x2": 10, "y2": 10}},
    ]
    out = engine._apply_camera_filters(dets)
    assert [d["class_name"] for d in out] == ["cat"]
    engine.update_settings({"wildlife_only": False})
    out = engine._apply_camera_filters([dict(d) for d in dets])
    assert len(out) == 2


def test_system_filter_floor():
    """Shared device filters must take the loosest per-camera thresholds."""
    from telescope_cam_detection_tpu.system import TelescopeDetectionSystem
    detection = {"conf_threshold": 0.5, "min_box_area": 100,
                 "wildlife_only": True,
                 "class_confidence_overrides": {"person": 0.9}}
    cameras = [
        {"id": "a", "enabled": True,
         "detection_overrides": {"conf_threshold": 0.2,
                                 "class_confidence_overrides": {"bird": 0.4}}},
        {"id": "b", "enabled": True,
         "detection_overrides": {"min_box_area": 10, "wildlife_only": False}},
    ]
    floor = TelescopeDetectionSystem._compute_filter_floor(detection, cameras)
    assert floor.conf_threshold == 0.2
    assert floor.min_box_area == 10
    assert floor.wildlife_only is False          # one camera wants all classes
    # person: the global 0.9 override merges into every camera -> floor 0.9
    assert floor.class_confidence_overrides["person"] == 0.9
    # bird: cam a overrides 0.4; cam b has no bird override so its base 0.5
    # applies -> floor 0.4
    assert floor.class_confidence_overrides["bird"] == 0.4


def test_engine_class_size_constraints(program):
    """Per-class min/max box-area constraints must filter host-side and be
    hot-reloadable (reference inference_engine_yolox.py:523-528, :699-701)."""
    from telescope_cam_detection_tpu.runtime.engine import InferenceEngine
    engine = InferenceEngine(
        queue.Queue(1), queue.Queue(1), program=program,
        detection_config={"conf_threshold": 0.0, "wildlife_only": False,
                          "min_box_area": 0,
                          "class_size_constraints": {
                              "bird": {"max": 6000},
                              "bear": {"min": 5000}}})

    def det(name, cid, side):
        return {"class_id": cid, "class_name": name, "confidence": 0.9,
                "bbox": {"x1": 0, "y1": 0, "x2": side, "y2": side}}

    dets = [det("bird", 14, 50),    # 2500 px^2 <= 6000: keep
            det("bird", 14, 100),   # 10000 px^2 > 6000: drop
            det("bear", 21, 50),    # 2500 px^2 < 5000: drop
            det("bear", 21, 100),   # 10000 px^2 >= 5000: keep
            det("cat", 15, 100)]    # unconstrained: keep
    out = engine._apply_camera_filters([dict(d) for d in dets])
    kept = [(d["class_name"], d["bbox"]["area"]) for d in out]
    assert kept == [("bird", 2500.0), ("bear", 10000.0), ("cat", 10000.0)]

    updated = engine.update_settings({"class_size_constraints": {}})
    assert "class_size_constraints" in updated
    out = engine._apply_camera_filters([dict(d) for d in dets])
    assert len(out) == 5


def test_system_filter_floor_class_size():
    """Device size floor = loosest constraint across cameras; a camera
    without the constraint loosens that side to unbounded."""
    from telescope_cam_detection_tpu.system import TelescopeDetectionSystem
    detection = {"conf_threshold": 0.5,
                 "class_size_constraints": {"bird": {"max": 8000},
                                            "bear": {"min": 5000}}}
    cameras = [
        {"id": "a", "enabled": True,
         "detection_overrides": {"class_size_constraints": {
             "bird": {"max": 6000}}}},
        {"id": "b", "enabled": True},
    ]
    floor = TelescopeDetectionSystem._compute_filter_floor(detection, cameras)
    # bird: max(6000, 8000) = 8000 ceiling; no camera sets a min -> lo 0
    assert floor.class_size_limits["bird"] == (0.0, 8000.0)
    # bear: both cameras inherit the global min 5000 -> floor 5000
    assert floor.class_size_limits["bear"] == (5000.0, float("inf"))
    # device arrays reflect the floor
    arrays = floor.to_arrays(80)
    from telescope_cam_detection_tpu.coco_constants import COCO_CLASSES
    import numpy as np
    assert float(arrays["max_area"][COCO_CLASSES.index("bird")]) == 8000.0
    assert float(arrays["min_area"][COCO_CLASSES.index("bear")]) == 5000.0
