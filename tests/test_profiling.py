"""StackSampler: the all-thread sampling CPU profiler.

cProfile instruments one thread; the serving pipeline is many. The
sampler must (a) catch a busy function running in a NON-calling thread,
(b) attribute blocked-in-queue.get samples to the waiting repo code, not
to queue.get itself, (c) produce a stable report shape for the
/api/profiler/cpu endpoint.
"""
import threading
import time

from telescope_cam_detection_tpu.utils.profiling import StackSampler


def _spin(stop, out):
    x = 0
    while not stop.is_set():
        for i in range(10000):
            x += i * i
    out.append(x)


def test_sampler_catches_busy_thread():
    stop = threading.Event()
    out = []
    t = threading.Thread(target=_spin, args=(stop, out), daemon=True)
    sampler = StackSampler(interval=0.002)
    sampler.start()
    t.start()
    time.sleep(0.6)
    sampler.stop()
    stop.set()
    t.join(timeout=5)
    rep = sampler.report(top=10)
    assert rep["samples"] > 50
    own = {r["function"]: r["pct"] for r in rep["own"]}
    # the spin loop runs in a thread the sampler never called into
    assert "_spin" in own and own["_spin"] > 30.0
    # report shape consumed by /api/profiler/cpu and bench_full_system
    for row in rep["own"] + rep["total"]:
        assert set(row) == {"function", "location", "samples", "pct"}
    assert "busiest_threads" in rep and rep["interval_ms"] == 2.0
    text = sampler.format_report(5)
    assert "_spin" in text


def test_sampler_total_includes_callers():
    stop = threading.Event()
    out = []

    def outer(stop, out):
        _spin(stop, out)

    t = threading.Thread(target=outer, args=(stop, out), daemon=True)
    sampler = StackSampler(interval=0.002)
    sampler.start()
    t.start()
    time.sleep(0.4)
    sampler.stop()
    stop.set()
    t.join(timeout=5)
    rep = sampler.report(top=20)
    total = {r["function"] for r in rep["total"]}
    # inclusive view sees the whole chain; own view only the leaf
    assert "outer" in total and "_spin" in total
    own = {r["function"]: r["pct"] for r in rep["own"]}
    assert own.get("outer", 0.0) < own["_spin"]


def test_sampler_restart_rejected_while_running():
    sampler = StackSampler(interval=0.01)
    sampler.start()
    try:
        try:
            sampler.start()
            raised = False
        except RuntimeError:
            raised = True
        assert raised
    finally:
        sampler.stop()
    # after stop, a fresh start is fine
    sampler2 = StackSampler(interval=0.01)
    sampler2.start()
    sampler2.stop()
