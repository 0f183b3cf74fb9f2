"""StackSampler: the all-thread, CPU-time-weighted sampling profiler.

cProfile instruments one thread; the serving pipeline is many. Pure
stack counting has its own blind spot: a thread blocked in a C call
(SimpleQueue.get, time.sleep) shows the same Python leaf as one burning
CPU there. The sampler therefore weights stacks by per-OS-thread CPU
deltas from /proc/self/task/<tid>/stat. It must (a) catch a busy
function running in a NON-calling thread, (b) NOT credit CPU to a
sleeping thread, (c) report blocked framework code under `waiting`,
(d) produce a stable report shape for /api/profiler/cpu.
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


def _sleepy(stop):
    while not stop.is_set():
        time.sleep(0.02)


def test_sampler_credits_cpu_to_busy_thread_not_sleeper():
    stop = threading.Event()
    out = []
    busy = threading.Thread(target=_spin, args=(stop, out), daemon=True,
                            name="busy-worker")
    idle = threading.Thread(target=_sleepy, args=(stop,), daemon=True,
                            name="idle-worker")
    sampler = StackSampler(interval=0.002)
    sampler.start()
    busy.start()
    idle.start()
    time.sleep(0.8)
    sampler.stop()
    stop.set()
    busy.join(timeout=5)
    idle.join(timeout=5)
    rep = sampler.report(top=10)
    assert rep["samples"] > 50
    own = {r["function"]: r["pct"] for r in rep["own"]}
    # the spin loop runs in a thread the sampler never called into, and
    # owns most of the core; the sleeper earns (almost) no CPU
    assert own.get("_spin", 0.0) > 30.0
    assert own.get("_sleepy", 0.0) < 5.0
    threads = rep["busiest_threads_cpu_ms"]
    assert threads.get("busy-worker", 0.0) > 10 * threads.get(
        "idle-worker", 0.0) + 1.0
    # report shape consumed by /api/profiler/cpu and bench_full_system
    for row in rep["own"] + rep["total"]:
        assert set(row) == {"function", "location", "cpu_ms", "pct"}
    for row in rep["waiting"]:
        assert set(row) == {"function", "location", "samples", "pct"}
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
    time.sleep(0.5)
    sampler.stop()
    stop.set()
    t.join(timeout=5)
    rep = sampler.report(top=20)
    total = {r["function"] for r in rep["total"]}
    # inclusive view sees the whole chain; own view only the leaf
    assert "outer" in total and "_spin" in total
    own = {r["function"]: r["pct"] for r in rep["own"]}
    assert own.get("outer", 0.0) < own["_spin"]


def test_sampler_reports_blocked_framework_code_as_waiting():
    # a framework-file function blocked in a wait must show up under
    # `waiting`, not as CPU. StackSampler.stop() itself blocks in
    # thread.join while running from framework code — use a helper thread
    # running a utils.profiling-file function that sleeps.
    from telescope_cam_detection_tpu.utils import profiling as mod

    stop = threading.Event()

    def framework_sleeper():  # defined into the framework module below
        while not stop.is_set():
            time.sleep(0.02)

    framework_sleeper.__code__ = framework_sleeper.__code__.replace(
        co_filename=mod.__file__)
    t = threading.Thread(target=framework_sleeper, daemon=True)
    sampler = StackSampler(interval=0.002)
    sampler.start()
    t.start()
    time.sleep(0.4)
    sampler.stop()
    stop.set()
    t.join(timeout=5)
    rep = sampler.report(top=20)
    waiting = {r["function"]: r["pct"] for r in rep["waiting"]}
    assert waiting.get("framework_sleeper", 0.0) > 50.0
    own = {r["function"]: r["pct"] for r in rep["own"]}
    assert own.get("framework_sleeper", 0.0) < 5.0


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
