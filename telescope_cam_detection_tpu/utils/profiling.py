"""Sampling CPU profiler for the serving path (all threads).

cProfile instruments only the thread that calls enable(), which makes it
blind to a threaded serving pipeline (capture/coordinator/processor/web
threads do the work while the profiled thread sleeps). This sampler walks
``sys._current_frames()`` on a timer instead — every live thread's stack,
no per-call overhead on the profiled code, same idea as py-spy but
in-process and dependency-free.

No reference analog (the reference ships no profiler; its `--profile`
flag wraps cProfile around the single-threaded main, main.py). The TPU
framework's serving path is deliberately multi-threaded, so this is the
tool that answers "where does the host core go".
"""
from __future__ import annotations

import sys
import threading
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional


class StackSampler:
    """Periodically sample every thread's Python stack.

    Aggregates two counters per function (module:qualname:lineno of the
    function's def):

    * ``own``: samples where the function was the innermost frame — where
      the CPU (or a blocking call) actually sits;
    * ``total``: samples where it appeared anywhere on the stack.

    ``interval`` trades resolution for overhead; 5 ms ≈ 200 Hz costs well
    under 1% of one core for a dozen threads.
    """

    def __init__(self, interval: float = 0.005,
                 skip_idle: bool = True) -> None:
        self.interval = float(interval)
        # drop frames that are just the sampler itself / thread bookkeeping
        self.skip_idle = skip_idle
        self._own: Dict[str, int] = defaultdict(int)
        self._total: Dict[str, int] = defaultdict(int)
        self._samples = 0
        self._thread_samples: Dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._t0 = 0.0
        self._elapsed = 0.0

    # ------------------------------------------------------------- lifecycle
    def start(self) -> None:
        if self._thread is not None:
            raise RuntimeError("sampler already started")
        self._stop.clear()
        self._t0 = time.perf_counter()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="stack-sampler")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None
        self._elapsed = time.perf_counter() - self._t0

    # --------------------------------------------------------------- sampling
    def _run(self) -> None:
        me = threading.get_ident()
        names = {}  # ident -> thread name (refreshed each pass)
        while not self._stop.wait(self.interval):
            names = {t.ident: t.name for t in threading.enumerate()}
            frames = sys._current_frames()
            with self._lock:
                self._samples += 1
                for ident, frame in frames.items():
                    if ident == me:
                        continue
                    leaf = True
                    seen = set()
                    f = frame
                    thread_name = names.get(ident, str(ident))
                    counted_thread = False
                    while f is not None:
                        code = f.f_code
                        key = (f"{code.co_filename}:{code.co_name}:"
                               f"{code.co_firstlineno}")
                        if leaf:
                            if self.skip_idle and _is_idle_wait(code.co_name):
                                # blocked in a lock/queue/sleep: attribute
                                # the own-sample to the first frame that is
                                # OUR code (what is waiting, not the wait)
                                leaf = False
                            else:
                                self._own[key] += 1
                                leaf = False
                                counted_thread = True
                        elif not counted_thread and _in_repo(code.co_filename):
                            self._own[key] += 1
                            counted_thread = True
                        if key not in seen:  # recursion: count once
                            self._total[key] += 1
                            seen.add(key)
                        f = f.f_back
                    if counted_thread:
                        self._thread_samples[thread_name] += 1

    # ---------------------------------------------------------------- report
    def report(self, top: int = 25) -> Dict[str, Any]:
        with self._lock:
            samples = self._samples
            own = dict(self._own)
            total = dict(self._total)
            threads = dict(self._thread_samples)
        elapsed = self._elapsed or (time.perf_counter() - self._t0)

        def rows(counter: Dict[str, int]) -> List[Dict[str, Any]]:
            out = []
            for key, n in sorted(counter.items(), key=lambda kv: -kv[1])[:top]:
                path, func, line = key.rsplit(":", 2)
                out.append({
                    "function": func,
                    "location": f"{_short(path)}:{line}",
                    "samples": n,
                    "pct": round(100.0 * n / samples, 1) if samples else 0.0,
                })
            return out

        return {
            "samples": samples,
            "interval_ms": self.interval * 1000.0,
            "elapsed_s": round(elapsed, 2),
            "busiest_threads": dict(
                sorted(threads.items(), key=lambda kv: -kv[1])[:top]),
            # own: where the CPU/blocking call sits; total: inclusive
            "own": rows(own),
            "total": rows(total),
        }

    def format_report(self, top: int = 25) -> str:
        rep = self.report(top)
        lines = [f"{rep['samples']} samples @ {rep['interval_ms']:.0f} ms "
                 f"over {rep['elapsed_s']}s",
                 f"busiest threads: {rep['busiest_threads']}",
                 f"{'own%':>6} {'incl%':>6}  function (location)"]
        incl = {r["function"] + r["location"]: r["pct"] for r in rep["total"]}
        for r in rep["own"]:
            lines.append(f"{r['pct']:>6} "
                         f"{incl.get(r['function'] + r['location'], ''):>6}"
                         f"  {r['function']} ({r['location']})")
        return "\n".join(lines)


_IDLE_NAMES = frozenset({
    "wait", "acquire", "get", "select", "poll", "sleep", "recv", "recv_into",
    "accept", "read", "readinto", "_recv", "settimeout", "wait_for",
})


def _is_idle_wait(func_name: str) -> bool:
    return func_name in _IDLE_NAMES


_REPO_MARK = "telescope_cam_detection_tpu"


def _in_repo(path: str) -> bool:
    return _REPO_MARK in path


def _short(path: str) -> str:
    if _REPO_MARK in path:
        return _REPO_MARK + path.split(_REPO_MARK, 1)[1]
    return path.rsplit("/", 1)[-1]
