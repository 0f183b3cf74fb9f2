"""Sampling CPU profiler for the serving path (all threads).

cProfile instruments only the thread that calls enable(), which makes it
blind to a threaded serving pipeline (capture/coordinator/processor/web
threads do the work while the profiled thread sleeps). This sampler walks
``sys._current_frames()`` on a timer instead — every live thread's stack,
no per-call overhead on the profiled code.

Pure stack *counting* has a blind spot of its own: a thread blocked in a
C call (``SimpleQueue.get``, ``time.sleep``, a socket recv) shows the
same Python leaf frame as a thread burning CPU under that frame, so idle
pools read as busy. So each sample is **weighted by the thread's CPU-time
delta** read from ``/proc/self/task/<native_id>/stat`` (utime+stime):
stacks only accumulate weight when their thread actually spent CPU since
the previous sample. Wall-clock presence is tracked separately as
``waiting`` (which framework code sits blocked) — useful for spotting
stalls, but never conflated with CPU.

No reference analog (the reference ships no profiler; its `--profile`
flag wraps cProfile around the single-threaded main, main.py). The TPU
framework's serving path is deliberately multi-threaded, so this is the
tool that answers "where does the host core go".
"""
from __future__ import annotations

import logging
import os
import sys
import threading
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)

_TICKS_PER_SEC = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _thread_cpu_ticks(native_id: int) -> Optional[int]:
    """utime+stime clock ticks for one OS thread of this process."""
    try:
        with open(f"/proc/self/task/{native_id}/stat", "rb") as f:
            data = f.read()
        # fields after the parenthesised comm (which may contain spaces)
        rest = data.rsplit(b")", 1)[1].split()
        return int(rest[11]) + int(rest[12])  # utime, stime
    except (OSError, IndexError, ValueError):
        return None


class StackSampler:
    """Periodically sample every thread's stack, weighted by CPU time.

    Per function (module:qualname:lineno of the def), in CPU milliseconds:

    * ``own``: the function was the innermost frame while its thread
      burned CPU — where the core actually goes;
    * ``total``: it was anywhere on a CPU-burning stack (inclusive).

    Plus ``waiting``: wall-clock samples where a framework function sat
    blocked (leaf in a known wait, or zero CPU delta) — stall evidence,
    reported separately.

    ``interval`` trades resolution for overhead; 5 ms ≈ 200 Hz costs well
    under 1% of one core for a few dozen threads.
    """

    def __init__(self, interval: float = 0.005) -> None:
        self.interval = float(interval)
        self._own: Dict[str, float] = defaultdict(float)      # CPU ms
        self._total: Dict[str, float] = defaultdict(float)    # CPU ms
        self._waiting: Dict[str, int] = defaultdict(int)      # samples
        self._thread_cpu: Dict[str, float] = defaultdict(float)
        self._prev_ticks: Dict[int, int] = {}
        self._samples = 0
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
        tick_ms = 1000.0 / _TICKS_PER_SEC
        while not self._stop.wait(self.interval):
            threads = {t.ident: t for t in threading.enumerate()}
            frames = sys._current_frames()
            with self._lock:
                self._samples += 1
                for ident, frame in frames.items():
                    if ident == me:
                        continue
                    t = threads.get(ident)
                    nid = getattr(t, "native_id", None) if t else None
                    cpu_ms = 0.0
                    if nid is not None:
                        ticks = _thread_cpu_ticks(nid)
                        if ticks is not None:
                            prev = self._prev_ticks.get(nid)
                            self._prev_ticks[nid] = ticks
                            if prev is not None and ticks > prev:
                                cpu_ms = (ticks - prev) * tick_ms
                    name = t.name if t else str(ident)
                    if cpu_ms > 0.0:
                        self._thread_cpu[name] += cpu_ms
                        self._credit_cpu(frame, cpu_ms)
                    else:
                        self._credit_waiting(frame)

    def _credit_cpu(self, frame, cpu_ms: float) -> None:
        leaf = True
        seen = set()
        f = frame
        while f is not None:
            code = f.f_code
            key = (f"{code.co_filename}:{code.co_name}:"
                   f"{code.co_firstlineno}")
            if leaf:
                self._own[key] += cpu_ms
                leaf = False
            if key not in seen:  # recursion: count once
                self._total[key] += cpu_ms
                seen.add(key)
            f = f.f_back

    def _credit_waiting(self, frame) -> None:
        # attribute the blocked sample to the innermost FRAMEWORK frame:
        # "processor._loop is waiting", not "queue.get is waiting"
        f = frame
        while f is not None:
            code = f.f_code
            if _in_repo(code.co_filename):
                key = (f"{code.co_filename}:{code.co_name}:"
                       f"{code.co_firstlineno}")
                self._waiting[key] += 1
                return
            f = f.f_back

    # ---------------------------------------------------------------- report
    def report(self, top: int = 25) -> Dict[str, Any]:
        with self._lock:
            samples = self._samples
            own = dict(self._own)
            total = dict(self._total)
            waiting = dict(self._waiting)
            thread_cpu = dict(self._thread_cpu)
        elapsed = self._elapsed or (time.perf_counter() - self._t0)
        wall_ms = elapsed * 1000.0

        def cpu_rows(counter: Dict[str, float]) -> List[Dict[str, Any]]:
            out = []
            for key, ms in sorted(counter.items(), key=lambda kv: -kv[1])[:top]:
                path, func, line = key.rsplit(":", 2)
                out.append({
                    "function": func,
                    "location": f"{_short(path)}:{line}",
                    "cpu_ms": round(ms, 1),
                    # % of one core over the window
                    "pct": round(100.0 * ms / wall_ms, 1) if wall_ms else 0.0,
                })
            return out

        wait_rows = []
        for key, n in sorted(waiting.items(), key=lambda kv: -kv[1])[:top]:
            path, func, line = key.rsplit(":", 2)
            wait_rows.append({
                "function": func,
                "location": f"{_short(path)}:{line}",
                "samples": n,
                "pct": round(100.0 * n / samples, 1) if samples else 0.0,
            })

        return {
            "samples": samples,
            "interval_ms": self.interval * 1000.0,
            "elapsed_s": round(elapsed, 2),
            "total_cpu_ms": round(sum(thread_cpu.values()), 1),
            "busiest_threads_cpu_ms": {
                k: round(v, 1) for k, v in sorted(
                    thread_cpu.items(), key=lambda kv: -kv[1])[:top]},
            "own": cpu_rows(own),       # CPU, innermost frame
            "total": cpu_rows(total),   # CPU, inclusive
            "waiting": wait_rows,       # wall samples blocked (framework)
        }

    def format_report(self, top: int = 25) -> str:
        rep = self.report(top)
        lines = [f"{rep['samples']} samples @ {rep['interval_ms']:.0f} ms "
                 f"over {rep['elapsed_s']}s; "
                 f"process CPU {rep['total_cpu_ms']:.0f} ms "
                 f"({100 * rep['total_cpu_ms'] / (rep['elapsed_s'] * 1000 or 1):.0f}% of one core)",
                 f"busiest threads (CPU ms): {rep['busiest_threads_cpu_ms']}",
                 f"{'own%':>6} {'incl%':>6}  CPU function (location)"]
        incl = {r["function"] + r["location"]: r["pct"] for r in rep["total"]}
        for r in rep["own"]:
            lines.append(f"{r['pct']:>6} "
                         f"{incl.get(r['function'] + r['location'], ''):>6}"
                         f"  {r['function']} ({r['location']})")
        lines.append(f"{'wait%':>6}  blocked framework function (location)")
        for r in rep["waiting"][:10]:
            lines.append(f"{r['pct']:>6}  {r['function']} ({r['location']})")
        return "\n".join(lines)


_REPO_MARK = "telescope_cam_detection_tpu"


def _in_repo(path: str) -> bool:
    return _REPO_MARK in path


def _short(path: str) -> str:
    if _REPO_MARK in path:
        return _REPO_MARK + path.split(_REPO_MARK, 1)[1]
    return path.rsplit("/", 1)[-1]
