"""Automatic config hot-reload on file change.

The reference documents this as a *planned* feature — schema
``system.hot_reload.{enabled, watch_files, auto_reload_interval_seconds}``
(reference docs/features/HOT_RELOAD_CONFIG.md "Automatic File Watching
(Planned)") — and ships the ``watchdog`` dependency unused
(reference requirements.txt:31); its reload is endpoint-only
(reference web_server.py:693). This implements that planned surface with
a dependency-free mtime/size poller:

  * ``watch_files: true`` — poll the config file (and the merged
    camera_credentials.yaml) every ``poll_interval_seconds``; when the
    (mtime_ns, size) signature changes AND holds stable for one further
    poll (debounce: editors and ``cp`` are not atomic, and reloading a
    half-written YAML would reject the whole reload), trigger a reload.
  * ``auto_reload_interval_seconds: N`` — additionally trigger an
    unconditional periodic reload every N seconds (0 disables), the
    reference's second planned knob.

Reload goes through the same ``TelescopeDetectionSystem.reload_config``
path the REST endpoint uses (serialized by its ``_reload_lock``), so a
watcher-triggered reload has identical semantics: validation failures and
half-written files leave the running config untouched and are logged.
"""
from __future__ import annotations

import logging
import os
import threading
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

from telescope_cam_detection_tpu.constants import THREAD_JOIN_TIMEOUT_SECONDS

logger = logging.getLogger(__name__)

_Signature = Tuple[Optional[Tuple[int, int]], ...]


class ConfigFileWatcher:
    """Polls config file signatures and fires ``reload_callback`` on change.

    reload_callback returns the reload result dict
    ({success, reloaded, requires_restart, warnings, errors}) — the watcher
    only logs it; state rollback/validation live in the callback.
    """

    def __init__(
        self,
        paths: Sequence[str],
        reload_callback: Callable[[], Dict[str, Any]],
        poll_interval: float = 2.0,
        auto_reload_interval: float = 0.0,
    ):
        self.paths = [str(p) for p in paths]
        self.reload_callback = reload_callback
        self.poll_interval = max(float(poll_interval), 0.05)
        self.auto_reload_interval = max(float(auto_reload_interval), 0.0)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._rebaseline = threading.Event()
        self.stats: Dict[str, Any] = {
            "reloads_triggered": 0, "reload_failures": 0,
            "last_trigger": None, "watching": list(self.paths)}

    # ------------------------------------------------------------- signature
    def _signature(self) -> _Signature:
        sig = []
        for p in self.paths:
            try:
                st = os.stat(p)
                sig.append((st.st_mtime_ns, st.st_size))
            except OSError:
                # missing file is a state too: deletion then re-creation
                # (sed -i, rename-into-place) must register as a change
                sig.append(None)
        return tuple(sig)

    # ------------------------------------------------------------- lifecycle
    def start(self) -> None:
        if self._thread is not None:
            logger.warning("config watcher already started")
            return
        self._stop.clear()
        # baseline BEFORE the thread exists: an edit racing start() must
        # register as a change, not be absorbed into the first signature
        self._baseline = self._signature()
        self._thread = threading.Thread(
            target=self._watch_loop, name="config-watcher", daemon=True)
        self._thread.start()
        logger.info(
            "config watcher started: %s (poll %.1fs%s)",
            ", ".join(self.paths), self.poll_interval,
            f", periodic reload {self.auto_reload_interval:.0f}s"
            if self.auto_reload_interval else "")

    def stop(self) -> None:
        if self._thread is None:
            return
        self._stop.set()
        self._thread.join(timeout=THREAD_JOIN_TIMEOUT_SECONDS)
        if self._thread.is_alive():
            logger.critical("config watcher thread leaked (join timeout)")
        self._thread = None

    # ------------------------------------------------------------- loop
    def mark_clean(self) -> None:
        """Adopt the files' CURRENT state as the baseline: a caller that
        just wrote the config through the same reload path (the web
        editor's save) uses this so the watcher doesn't re-trigger a
        redundant reload of content already applied."""
        self._rebaseline.set()

    def _watch_loop(self) -> None:
        last_sig = self._baseline
        pending_sig: Optional[_Signature] = None
        last_periodic = time.monotonic()
        while not self._stop.wait(self.poll_interval):
            reason = None
            sig = self._signature()
            if self._rebaseline.is_set():
                self._rebaseline.clear()
                last_sig = sig
                pending_sig = None
                continue
            if pending_sig is not None:
                if sig == pending_sig:
                    # stable across a full poll interval: writer is done
                    reason = "file change"
                    last_sig = sig
                    pending_sig = None
                else:
                    pending_sig = sig  # still being written; keep waiting
            elif sig != last_sig:
                pending_sig = sig
            if (reason is None and self.auto_reload_interval
                    and time.monotonic() - last_periodic
                    >= self.auto_reload_interval):
                reason = "periodic"
            if reason is not None:
                last_periodic = time.monotonic()
                self._trigger(reason)

    def _trigger(self, reason: str) -> None:
        self.stats["reloads_triggered"] += 1
        self.stats["last_trigger"] = reason
        try:
            result = self.reload_callback() or {}
        except Exception:
            self.stats["reload_failures"] += 1
            logger.exception("auto-reload (%s) raised", reason)
            return
        if result.get("errors"):
            self.stats["reload_failures"] += 1
            logger.warning("auto-reload (%s) rejected, config unchanged: %s",
                           reason, "; ".join(map(str, result["errors"])))
            return
        reloaded = result.get("reloaded") or []
        restart = result.get("requires_restart") or []
        logger.info("auto-reload (%s): %d setting(s) applied%s", reason,
                    len(reloaded),
                    f"; restart required for: {', '.join(restart)}"
                    if restart else "")

    def get_stats(self) -> Dict[str, Any]:
        return dict(self.stats)
