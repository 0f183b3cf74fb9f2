"""Alert delivery for camera-health events.

The reference declares alert hooks but ships them as TODO stubs
(``camera_health_monitor.py``: the alert-hook block under
``_handle_unhealthy_camera`` never posts anywhere). This implements them:
the health monitor emits structured transition events (see
``runtime/health.py``) and a ``WebhookAlerter`` delivers them as JSON
POSTs — queued through a worker thread so a slow or dead alert endpoint
can NEVER stall the monitor loop, rate-limited per (camera, event) so a
flapping camera doesn't flood the receiver.

Config (``camera_health.alerts``)::

    alerts:
      webhook_url: https://example.test/hook   # required to enable
      min_interval_seconds: 300                # per camera+event class
      timeout_seconds: 5
"""
from __future__ import annotations

import json
import logging
import queue
import threading
import time
import urllib.request
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


class WebhookAlerter:
    """POST health events to a webhook, asynchronously and rate-limited."""

    QUEUE_CAP = 100  # alerts beyond this are dropped with a log line

    def __init__(self, url: str, min_interval_seconds: float = 300.0,
                 timeout_seconds: float = 5.0) -> None:
        if not url.startswith(("http://", "https://")):
            raise ValueError(f"webhook_url must be http(s), got {url!r}")
        self.url = url
        self.min_interval = float(min_interval_seconds)
        self.timeout = float(timeout_seconds)
        self._last_sent: Dict[tuple, float] = {}
        self._queue: "queue.Queue[Optional[Dict[str, Any]]]" = queue.Queue(
            maxsize=self.QUEUE_CAP)
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()
        self.stats = {"sent": 0, "failed": 0, "rate_limited": 0,
                      "dropped": 0}

    # ------------------------------------------------------------- lifecycle
    def start(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            return
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="alert-webhook")
        self._thread.start()

    def stop(self) -> None:
        try:
            self._queue.put_nowait(None)
        except queue.Full:
            pass  # worker will drain and see the daemon flag die with us
        if self._thread is not None:
            self._thread.join(timeout=self.timeout + 1.0)
            self._thread = None

    # ---------------------------------------------------------------- emit
    def __call__(self, event: Dict[str, Any]) -> None:
        """Alert-callback entry (called from the health monitor thread).

        Never blocks: rate-limit check + queue put_nowait only.
        """
        key = (event.get("camera_id"), event.get("event"))
        now = time.monotonic()
        with self._lock:
            last = self._last_sent.get(key)
            if last is not None and now - last < self.min_interval:
                self.stats["rate_limited"] += 1
                return
            self._last_sent[key] = now
        try:
            self._queue.put_nowait(dict(event))
        except queue.Full:
            self.stats["dropped"] += 1
            logger.warning("alert queue full; dropped %s for %s",
                           event.get("event"), event.get("camera_id"))

    # -------------------------------------------------------------- worker
    def _worker(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            body = json.dumps(item).encode()
            req = urllib.request.Request(
                self.url, data=body,
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=self.timeout):
                    pass
                self.stats["sent"] += 1
            except Exception as e:
                self.stats["failed"] += 1
                logger.warning("alert webhook POST failed (%s): %s",
                               item.get("event"), e)


def build_alerter(alerts_cfg: Optional[Dict[str, Any]]):
    """Config -> started WebhookAlerter, or None when not configured.

    A configured-but-invalid URL raises (fail at startup, not at first
    alert — same discipline as detector/classifier weight loading).
    """
    cfg = alerts_cfg or {}
    url = cfg.get("webhook_url")
    if not url:
        return None
    alerter = WebhookAlerter(
        url,
        min_interval_seconds=cfg.get("min_interval_seconds", 300.0),
        timeout_seconds=cfg.get("timeout_seconds", 5.0))
    alerter.start()
    return alerter
