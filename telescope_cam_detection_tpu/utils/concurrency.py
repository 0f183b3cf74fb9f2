"""Key-serialized executor: per-key FIFO order, cross-key parallelism.

The coordinator's result callbacks carry per-camera post-processing and
Stage-2 classification. The reference ran these on the coordinator thread
itself (inference_engine_yolox.py:390-442, serializing EVERYTHING); round 1
used a single worker (still serializing all cameras against each other).
This executor gives each key (camera) a strict FIFO lane while different
keys run concurrently on a shared thread pool — camera A's classification
can overlap camera B's, but a camera's results never reorder.
"""
from __future__ import annotations

import logging
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Deque, Dict, Hashable, Set

logger = logging.getLogger(__name__)


class KeySerialExecutor:
    def __init__(self, max_workers: int = 4,
                 thread_name_prefix: str = "keyserial"):
        self._pool = ThreadPoolExecutor(max_workers=max_workers,
                                        thread_name_prefix=thread_name_prefix)
        self._lock = threading.Lock()
        self._pending: Dict[Hashable, Deque[Callable[[], None]]] = {}
        self._active: Set[Hashable] = set()
        self._shutdown = False

    def submit(self, key: Hashable, fn: Callable[[], None]) -> bool:
        """Enqueue fn on key's FIFO lane. Returns False after shutdown
        (caller may run inline)."""
        with self._lock:
            if self._shutdown:
                return False
            self._pending.setdefault(key, deque()).append(fn)
            if key in self._active:
                return True  # the running drainer will pick it up
            self._active.add(key)
        try:
            self._pool.submit(self._drain, key)
        except RuntimeError:  # pool raced shutdown
            # Other threads may have appended to this key's queue after we
            # claimed _active and were told True — those tasks are owed
            # execution. Drain the whole lane inline instead of dropping it
            # (which also runs THIS submission, so report it as executed).
            self._drain(key)
        return True

    def _drain(self, key: Hashable) -> None:
        while True:
            with self._lock:
                q = self._pending.get(key)
                if not q:
                    self._active.discard(key)
                    self._pending.pop(key, None)
                    return
                fn = q.popleft()
            try:
                fn()
            except Exception:
                logger.exception("key-serial task failed (key=%s)", key)

    def pending_count(self) -> int:
        with self._lock:
            return sum(len(q) for q in self._pending.values())

    def shutdown(self, wait: bool = True) -> None:
        with self._lock:
            self._shutdown = True
        self._pool.shutdown(wait=wait)
