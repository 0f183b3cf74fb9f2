"""HBM-aware memory manager: graceful degradation without CUDA.

The reference watches ``torch.cuda`` reserved memory and reacts to OOM with
cache-clearing / batch-shrink / CPU fallback (memory_manager.py:23-304,
inference_engine_yolox.py:706-748). XLA preallocates and has no cache to
clear, so the TPU equivalent is *headroom budgeting*: read
``device.memory_stats()``, classify pressure with hysteresis, and shrink the
coordinator's batch-bucket ceiling (smaller static-shape program) before
allocation failures can happen.
"""
from __future__ import annotations

import enum
import logging
import threading
import time
from typing import Any, Dict

from telescope_cam_detection_tpu import constants as C

logger = logging.getLogger(__name__)


class MemoryPressure(enum.Enum):
    NORMAL = "normal"
    HIGH = "high"
    CRITICAL = "critical"
    EXTREME = "extreme"


_PRESSURE_ORDER = [MemoryPressure.NORMAL, MemoryPressure.HIGH,
                   MemoryPressure.CRITICAL, MemoryPressure.EXTREME]


class MemoryManager:
    def __init__(
        self,
        device=None,
        high: float = C.HBM_PRESSURE_HIGH,
        critical: float = C.HBM_PRESSURE_CRITICAL,
        extreme: float = C.HBM_PRESSURE_EXTREME,
        hysteresis: float = 0.03,
        check_interval: float = 1.0,
    ):
        self._device = device
        self.high = high
        self.critical = critical
        self.extreme = extreme
        self.hysteresis = hysteresis
        self.check_interval = check_interval
        self._lock = threading.Lock()
        self._pressure = MemoryPressure.NORMAL
        self._last_check = 0.0
        self._last_fraction = 0.0
        self.oom_count = 0
        self.degradation_events = 0

    def _get_device(self):
        if self._device is None:
            import jax
            devices = jax.local_devices()
            self._device = devices[0] if devices else None
        return self._device

    def memory_fraction(self) -> float:
        """Fraction of device HBM in use (0.0 if stats unavailable)."""
        dev = self._get_device()
        if dev is None:
            return 0.0
        try:
            stats = dev.memory_stats()
        except Exception:
            return 0.0
        if not stats:
            return 0.0
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit") or 0
        return used / limit if limit else 0.0

    def check_memory_pressure(self) -> MemoryPressure:
        """Classify current pressure with hysteresis (reference
        memory_manager.py:79-156: 75/85/95% bands)."""
        now = time.time()
        with self._lock:
            if now - self._last_check < self.check_interval:
                return self._pressure
            frac = self.memory_fraction()
            self._last_check = now
            self._last_fraction = frac
            current = self._pressure
            # rising edges
            if frac >= self.extreme:
                new = MemoryPressure.EXTREME
            elif frac >= self.critical:
                new = MemoryPressure.CRITICAL
            elif frac >= self.high:
                new = MemoryPressure.HIGH
            else:
                new = MemoryPressure.NORMAL
            # hysteresis on the falling edge: only step down if we are
            # below (threshold - hysteresis) of the current level
            if _PRESSURE_ORDER.index(new) < _PRESSURE_ORDER.index(current):
                thr = {MemoryPressure.HIGH: self.high,
                       MemoryPressure.CRITICAL: self.critical,
                       MemoryPressure.EXTREME: self.extreme}.get(current, 0.0)
                if frac > thr - self.hysteresis:
                    new = current
            if new != current:
                logger.warning("HBM pressure %s -> %s (%.1f%% used)",
                               current.value, new.value, frac * 100)
                if _PRESSURE_ORDER.index(new) > _PRESSURE_ORDER.index(current):
                    self.degradation_events += 1
            self._pressure = new
            return new

    def recommended_batch_limit(self, requested: int) -> int:
        """Shrink the coordinator's bucket ceiling under pressure."""
        pressure = self.check_memory_pressure()
        if pressure == MemoryPressure.NORMAL:
            return requested
        if pressure == MemoryPressure.HIGH:
            return max(requested // 2, 1)
        if pressure == MemoryPressure.CRITICAL:
            return max(requested // 4, 1)
        return 1  # EXTREME

    def handle_oom_error(self) -> Dict[str, Any]:
        """Record an allocation failure and recommend recovery (reference
        memory_manager.py:207-248)."""
        with self._lock:
            self.oom_count += 1
            count = self.oom_count
        if count >= 3:
            return {"action": "fallback", "detail": "repeated OOM; use minimum "
                    "bucket and smallest resolution bucket"}
        return {"action": "shrink", "detail": "halve batch bucket and retry"}

    def get_stats(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "pressure": self._pressure.value,
                "memory_fraction": round(self._last_fraction, 4),
                "oom_count": self.oom_count,
                "degradation_events": self.degradation_events,
                "thresholds": {"high": self.high, "critical": self.critical,
                               "extreme": self.extreme},
            }
