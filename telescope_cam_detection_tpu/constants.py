"""Centralized framework constants.

Semantics mirror the reference's ``src/constants.py`` (values are part of the
behavioral compatibility surface); TPU-specific constants are new.
"""

# --------------------------------------------------------------------------
# Queues / threading
# --------------------------------------------------------------------------
QUEUE_GET_TIMEOUT_SECONDS = 0.1
THREAD_JOIN_TIMEOUT_SECONDS = 5.0
LOG_DROPPED_EVERY_N = 10

# --------------------------------------------------------------------------
# RTSP capture
# --------------------------------------------------------------------------
RTSP_TIMEOUT_MICROSECONDS = 5_000_000
DEFAULT_MAX_RTSP_FAILURES = 30
DEFAULT_RTSP_RETRY_DELAY_SECONDS = 5.0
DEFAULT_RTSP_RECONNECT_DELAY_SECONDS = 2.0
ERROR_SLEEP_SECONDS = 0.1
RTSP_FAILURE_SLEEP_SECONDS = 1.0

# --------------------------------------------------------------------------
# Web / streaming
# --------------------------------------------------------------------------
DEFAULT_MJPEG_FPS = 30
DEFAULT_JPEG_QUALITY = 85
WEBSOCKET_HEARTBEAT_INTERVAL_SECONDS = 1.0
WEBSOCKET_STATUS_INTERVAL_SECONDS = 5.0

# --------------------------------------------------------------------------
# Stats
# --------------------------------------------------------------------------
FPS_CALCULATION_INTERVAL_SECONDS = 1.0
# Per-camera journald heartbeat cadence: scripts/stream_watchdog.py's
# journald mode tails these lines (reference stream_watchdog.py:66-118
# greps for capture-loop activity markers the same way).
CAPTURE_HEARTBEAT_SECONDS = 60.0
MIN_TIME_DELTA = 0.001

# --------------------------------------------------------------------------
# TPU dispatch (new; no reference analog — replaces CUDA eager semantics)
# --------------------------------------------------------------------------
# Static batch-size buckets for the shared coordinator. Frames are padded up
# to the nearest bucket so every device program has a static shape (one XLA
# compilation per (bucket, resolution) pair, cached persistently).
BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)

# Resolution buckets (height, width) the device programs are compiled for.
RESOLUTION_BUCKETS = ((640, 640), (1280, 1280), (1440, 2560), (1920, 1920))

# Fixed per-frame detection capacity of the device program output. All
# device-side tensors carry this many rows; invalid rows have score < 0.
MAX_DETECTIONS_STATIC = 300

# HBM headroom fractions for graceful degradation (reference used CUDA
# reserved-memory fractions 75/85/95 — memory_manager.py:79-156).
HBM_PRESSURE_HIGH = 0.75
HBM_PRESSURE_CRITICAL = 0.85
HBM_PRESSURE_EXTREME = 0.95
