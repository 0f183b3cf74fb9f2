"""TPU-native real-time multi-camera video detection framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of
``filthyrake/telescope_cam_detection`` (reference mounted at /root/reference):
RTSP cameras -> fused on-device preprocess -> on-device motion gates ->
Stage-1 detectors (YOLOX / RT-DETRv2 in Flax) -> batched class-aware NMS ->
Stage-2 iNaturalist species classifier (EVA02) with taxonomy / geographic /
time-of-day re-ranking -> snapshot & clip products -> HTTP/WebSocket/MJPEG
serving plane.

Design notes (vs the torch/CUDA reference):
  * Everything between "decoded frame" and "filtered boxes" is ONE jitted
    device program per batch with static shapes (bucketed batch/resolution).
  * The SharedInferenceCoordinator is the single device dispatch loop.
  * CUDA OOM graceful degradation becomes HBM-headroom-aware bucket shrink.
  * Multi-chip scaling shards the stream-batch axis over a jax Mesh.
"""

__version__ = "0.1.0"

from telescope_cam_detection_tpu.utils.bbox import (  # noqa: F401
    ensure_valid_bbox,
    is_valid_bbox,
    validate_bbox_coords,
)
