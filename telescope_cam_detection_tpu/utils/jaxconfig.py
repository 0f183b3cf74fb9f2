"""Process-wide JAX configuration.

The TPU analog of the reference's TensorRT engine cache
(tools/convert_yolox_to_tensorrt.py): XLA AOT compilation with a persistent
on-disk cache, so every (batch-bucket, resolution) program compiles once per
machine, not once per process. On this environment compiles go through a
remote compile service with high and erratic latency (observed 30s-12min),
which makes the cache load-bearing for startup time.
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_configured = False


def configure_jax(cache_dir: str | None = None) -> None:
    """Idempotent: enable the persistent compilation cache."""
    global _configured
    if _configured:
        return
    # Some environments register the TPU backend in sitecustomize and pin
    # jax_platforms there, ignoring the JAX_PLATFORMS env var. TCD_PLATFORM
    # re-overrides via jax.config (must happen before backend init) so the
    # app can be forced onto e.g. CPU for hermetic tests and smoke runs.
    platform = os.environ.get("TCD_PLATFORM")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)

    if jax.default_backend() == "cpu":
        # CPU compiles are fast and cached CPU executables are machine-
        # feature sensitive (cross-process AOT loads warn about SIGILL
        # risk); the persistent cache only pays off for TPU.
        _configured = True
        return

    if cache_dir is None:
        cache_dir = os.environ.get(
            "TCD_XLA_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".xla_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        logger.info("XLA persistent compilation cache: %s", cache_dir)
    except Exception:  # cache failure must never break inference
        logger.exception("could not enable XLA compilation cache")
    _configured = True
