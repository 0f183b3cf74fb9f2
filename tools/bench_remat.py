"""Measure rematerialization's activation-memory savings on the real TPU.

Runs one jitted train step (YOLOX by default) with and without remat and
reports the device's peak bytes in use plus step wall time — the
FLOPs-for-HBM trade quantified (docs/PERFORMANCE.md).

  python tools/bench_remat.py                     # yolox-m b8 @640
  BR_VARIANT=yolox-l BR_BATCH=8 BR_SIZE=640 python tools/bench_remat.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax  # noqa: E402

configure_jax()


def run(remat: bool, variant: str, batch: int, size: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    if variant.startswith("eva02"):
        from telescope_cam_detection_tpu.train.classifier import (
            build_classifier_training)
        model, state, step = build_classifier_training(
            model_name=variant, num_classes=100, image_size=size,
            learning_rate=1e-4, seed=0, remat=remat)
        crops = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)),
                            jnp.uint8)
        labels = jnp.eye(100)[jnp.asarray(rng.integers(0, 100, batch))]
        args3 = (crops, labels, jax.random.PRNGKey(0))
    else:
        from telescope_cam_detection_tpu.train.trainer import build_training
        model, state, step = build_training(
            variant=variant, num_classes=8, input_hw=(size, size),
            learning_rate=1e-3, seed=0, remat=remat)
        images = jnp.asarray(rng.uniform(0, 255, (batch, size, size, 3)),
                             jnp.float32)
        targets = np.full((batch, 10, 5), -1.0, np.float32)
        targets[:, 0] = [40.0, 40.0, 200.0, 200.0, 1.0]
        args3 = (images, jnp.asarray(targets))

    # compiler-reported scratch memory: where the saved activations live
    # (device memory_stats() is unavailable through the axon relay). The
    # AOT-compiled executable is also what we run, so each config
    # compiles exactly once.
    compiled = step.lower(state, *args3).compile()
    ma = compiled.memory_analysis()
    temp = getattr(ma, "temp_size_in_bytes", 0)
    args = getattr(ma, "argument_size_in_bytes", 0)

    state, metrics = compiled(state, *args3)      # warm
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, metrics = compiled(state, *args3)
    jax.block_until_ready(metrics["loss"])
    ms = (time.perf_counter() - t0) * 1000 / iters

    return {"remat": remat, "temp_gib": round(temp / 2**30, 3),
            "args_gib": round(args / 2**30, 3), "step_ms": round(ms, 1)}


if __name__ == "__main__":
    variant = os.environ.get("BR_VARIANT", "yolox-m")
    batch = int(os.environ.get("BR_BATCH", "8"))
    size = int(os.environ.get("BR_SIZE", "640"))
    out = {"variant": variant, "batch": batch, "size": size, "runs": []}
    # separate processes would isolate peak stats; a fresh run order of
    # (remat first) keeps the smaller peak from being masked by the larger
    for remat in (True, False):
        out["runs"].append(run(remat, variant, batch, size))
    print(json.dumps(out))
