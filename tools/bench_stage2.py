"""Stage-2 (EVA02) hardware benchmark: ms/crop at batch {4,16}, bf16,
XLA vs Pallas fused attention.

Reference bar: +20-30 ms per triggered detection on the A30
(docs/PERFORMANCE.md:18). Reports both resident-input execute time (pure
compute) and dispatch-with-transfer time (what the serving path pays through
this host's device link).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.models.eva02 import build_eva02, init_eva02
    from telescope_cam_detection_tpu.ops.preprocess import preprocess_classifier
    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()

    variant = os.environ.get("S2_VARIANT", "eva02-large")
    size = int(os.environ.get("S2_SIZE", "336"))
    iters = int(os.environ.get("S2_ITERS", "8"))
    results = {}
    rng = np.random.default_rng(0)

    # (attn_impl, quant) arms; int8 = W8A8 dynamic on the MXU (ops/quant.py)
    arms = [("xla", "none"), ("pallas", "none"), ("pallas", "int8")]
    if os.environ.get("S2_ARMS"):  # e.g. S2_ARMS=pallas:int8,xla:none
        arms = [tuple(a.split(":")) for a in os.environ["S2_ARMS"].split(",")]
    variables = None
    for attn_impl, quant in arms:
        model = build_eva02(variant, 10000, size, dtype=jnp.bfloat16,
                            attn_impl=attn_impl, quant=quant)
        if variables is None:  # one checkpoint serves every precision
            _, variables = init_eva02(variant, 10000, size, 0,
                                      dtype=jnp.bfloat16)

        def program(variables, crops_u8):
            x = preprocess_classifier(crops_u8, (size, size),
                                      dtype=jnp.bfloat16)
            logits = model.apply(variables, x, train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jax.lax.top_k(probs, 10)

        fn = jax.jit(program)
        for batch in (4, 16):
            crops = rng.integers(0, 256, (batch, size, size, 3), np.uint8)
            crops_dev = jnp.asarray(crops)
            out = fn(variables, crops_dev)
            np.asarray(out[0])  # warm/compile
            # resident-input execute (pure compute + readback RTT)
            t0 = time.perf_counter()
            for _ in range(iters):
                np.asarray(fn(variables, crops_dev)[0])
            exec_ms = (time.perf_counter() - t0) / iters * 1000
            # dispatch-with-transfer (serving path)
            t0 = time.perf_counter()
            for _ in range(iters):
                np.asarray(fn(variables, jnp.asarray(crops))[0])
            e2e_ms = (time.perf_counter() - t0) / iters * 1000
            tag = attn_impl if quant == "none" else f"{attn_impl}_{quant}"
            results[f"{tag}_b{batch}"] = {
                "exec_ms_per_batch": round(exec_ms, 2),
                "exec_ms_per_crop": round(exec_ms / batch, 2),
                "dispatch_ms_per_batch": round(e2e_ms, 2),
                "dispatch_ms_per_crop": round(e2e_ms / batch, 2),
            }
            print(f"{tag} b{batch}: exec {exec_ms:.1f} ms "
                  f"({exec_ms/batch:.1f}/crop), +transfer {e2e_ms:.1f} ms",
                  flush=True)
    print(json.dumps({"variant": variant, "size": size,
                      "backend": jax.default_backend(), **results}))


if __name__ == "__main__":
    main()
