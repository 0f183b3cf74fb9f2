"""Serving-precision accuracy gate: fp32 vs bf16 vs int8 on a TRAINED head.

Fine-tunes an EVA02 variant on the synthetic crop dataset (the same
harness as tests/test_classifier_train.py), then serves the SAME trained
weights through each precision build (models/eva02.py quant/dtype knobs)
and reports held-out top-1 plus agreement with the fp32 arm. This is the
evidence that `inat_classifier.precision: int8` (W8A8 dynamic, ops/quant.py)
is accuracy-safe: the reference gets int8 only through TensorRT calibration
(tools/convert_yolox_to_tensorrt.py mentions FP16 only).

Usage: python tools/compare_classifier_precision.py \
           [--variant eva02-tiny] [--size 112] [--classes 8] \
           [--steps 300] [--batch 16] [--eval-n 128]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="eva02-tiny")
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval-n", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--no-mixup", action="store_true",
                    help="sharper convergence on small synthetic budgets")
    args = ap.parse_args()
    # note: at >=7 classes the synthetic dataset's intensity signature
    # wraps (200 + 10*cid mod 56), making some class PAIRS differ by only
    # a few grey levels — that measures precision sensitivity of an
    # artificially knife-edge margin, not of a trained classifier. Keep
    # classes <= 6 for a representative gate.

    import jax
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.models.eva02 import build_eva02
    from telescope_cam_detection_tpu.ops.preprocess import (
        preprocess_classifier)
    from telescope_cam_detection_tpu.train.classifier import (
        build_classifier_training)
    from telescope_cam_detection_tpu.train.data import (
        SyntheticClassificationDataset)
    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()

    train_ds = SyntheticClassificationDataset(
        n=args.batch * 64, image_size=args.size, num_classes=args.classes,
        seed=0)
    eval_ds = SyntheticClassificationDataset(
        n=args.eval_n, image_size=args.size, num_classes=args.classes,
        seed=7)  # disjoint seed -> unseen noise patterns

    model, state, step_fn = build_classifier_training(
        args.variant, args.classes, args.size, learning_rate=args.lr,
        total_steps=args.steps, warmup_steps=min(50, args.steps // 5),
        use_mixup=not args.no_mixup, seed=0)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for step in range(args.steps):
        idx = rng.integers(0, len(train_ds.samples), args.batch)
        crops = np.stack([train_ds.load(i)[0] for i in idx])
        labels = np.eye(args.classes, dtype=np.float32)[
            [train_ds.load(i)[1] for i in idx]]
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, jnp.asarray(crops),
                                 jnp.asarray(labels), sub)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(metrics['loss']):.3f} "
                  f"acc {float(metrics['accuracy']):.3f}", flush=True)
    train_s = time.perf_counter() - t0

    eval_crops = np.stack([eval_ds.load(i)[0]
                           for i in range(len(eval_ds.samples))])
    eval_labels = np.asarray([eval_ds.load(i)[1]
                              for i in range(len(eval_ds.samples))])

    params = {"params": state.params}
    results = {}
    preds = {}
    for precision in ("fp32", "bf16", "int8"):
        dtype = jnp.float32 if precision == "fp32" else jnp.bfloat16
        quant = "int8" if precision == "int8" else "none"
        served = build_eva02(args.variant, args.classes, args.size,
                             dtype=dtype, quant=quant)

        @jax.jit
        def infer(variables, crops_u8, _m=served):
            x = preprocess_classifier(crops_u8, (args.size, args.size),
                                      dtype=dtype)
            return _m.apply(variables, x, train=False)

        logits = np.asarray(infer(params, jnp.asarray(eval_crops)))
        pred = logits.argmax(-1)
        preds[precision] = pred
        results[precision] = {
            "top1": round(float((pred == eval_labels).mean()), 4)}
    for precision in ("bf16", "int8"):
        results[precision]["agreement_vs_fp32"] = round(
            float((preds[precision] == preds["fp32"]).mean()), 4)

    print(json.dumps({
        "variant": args.variant, "size": args.size,
        "classes": args.classes, "steps": args.steps,
        "train_seconds": round(train_s, 1),
        "backend": jax.default_backend(),
        **results,
    }))


if __name__ == "__main__":
    main()
