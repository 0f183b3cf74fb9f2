"""Train RT-DETR with and without contrastive denoising and compare mAP50
on held-out synthetic data — evidence that the from-scratch DETR training
path (Hungarian matching + VFL/L1/GIoU + CDN, train/detr_loss.py +
train/cdn.py) actually learns, and what CDN buys at small step budgets.

  python tools/compare_detr_training.py                  # real TPU
  TCD_PLATFORM=cpu python tools/compare_detr_training.py # hermetic CPU
  CMP_STEPS=400 CMP_BATCH=8 python tools/compare_detr_training.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax  # noqa: E402

configure_jax()


def run(dn_groups: int, steps: int = 200, batch: int = 4, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from telescope_cam_detection_tpu.train.data import SyntheticDetectionDataset
    from telescope_cam_detection_tpu.train.trainer import build_training

    num_classes, input_hw = 4, (128, 128)
    ds = SyntheticDetectionDataset(n=batch * 25, input_hw=input_hw,
                                   num_classes=num_classes, seed=seed)
    val = SyntheticDetectionDataset(n=32, input_hw=input_hw,
                                    num_classes=num_classes, seed=777)
    model, state, step_fn = build_training(
        variant="rtdetrv2-r18vd", num_classes=num_classes, input_hw=input_hw,
        learning_rate=1e-3, seed=seed, total_steps=steps,
        warmup_steps=steps // 10, dn_groups=dn_groups)
    t0 = time.time()
    done = 0
    while done < steps:
        for imgs, lbls in ds.batches(batch, seed=done, epochs=1):
            state, metrics = step_fn(state, jnp.asarray(imgs),
                                     jnp.asarray(lbls))
            done += 1
            if done >= steps:
                break
    loss = float(jax.device_get(metrics["loss"]))
    train_s = time.time() - t0

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    # serving-true eval: the SAME pixel convention + NMS-free deploy rows
    # the runtime feeds the model (train/evaluate.make_eval_fn)
    from telescope_cam_detection_tpu.train.evaluate import make_eval_fn
    m = make_eval_fn(model, family="rtdetr", max_det=20)(variables, val)
    return {"dn_groups": dn_groups, "final_loss": round(loss, 2),
            "mAP50": round(m["mAP50"], 4), "mAP50_95": round(m["mAP50_95"], 4),
            "train_seconds": round(train_s, 1)}


if __name__ == "__main__":
    steps = int(os.environ.get("CMP_STEPS", "200"))
    batch = int(os.environ.get("CMP_BATCH", "4"))
    out = [run(g, steps=steps, batch=batch) for g in (0, 2)]
    print(json.dumps(out))
