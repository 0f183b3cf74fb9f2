"""Train the same model under SimOTA vs center-prior assignment and compare
mAP50 on held-out synthetic data (VERDICT round-1 item 8 evidence).

  JAX_PLATFORMS=cpu python tools/compare_assigners.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(assigner: str, steps: int = 200, batch: int = 8, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from telescope_cam_detection_tpu.models.yolox import decode_outputs
    from telescope_cam_detection_tpu.ops.nms import batched_nms
    from telescope_cam_detection_tpu.runtime.program import rows_to_detections
    from telescope_cam_detection_tpu.train.data import SyntheticDetectionDataset
    from telescope_cam_detection_tpu.train.evaluate import evaluate_detections
    from telescope_cam_detection_tpu.train.trainer import build_training

    num_classes, input_hw = 4, (128, 128)
    ds = SyntheticDetectionDataset(n=batch * 25, input_hw=input_hw,
                                   num_classes=num_classes, seed=seed)
    val = SyntheticDetectionDataset(n=32, input_hw=input_hw,
                                    num_classes=num_classes, seed=777)
    model, state, step_fn = build_training(
        variant="yolox-nano", num_classes=num_classes, input_hw=input_hw,
        learning_rate=2e-3, seed=seed, assigner=assigner)
    done = 0
    while done < steps:
        for imgs, lbls in ds.batches(batch, seed=done, epochs=1):
            state, metrics = step_fn(state, jnp.asarray(imgs),
                                     jnp.asarray(lbls))
            done += 1
            if done >= steps:
                break
    loss = float(jax.device_get(metrics["loss"]))

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}

    @jax.jit
    def infer(imgs):
        outs = model.apply(variables, imgs, train=False)
        boxes, obj, cls = decode_outputs(outs)
        return batched_nms(boxes, obj, cls, conf_threshold=0.05,
                           iou_threshold=0.45, max_det=20, pre_nms_topk=200)

    preds, gts = [], []
    for i in range(len(val)):
        img, lbl = val.load(i)
        rows = np.asarray(infer(jnp.asarray(img[None], jnp.float32)))[0]
        preds.append(rows_to_detections(rows))
        gts.append(lbl)
    m = evaluate_detections(preds, gts)
    return {"assigner": assigner, "final_loss": round(loss, 3),
            "mAP50": round(m["mAP50"], 4), "mAP50_95": round(m["mAP50_95"], 4)}


if __name__ == "__main__":
    steps = int(os.environ.get("CMP_STEPS", "200"))
    out = [run(a, steps=steps) for a in ("center", "simota")]
    print(json.dumps(out))
