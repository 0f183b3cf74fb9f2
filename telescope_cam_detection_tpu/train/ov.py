"""Open-vocabulary training: detector + text tower jointly, SimOTA loss.

The contrastive head emits per-prompt class logits in the same per-level
``(reg, obj, cls)`` layout as YOLOX, so the whole SimOTA stack
(``train/loss.py``) trains it unchanged with ``num_classes = len(prompts)``.
What's new is that the "class weights" are LIVE text-tower outputs: the
train step embeds the prompt token matrix inside the jitted program, so
gradients flow through the region-text similarities into the tower — that
joint alignment is what makes held-out compositional prompts work at eval
(see train/ov_data.py on the hermetic open-vocabulary proof).

The reference cannot train its open-vocab engines at all (GroundingDINO /
YOLO-World arrive frozen from upstream; only YOLOv8 fine-tuning exists —
``training/scripts/train_custom_model.py``); this module goes past parity.
"""
from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from telescope_cam_detection_tpu.models.openvocab import (
    init_openvocab,
    tokenize_prompts,
)
from telescope_cam_detection_tpu.train.loss import yolox_loss
from telescope_cam_detection_tpu.train.trainer import (
    TrainState,
    apply_updates_with_ema,
    make_lr_schedule,
    make_optimizer,
)


def build_ov_training(
    prompts: Sequence[str],
    variant: str = "ov-nano",
    input_hw: Tuple[int, int] = (256, 256),
    embed_dim: int = 128,
    learning_rate: float = 1e-3,
    seed: int = 0,
    total_steps: int = 0,
    warmup_steps: int = 0,
    ema_decay: float = 0.0,
    text_lr_scale: float = 1.0,
):
    """Returns (det, txt, state, train_step).

    state.params = {"det": ..., "txt": ...}; the step signature matches the
    closed-set trainer: train_step(state, images, targets) -> (state,
    metrics) with targets (B, MAX_GT, 5) whose class ids index `prompts`.
    text_lr_scale < 1 damps tower updates relative to the detector (the
    usual two-tower asymmetry knob)."""
    n_prompts = len(prompts)
    det, det_vars, txt, txt_vars = init_openvocab(
        variant, input_hw, max_prompts=n_prompts, embed_dim=embed_dim,
        seed=seed)
    tokens = jnp.asarray(tokenize_prompts(prompts))

    variables = {
        "params": {"det": det_vars["params"], "txt": txt_vars["params"]},
        "batch_stats": {"det": det_vars.get("batch_stats", {})},
    }
    lr = (make_lr_schedule(learning_rate, total_steps, warmup_steps)
          if total_steps else learning_rate)
    tx = make_optimizer(lr)
    if text_lr_scale != 1.0:
        # scale the tower's OPTIMIZER UPDATE, not its gradients: adamw is
        # scale-invariant in the gradient (m/sqrt(v) cancels a constant),
        # so grad scaling would be a silent no-op
        import optax
        tx = optax.chain(tx, optax.masked(
            optax.scale(text_lr_scale),
            {"det": False, "txt": True}))
    state = TrainState.create(variables, tx, ema_decay=ema_decay)

    def train_step(state: TrainState, images: jnp.ndarray,
                   targets: jnp.ndarray) -> Tuple[TrainState, Dict]:
        # true-f32 matmuls: same rationale as the closed-set trainer —
        # the TPU's bf16-multiply default for f32 arrays measurably hurts
        # from-scratch detection training
        with jax.default_matmul_precision("float32"):
            def loss_fn(params):
                emb = txt.apply({"params": params["txt"]}, tokens)
                outs, mut = det.apply(
                    {"params": params["det"],
                     "batch_stats": state.batch_stats["det"]},
                    images, emb, train=True, mutable=["batch_stats"])
                loss, metrics = yolox_loss(outs, targets,
                                           num_classes=n_prompts,
                                           assigner="simota")
                return loss, (metrics, {"det": mut.get("batch_stats", {})})

            grads, (metrics, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            return apply_updates_with_ema(state, grads, new_stats), metrics

    return det, txt, state, train_step


def make_ov_infer(det, txt, conf_threshold: float = 0.25,
                  max_det: int = 20, pre_nms_topk: int = 200) -> Callable:
    """Jitted inference closure: (det_variables, txt_params, tokens,
    images) -> (B, max_det, 7) rows with the class column indexing the
    token matrix's prompt axis. Tokens are a traced argument — swapping
    the vocabulary re-runs, not re-compiles, as long as the prompt count
    bucket holds (models/openvocab.py encode_prompts padding)."""
    from telescope_cam_detection_tpu.models.yolox import decode_outputs
    from telescope_cam_detection_tpu.ops.nms import batched_nms

    @jax.jit
    def infer(det_variables, txt_params, tokens, images):
        emb = txt.apply({"params": txt_params}, tokens)
        outs = det.apply(det_variables, images, emb, train=False)
        boxes, obj, cls = decode_outputs(outs)
        return batched_nms(boxes, obj, cls, conf_threshold=conf_threshold,
                           iou_threshold=0.45, max_det=max_det,
                           pre_nms_topk=pre_nms_topk)

    return infer
