"""Sharded training step for detector fine-tuning.

TPU-native replacement for the reference's offline ultralytics fine-tuning
(training/scripts/train_custom_model.py:48-60): a jitted train step over a
(dp, mp) jax Mesh — batch data-parallel over dp, large parameters sharded
fsdp-style over mp (parallel/mesh.py). Gradients synchronize via the
collectives XLA derives from the sharding annotations (ICI on a slice).
Checkpointing via orbax (utils/checkpoint.py).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from telescope_cam_detection_tpu.models.yolox import build_yolox
from telescope_cam_detection_tpu.parallel import mesh as mesh_lib
from telescope_cam_detection_tpu.train.loss import yolox_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Exponential moving average of params (upstream YOLOX keeps an EMA model
    # with decay 0.9998 and evaluates/exports it). None disables EMA.
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, variables, tx, ema_decay: float = 0.0):
        params = variables["params"]
        # distinct buffers: the shadow must not alias params (jit donation
        # would otherwise see the same buffer twice)
        ema = (jax.tree.map(lambda p: jnp.array(p, copy=True), params)
               if ema_decay > 0 else None)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params), tx=tx,
                   ema_params=ema, ema_decay=ema_decay)

    def serving_params(self):
        """Params to export/evaluate: the EMA shadow when maintained."""
        return self.ema_params if self.ema_params is not None else self.params


def make_lr_schedule(base_lr: float, total_steps: int,
                     warmup_steps: int = 0,
                     min_lr_ratio: float = 0.05) -> optax.Schedule:
    """Upstream-YOLOX-style LR: linear warmup then cosine decay to a floor
    (yolox_warm_cos_lr; the reference inherits this via ultralytics'
    cos_lr option in train_custom_model.py)."""
    total_steps = max(int(total_steps), 1)
    warmup_steps = min(max(int(warmup_steps), 0), total_steps - 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup_steps else base_lr,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=base_lr * min_lr_ratio,
    )


def _decay_mask(params: Any) -> Any:
    """Weight decay applies to matmul/conv kernels only — biases and 1-D
    norm scales are excluded (upstream YOLOX splits param groups the same
    way: pg0 BN weights / pg2 biases get no decay)."""
    return jax.tree.map(lambda p: jnp.ndim(p) > 1, params)


def make_optimizer(learning_rate=1e-3,
                   weight_decay: float = 5e-4) -> optax.GradientTransformation:
    """learning_rate may be a float or an optax schedule."""
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(learning_rate, weight_decay=weight_decay,
                    mask=_decay_mask),
    )


_EMA_RAMP_STEPS = 2000.0   # upstream ModelEMA warmup constant


def apply_updates_with_ema(state: TrainState, grads, new_stats=None
                           ) -> TrainState:
    """Shared optimizer/EMA tail of every train step: apply the optax
    update, advance the ramped EMA shadow (upstream ModelEMA: early steps
    track params closely, converging to the configured decay), bump step."""
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = state.ema_params
    if new_ema is not None:
        d = state.ema_decay * (
            1.0 - jnp.exp(-(state.step.astype(jnp.float32) + 1.0)
                          / _EMA_RAMP_STEPS))
        new_ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                               new_ema, new_params)
    return state.replace(
        step=state.step + 1, params=new_params,
        batch_stats=state.batch_stats if new_stats is None else new_stats,
        opt_state=new_opt, ema_params=new_ema)


def make_train_step(model, num_classes: int = 80,
                    assigner: str = "simota") -> Callable:
    """Returns train_step(state, images, targets) -> (state, metrics).

    images: (B, H, W, 3) float; targets: (B, MAX_GT, 5).
    """
    def train_step(state: TrainState, images: jnp.ndarray,
                   targets: jnp.ndarray) -> Tuple[TrainState, Dict]:
        # true-f32 matmuls: the TPU default (bf16 multiplies for f32
        # arrays) is fine for inference but degrades from-scratch
        # detection training (measured: RT-DETR mAP collapse on v5e at
        # identical budgets); serving programs are unaffected
        with jax.default_matmul_precision("float32"):
            def loss_fn(params):
                outs, mutations = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, mutable=["batch_stats"])
                loss, metrics = yolox_loss(outs, targets,
                                           num_classes=num_classes,
                                           assigner=assigner)
                return loss, (metrics, mutations.get("batch_stats", {}))

            grads, (metrics, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            return apply_updates_with_ema(state, grads, new_stats), metrics

    return train_step


def rtdetr_query_count(model, input_hw: Tuple[int, int]) -> int:
    """Actual decoder query count: the encoder top-k selection is capped by
    the token count at small input sizes (models/rtdetr.py). The SAME-padded
    stride-2 convs produce ceil-sized feature maps, so ceil-divide."""
    from telescope_cam_detection_tpu.models.rtdetr import FEAT_STRIDES
    tokens = sum((-(-input_hw[0] // s)) * (-(-input_hw[1] // s))
                 for s in FEAT_STRIDES)
    return min(model.num_queries, tokens)


def make_rtdetr_train_step(model, num_classes: int,
                           input_hw: Tuple[int, int],
                           dn_groups: int = 2) -> Callable:
    """Returns train_step(state, images, targets) -> (state, metrics) for
    an RTDETR model: forward with deep-supervision aux heads + contrastive
    denoising queries (train/cdn.py; dn_groups=0 disables), Hungarian
    matching + VFL/L1/GIoU loss (train/detr_loss.py), same TrainState/EMA
    machinery as the YOLOX step. The CDN noise rng derives from state.step
    so the step keeps the (state, images, targets) signature.

    images arrive as raw BGR 0..255 floats (the shared dataset convention,
    same as the YOLOX step); the step applies the SERVING preprocess
    (BGR -> RGB 0..1, ops/preprocess.preprocess_rtdetr semantics) so
    trained weights see the exact pixel convention the deploy program
    feeds them."""
    from telescope_cam_detection_tpu.train.cdn import (
        build_cdn_queries, cdn_attention_mask)
    from telescope_cam_detection_tpu.train.detr_loss import rtdetr_loss

    def train_step(state: TrainState, images: jnp.ndarray,
                   targets: jnp.ndarray) -> Tuple[TrainState, Dict]:
        dn_meta = dn = None
        if dn_groups > 0:
            rng = jax.random.fold_in(jax.random.PRNGKey(0xCD17), state.step)
            dn_meta = build_cdn_queries(rng, targets, input_hw, num_classes,
                                        num_groups=dn_groups)
            dn = {"labels": dn_meta["labels"], "boxes": dn_meta["boxes"],
                  "attn_mask": cdn_attention_mask(
                      dn_groups, targets.shape[1],
                      rtdetr_query_count(model, input_hw),
                      dn_meta["valid"])}

        x = images[..., ::-1] * (1.0 / 255.0)   # serving pixel convention

        # true-f32 matmuls (see make_train_step): the TPU bf16-multiply
        # default measurably degrades from-scratch DETR training
        with jax.default_matmul_precision("float32"):
            def loss_fn(params):
                outs, mutations = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, return_aux=True, dn=dn,
                    mutable=["batch_stats"])
                loss, metrics = rtdetr_loss(outs, targets, input_hw=input_hw,
                                            num_classes=num_classes,
                                            dn_meta=dn_meta)
                return loss, (metrics, mutations.get("batch_stats", {}))

            grads, (metrics, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            return apply_updates_with_ema(state, grads, new_stats), metrics

    return train_step


def make_sharded_train_step(
    model,
    state: TrainState,
    mesh: Mesh,
    num_classes: int = 80,
    assigner: str = "simota",
    step_fn: Optional[Callable] = None,
    data_shardings: Optional[Tuple] = None,
) -> Tuple[Callable, TrainState]:
    """jit the train step over the mesh with real shardings:
    batch over dp, fsdp parameter sharding over mp. Returns the jitted step
    and the state placed onto the mesh. step_fn overrides the default
    YOLOX step (RT-DETR family, classifier fine-tune); data_shardings
    overrides the shardings of the step args after state (default:
    dp-sharded (B,H,W,3) images + (B,G,5) targets)."""
    if step_fn is None:
        step_fn = make_train_step(model, num_classes, assigner)

    param_sh = mesh_lib.param_shardings(mesh, state.params)
    # optimizer moments mirror parameter shapes where possible
    opt_sh = jax.tree.map(
        lambda leaf: (mesh_lib.param_sharding_rule(mesh, (), leaf)
                      if hasattr(leaf, "shape") else mesh_lib.replicated(mesh)),
        state.opt_state, is_leaf=lambda x: hasattr(x, "shape"))
    stats_sh = jax.tree.map(lambda _: mesh_lib.replicated(mesh),
                            state.batch_stats)
    ema_sh = None if state.ema_params is None else param_sh
    state_sh = TrainState(step=mesh_lib.replicated(mesh), params=param_sh,
                          batch_stats=stats_sh, opt_state=opt_sh, tx=state.tx,
                          ema_params=ema_sh, ema_decay=state.ema_decay)

    if data_shardings is None:
        data_shardings = (
            NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None, None, None)),
            NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None, None)),
        )

    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, *data_shardings),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )

    placed = jax.device_put(state, state_sh)
    return jitted, placed


def build_training(
    variant: str = "yolox-s",
    num_classes: int = 80,
    input_hw: Tuple[int, int] = (640, 640),
    learning_rate: float = 1e-3,
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    assigner: str = "simota",
    total_steps: Optional[int] = None,
    warmup_steps: int = 0,
    min_lr_ratio: float = 0.05,
    ema_decay: float = 0.0,
    dn_groups: int = 2,
    remat: bool = False,
):
    """Convenience: model + state (+ sharded step if mesh given).

    variant selects the detector family: yolox-* trains under the SimOTA
    loss (train/loss.py); rtdetr* trains under Hungarian matching +
    VFL/L1/GIoU with deep supervision plus contrastive denoising queries
    (train/detr_loss.py, train/cdn.py; dn_groups=0 disables CDN). RT-DETR
    training always uses the XLA deformable-sampling path (the Pallas
    serving kernel defines no VJP).

    With total_steps given, the optimizer runs warmup+cosine LR; with
    ema_decay > 0 the state carries an EMA shadow of the params. remat
    rematerializes backbone/decoder blocks under grad (jax.checkpoint) —
    bigger batches per chip for ~1 extra forward of FLOPs.
    """
    if variant.startswith("rtdetr"):
        from telescope_cam_detection_tpu.models.rtdetr import build_rtdetr
        model = build_rtdetr(variant, num_classes, sampling_impl="xla",
                             remat=remat)
        dummy = jnp.zeros((1, *input_hw, 3), jnp.float32)
        # init with a minimal dn so the CDN class-embedding param exists
        # (its table size is independent of the dn query count)
        nq = rtdetr_query_count(model, input_hw)
        dummy_dn = {
            "labels": jnp.zeros((1, 2), jnp.int32),
            "boxes": jnp.full((1, 2, 4), 0.5, jnp.float32),
            "attn_mask": jnp.ones((1, 1, nq + 2, nq + 2), bool),
        }
        variables = model.init(jax.random.PRNGKey(seed), dummy, train=False,
                               return_aux=True, dn=dummy_dn)
        step_builder = lambda: make_rtdetr_train_step(  # noqa: E731
            model, num_classes, input_hw, dn_groups=dn_groups)
    else:
        model = build_yolox(variant, num_classes, remat=remat)
        dummy = jnp.zeros((1, *input_hw, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
        step_builder = lambda: make_train_step(  # noqa: E731
            model, num_classes, assigner)
    lr = (make_lr_schedule(learning_rate, total_steps, warmup_steps,
                           min_lr_ratio)
          if total_steps else learning_rate)
    state = TrainState.create(variables, make_optimizer(lr),
                              ema_decay=ema_decay)
    if mesh is None:
        return model, state, jax.jit(step_builder())
    step, placed = make_sharded_train_step(model, state, mesh, num_classes,
                                           assigner, step_fn=step_builder())
    return model, placed, step
