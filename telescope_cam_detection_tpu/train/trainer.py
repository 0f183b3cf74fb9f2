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

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params), tx=tx)


def make_optimizer(learning_rate: float = 1e-3,
                   weight_decay: float = 5e-4) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )


def make_train_step(model, num_classes: int = 80,
                    assigner: str = "simota") -> Callable:
    """Returns train_step(state, images, targets) -> (state, metrics).

    images: (B, H, W, 3) float; targets: (B, MAX_GT, 5).
    """
    def train_step(state: TrainState, images: jnp.ndarray,
                   targets: jnp.ndarray) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            outs, mutations = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            loss, metrics = yolox_loss(outs, targets, num_classes=num_classes,
                                       assigner=assigner)
            return loss, (metrics, mutations.get("batch_stats", {}))

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    return train_step


def make_sharded_train_step(
    model,
    state: TrainState,
    mesh: Mesh,
    num_classes: int = 80,
    assigner: str = "simota",
) -> Tuple[Callable, TrainState]:
    """jit the train step over the mesh with real shardings:
    batch over dp, fsdp parameter sharding over mp. Returns the jitted step
    and the state placed onto the mesh."""
    step_fn = make_train_step(model, num_classes, assigner)

    param_sh = mesh_lib.param_shardings(mesh, state.params)
    opt_sh = jax.tree.map(
        lambda _: mesh_lib.replicated(mesh), state.opt_state,
        is_leaf=lambda x: hasattr(x, "shape"))
    # optimizer moments mirror parameter shapes where possible
    opt_sh = jax.tree.map(
        lambda leaf: (mesh_lib.param_sharding_rule(mesh, (), leaf)
                      if hasattr(leaf, "shape") else mesh_lib.replicated(mesh)),
        state.opt_state, is_leaf=lambda x: hasattr(x, "shape"))
    stats_sh = jax.tree.map(lambda _: mesh_lib.replicated(mesh),
                            state.batch_stats)
    state_sh = TrainState(step=mesh_lib.replicated(mesh), params=param_sh,
                          batch_stats=stats_sh, opt_state=opt_sh, tx=state.tx)

    data_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    images_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None, None, None))
    targets_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None, None))

    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, images_sh, targets_sh),
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
):
    """Convenience: model + state (+ sharded step if mesh given)."""
    model = build_yolox(variant, num_classes)
    dummy = jnp.zeros((1, *input_hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    state = TrainState.create(variables, make_optimizer(learning_rate))
    if mesh is None:
        return model, state, jax.jit(make_train_step(model, num_classes,
                                                     assigner))
    step, placed = make_sharded_train_step(model, state, mesh, num_classes,
                                           assigner)
    return model, placed, step
