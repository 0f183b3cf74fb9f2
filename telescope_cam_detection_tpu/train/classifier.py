"""Stage-2 classifier fine-tuning (EVA02) — the timm fine-tune recipe in JAX.

The reference's Stage-2 classifier is a frozen timm checkpoint
(reference src/species_classifier.py:235-270); it cannot be adapted to a
deployment's own species list or camera imagery. This module completes the
loop: fine-tune the Flax EVA02 on labeled crops (e.g. the snapshot saver's
raw/ output, hand-sorted into class folders) and export weights the serving
SpeciesClassifier loads directly.

Recipe (timm EVA02 fine-tune defaults, rebuilt on optax):
  * softmax cross-entropy over soft labels, label smoothing 0.1;
  * mixup (Beta(0.8, 0.8)) inside the jitted step — mixed pixels AND
    mixed targets, driven by an explicit PRNG key;
  * layer-wise learning-rate decay (deeper blocks step faster than early
    blocks/embeddings — decay^distance multipliers on the updates);
  * AdamW with decay masked off 1-D params, warmup+cosine schedule, EMA
    shadow for export (train/trainer.py machinery reused).

All of it jits into ONE XLA program and shards over a (dp, mp) Mesh with
the same param/opt sharding rules as the detector trainer.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from telescope_cam_detection_tpu.models.eva02 import EVA02_VARIANTS, build_eva02
from telescope_cam_detection_tpu.train.trainer import (
    TrainState, apply_updates_with_ema, make_lr_schedule, make_optimizer)

logger = logging.getLogger(__name__)

_MIXUP_BETA = 0.8


def classifier_loss(logits: jnp.ndarray, soft_labels: jnp.ndarray,
                    label_smoothing: float = 0.1):
    """Cross-entropy against (possibly mixed) soft labels with smoothing."""
    c = logits.shape[-1]
    labels = soft_labels * (1.0 - label_smoothing) + label_smoothing / c
    loss = optax.softmax_cross_entropy(logits.astype(jnp.float32), labels)
    return jnp.mean(loss)


def layer_lr_multipliers(params: Any, depth: int, layer_decay: float) -> Any:
    """Per-leaf LR multipliers implementing layer-wise decay.

    head/final-norm train at full rate; block i at decay^(depth - i);
    patch/pos/cls embeddings at decay^(depth + 1) — the timm layer_decay
    convention (deepest layers adapt most during fine-tuning).
    """
    def mult_for(name: str) -> float:
        if name in ("head", "norm"):
            return 1.0
        if name.startswith("block"):
            return float(layer_decay) ** (depth - int(name[len("block"):]))
        return float(layer_decay) ** (depth + 1)

    return {k: jax.tree.map(lambda _: jnp.float32(mult_for(k)), v)
            for k, v in params.items()}


def _scale_updates(multipliers: Any) -> optax.GradientTransformation:
    """Multiply each update leaf by a static per-leaf factor."""
    def init_fn(_params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, m: u * m, updates, multipliers), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_classifier_optimizer(params: Any, depth: int,
                              learning_rate, weight_decay: float = 0.05,
                              layer_decay: float = 0.75):
    base = make_optimizer(learning_rate, weight_decay)
    if layer_decay >= 1.0:
        return base
    return optax.chain(base, _scale_updates(
        layer_lr_multipliers(params, depth, layer_decay)))


def mixup(rng: jax.Array, images: jnp.ndarray, labels: jnp.ndarray):
    """One shared Beta(0.8, 0.8) lambda per batch, partner = reversed batch
    (timm's default pairing). labels are one-hot/soft (B, C)."""
    lam = jax.random.beta(rng, _MIXUP_BETA, _MIXUP_BETA)
    mixed_x = lam * images + (1.0 - lam) * images[::-1]
    mixed_y = lam * labels + (1.0 - lam) * labels[::-1]
    return mixed_x, mixed_y


def make_classifier_train_step(model, image_size: int,
                               use_mixup: bool = True,
                               label_smoothing: float = 0.1) -> Callable:
    """Returns train_step(state, crops_u8, labels, rng) -> (state, metrics).

    crops_u8: (B, H, W, 3) uint8 BGR — the SAME input contract as the
    serving SpeciesClassifier; the serving preprocess (resize + BGR->RGB +
    CLIP normalize, ops/preprocess.py) is fused into the train step so
    train and serve see identical pixels. labels: (B, C) one-hot/soft.
    """
    from telescope_cam_detection_tpu.ops.preprocess import (
        preprocess_classifier)

    def train_step(state: TrainState, crops_u8: jnp.ndarray,
                   labels: jnp.ndarray, rng: jax.Array):
        # true-f32 matmuls (see trainer.make_train_step): fine-tuning from
        # a pretrained trunk is less precision-sensitive than from-scratch
        # detection, but training quality should not depend on the backend
        with jax.default_matmul_precision("float32"):
            images = preprocess_classifier(crops_u8,
                                           (image_size, image_size))
            if use_mixup:
                images, labels = mixup(rng, images, labels)

            def loss_fn(params):
                logits = model.apply({"params": params}, images, train=True)
                loss = classifier_loss(logits, labels, label_smoothing)
                acc = jnp.mean((jnp.argmax(logits, -1) ==
                                jnp.argmax(labels, -1)).astype(jnp.float32))
                return loss, acc

            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = apply_updates_with_ema(state, grads)
            return new_state, {"loss": loss, "accuracy": acc}

    return train_step


def build_classifier_training(
    model_name: str = "eva02-large",
    num_classes: int = 10,
    image_size: int = 336,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.05,
    layer_decay: float = 0.75,
    mesh=None,
    seed: int = 0,
    total_steps: Optional[int] = None,
    warmup_steps: int = 0,
    ema_decay: float = 0.0,
    use_mixup: bool = True,
    label_smoothing: float = 0.1,
    init_variables: Optional[Any] = None,
    remat: bool = False,
):
    """Model + TrainState + jitted (optionally mesh-sharded) step.

    init_variables seeds from a pretrained checkpoint; a head of a
    different class count is re-initialized fresh (standard fine-tune:
    new classification head over pretrained trunk).
    """
    model = build_eva02(model_name, num_classes, image_size, remat=remat)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    if init_variables is not None:
        fresh = variables["params"]
        pre = dict(init_variables.get("params", init_variables))

        from telescope_cam_detection_tpu.models.convert import (
            trees_compatible)

        merged = dict(fresh)
        for k, v in pre.items():
            if k not in fresh:
                continue
            if trees_compatible(v, fresh[k]):
                merged[k] = v
            else:
                # a new head for a different class count is the normal
                # fine-tune case; pos/patch embeds mismatch when --size
                # differs from the checkpoint's train size — re-init fresh
                # rather than failing with a broadcast error mid-step
                logger.warning(
                    "pretrained %r shape mismatch (checkpoint trained at a "
                    "different size/class count); re-initializing fresh", k)
        variables = {"params": merged}

    depth = EVA02_VARIANTS[model_name][0]
    lr = (make_lr_schedule(learning_rate, total_steps, warmup_steps)
          if total_steps else learning_rate)
    tx = make_classifier_optimizer(variables["params"], depth, lr,
                                   weight_decay, layer_decay)
    state = TrainState.create(variables, tx, ema_decay=ema_decay)
    step_fn = make_classifier_train_step(model, image_size, use_mixup,
                                         label_smoothing)

    if mesh is None:
        return model, state, jax.jit(step_fn)

    # Sharded: same sharding rules as the detector trainer; the classifier
    # step's args after state are dp-sharded crops + labels and a
    # replicated rng.
    from jax.sharding import NamedSharding, PartitionSpec as P
    from telescope_cam_detection_tpu.parallel import mesh as mesh_lib
    from telescope_cam_detection_tpu.train.trainer import (
        make_sharded_train_step)
    jitted, placed = make_sharded_train_step(
        model, state, mesh, step_fn=step_fn, data_shardings=(
            NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None, None, None)),
            NamedSharding(mesh, P(mesh_lib.DATA_AXIS, None)),
            NamedSharding(mesh, P()),
        ))
    return model, placed, jitted
