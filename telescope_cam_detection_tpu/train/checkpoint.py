"""Training-state checkpointing via orbax.

The reference relies on ultralytics' built-in checkpointing
(training/scripts/train_custom_model.py:48-60); here TrainState (params,
batch stats, optimizer state, step) persists through orbax with retention,
and serving weights export to the native msgpack format (models/convert.py).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

logger = logging.getLogger(__name__)


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    path = Path(directory).absolute()
    path.mkdir(parents=True, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(str(path), options=options)


def save_train_state(directory: str, state: Any, step: Optional[int] = None,
                     max_to_keep: int = 3) -> None:
    import jax
    import orbax.checkpoint as ocp
    mgr = _manager(directory, max_to_keep)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(jax.device_get(state.step)),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = jax.device_get(state.ema_params)
    step = payload["step"] if step is None else step
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    logger.info("saved training checkpoint step=%d -> %s", step, directory)


def restore_train_state(directory: str, state: Any) -> Any:
    """Restore into an existing TrainState template (shapes must match)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        logger.warning("no checkpoint found in %s", directory)
        return state
    restored = mgr.restore(step)
    kwargs = {}
    if getattr(state, "ema_params", None) is not None:
        if "ema_params" in restored:
            kwargs["ema_params"] = restored["ema_params"]
        else:
            # pre-EMA checkpoint: seed the shadow from the restored params
            # (leaving the init-weight shadow would make the default EMA
            # export ship near-untrained weights)
            import numpy as np
            kwargs["ema_params"] = jax.tree.map(
                lambda p: np.array(p, copy=True), restored["params"])
            logger.info("checkpoint has no EMA shadow; seeding from params")
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"], jnp.int32), **kwargs)


def export_serving_weights(state: Any, path: str, use_ema: bool = True) -> None:
    """TrainState -> msgpack serving checkpoint (what DetectorProgram loads).

    Exports the EMA shadow when the state maintains one (upstream YOLOX
    evaluates and ships the EMA model), unless use_ema=False."""
    from telescope_cam_detection_tpu.models.convert import save_variables
    params = state.serving_params() if use_ema and hasattr(
        state, "serving_params") else state.params
    # Train-only params (RT-DETR deep-supervision heads aux_class_head{i},
    # CDN denoising embedding dn_class_embed) are never referenced by the
    # serving forward; drop them from the export.
    if isinstance(params, dict):
        params = {k: v for k, v in params.items()
                  if not (str(k).startswith("aux_class_head")
                          or str(k) == "dn_class_embed")}
    save_variables({"params": params,
                    "batch_stats": state.batch_stats}, path)
