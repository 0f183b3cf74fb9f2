"""Training subsystem: one trainer per served model family.

- YOLOX: SimOTA loss (loss.py), build_training(variant="yolox-*")
- RT-DETR: Hungarian matching + VFL/L1/GIoU + CDN (matcher.py,
  detr_loss.py, cdn.py), build_training(variant="rtdetrv2-*")
- EVA02 Stage-2: timm fine-tune recipe (classifier.py),
  build_classifier_training(...)

Exports resolve lazily so light consumers (train.data file tooling) do
not pay the jax/flax/optax/model import cost.
"""
_EXPORTS = {
    "build_classifier_training": "telescope_cam_detection_tpu.train.classifier",
    "TrainState": "telescope_cam_detection_tpu.train.trainer",
    "build_training": "telescope_cam_detection_tpu.train.trainer",
    "make_lr_schedule": "telescope_cam_detection_tpu.train.trainer",
    "make_optimizer": "telescope_cam_detection_tpu.train.trainer",
    "make_sharded_train_step": "telescope_cam_detection_tpu.train.trainer",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    module = _EXPORTS.get(name)
    if module is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib
    return getattr(importlib.import_module(module), name)
