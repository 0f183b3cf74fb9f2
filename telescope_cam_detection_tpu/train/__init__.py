"""Training subsystem: one trainer per served model family.

- YOLOX: SimOTA loss (loss.py), build_training(variant="yolox-*")
- RT-DETR: Hungarian matching + VFL/L1/GIoU + CDN (matcher.py,
  detr_loss.py, cdn.py), build_training(variant="rtdetrv2-*")
- EVA02 Stage-2: timm fine-tune recipe (classifier.py),
  build_classifier_training(...)
"""
from telescope_cam_detection_tpu.train.classifier import (  # noqa: F401
    build_classifier_training,
)
from telescope_cam_detection_tpu.train.trainer import (  # noqa: F401
    TrainState,
    build_training,
    make_lr_schedule,
    make_optimizer,
    make_sharded_train_step,
)
