#!/usr/bin/env python3
"""Evaluate a trained detector: COCO-style mAP on a validation set.

Counterpart of reference training/scripts/evaluate_model.py.

  python training/scripts/evaluate_model.py --weights run/yolox-s.msgpack \
      --variant yolox-s --classes 10 --images data/val/images
  python training/scripts/evaluate_model.py --synthetic --variant yolox-nano
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", default=None)
    parser.add_argument("--variant", default="yolox-nano")
    parser.add_argument("--classes", type=int, default=4)
    parser.add_argument("--input", nargs=2, type=int, default=[128, 128])
    parser.add_argument("--images", default=None)
    parser.add_argument("--labels", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--conf", type=float, default=0.05)
    parser.add_argument("--limit", type=int, default=200)
    args = parser.parse_args()

    import numpy as np
    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()
    from telescope_cam_detection_tpu.models.convert import load_variables
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, FilterSettings, ProgramSpec)
    from telescope_cam_detection_tpu.train.data import (
        DetectionDataset, SyntheticDetectionDataset, find_pairs)
    from telescope_cam_detection_tpu.train.evaluate import evaluate_detections

    input_hw = tuple(args.input)
    if args.synthetic:
        ds = SyntheticDetectionDataset(n=min(args.limit, 32),
                                       input_hw=input_hw,
                                       num_classes=args.classes)
    else:
        if not args.images:
            parser.error("need --images or --synthetic")
        ds = DetectionDataset(find_pairs(args.images, args.labels)[:args.limit],
                              input_hw)

    detector_type = "rtdetr" if args.variant.startswith("rtdetr") else "yolox"
    spec = ProgramSpec(detector_type=detector_type, variant=args.variant,
                       num_classes=args.classes,
                       input_hw=input_hw, max_det=50, pre_nms_topk=200)
    program = DetectorProgram(spec)
    if args.weights:
        loaded = load_variables(args.weights,
                                reference_variables=program.variables)
        if loaded is not None:
            program.variables = loaded
    program.update_filters(FilterSettings(conf_threshold=args.conf,
                                          wildlife_only=False))

    predictions, gts = [], []
    for i in range(len(ds)):
        img, lbl = ds.load(i)
        dets = program.detect(img.astype(np.uint8))
        predictions.append(dets)
        gts.append(lbl)
    metrics = evaluate_detections(predictions, gts)
    print(f"images: {len(ds)}")
    print(f"mAP@0.5      = {metrics['mAP50']:.4f}")
    print(f"mAP@0.5:0.95 = {metrics['mAP50_95']:.4f}")
    for cid, ap in sorted(metrics["per_class"].items()):
        print(f"  class {cid}: AP50 = {ap:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
