#!/usr/bin/env python3
"""Minimal example: run the fused detector on one image file.

  python examples/detect_image.py photo.jpg --weights models/yolox/yolox_s.msgpack
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("image")
    parser.add_argument("--variant", default="yolox-s")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--input", nargs=2, type=int, default=[640, 640])
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--out", default=None, help="write annotated image")
    args = parser.parse_args()

    import cv2
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, FilterSettings, ProgramSpec)
    from telescope_cam_detection_tpu.utils.visualization import draw_detections

    frame = cv2.imread(args.image)
    if frame is None:
        print(f"unreadable image: {args.image}", file=sys.stderr)
        return 1

    program = DetectorProgram(ProgramSpec(variant=args.variant,
                                          input_hw=tuple(args.input)))
    if args.weights:
        from telescope_cam_detection_tpu.models.convert import load_variables
        loaded = load_variables(args.weights,
                                reference_variables=program.variables)
        if loaded is not None:
            program.variables = loaded
    program.update_filters(FilterSettings(conf_threshold=args.conf,
                                          wildlife_only=False))

    detections = program.detect(frame)
    for d in detections:
        b = d["bbox"]
        print(f"{d['class_name']:>12} {d['confidence']:.2f} "
              f"[{b['x1']:.0f},{b['y1']:.0f},{b['x2']:.0f},{b['y2']:.0f}]")
    if args.out:
        cv2.imwrite(args.out, draw_detections(frame, detections))
        print(f"annotated -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
