"""Export a frozen serving artifact for the Stage-1 detector.

The TPU analog of the reference's offline TensorRT conversion
(tools/convert_yolox_to_tensorrt.py): serialize the fused
preprocess->forward->decode->NMS->filter program per batch bucket with
jax.export, producing a directory a deployment can serve from without
the model-building Python (see runtime/aot.py). Weights stay call
arguments (one artifact serves any checkpoint of the variant); pass
--include-weights to bundle a checkpoint for one-file deploys.

Usage:
  python tools/export_detector_artifact.py --out artifacts/yolox_s \
      [--variant yolox-s] [--detector yolox|rtdetr] [--input 640]
      [--batches 1,4,8] [--capture 1440x2560] [--weights w.msgpack]
      [--platforms tpu,cpu] [--include-weights]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--detector", default="yolox",
                    choices=("yolox", "rtdetr"))
    ap.add_argument("--variant", default="yolox-s")
    ap.add_argument("--input", type=int, default=640)
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--capture", default=None,
                    help="HxW to bake the on-device resize for (device "
                         "transfer); default: frames at model input size")
    ap.add_argument("--weights", default=None,
                    help="checkpoint to load before export (weights stay "
                         "call args either way)")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu (default: this backend)")
    ap.add_argument("--include-weights", action="store_true")
    args = ap.parse_args()

    from telescope_cam_detection_tpu.runtime.aot import export_detector
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, FilterSettings, ProgramSpec)
    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()

    capture_hw = None
    transfer = "auto"
    if args.capture:
        h, w = args.capture.lower().split("x")
        capture_hw = (int(h), int(w))
        transfer = "device"   # bake the capture->input resize in-graph
    spec = ProgramSpec(detector_type=args.detector, variant=args.variant,
                       input_hw=(args.input, args.input),
                       transfer=transfer)
    program = DetectorProgram(spec, seed=0)
    program.update_filters(FilterSettings())
    if args.weights:
        from telescope_cam_detection_tpu.models.convert import load_variables
        loaded = load_variables(args.weights,
                                reference_variables=program.variables)
        if loaded is None:
            raise SystemExit(f"failed to load weights: {args.weights}")
        program.variables = loaded

    manifest = export_detector(
        program, args.out,
        batches=[int(b) for b in args.batches.split(",")],
        capture_hw=capture_hw,
        platforms=args.platforms.split(",") if args.platforms else None,
        include_weights=args.include_weights)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
