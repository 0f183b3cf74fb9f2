#!/usr/bin/env python3
"""AOT-compile detector programs into the persistent XLA cache.

The TPU analog of the reference's TensorRT converter
(tools/convert_yolox_to_tensorrt.py): instead of exporting a serialized
engine, we pre-compile every (batch-bucket, capture-resolution) program the
coordinator will dispatch, so production startup pays zero compile time.
On this environment remote compiles take minutes each — run this once per
config change.

Usage:
  python tools/warm_compile_cache.py --variant yolox-s --input 640 640 \
      --captures 1440x2560 1080x1920 --batches 1 2 4 8 [--benchmark]
  # delta-transfer deployments additionally need the (batch, K-bucket)
  # variants of the reconstruct+detect program:
  python tools/warm_compile_cache.py --transfer delta --lanes 5 \
      --captures 1440x2560 --batches 1 2 4 8
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--detector", default="yolox",
                        choices=["yolox", "rtdetr"])
    parser.add_argument("--variant", default="yolox-s")
    parser.add_argument("--input", nargs=2, type=int, default=[640, 640])
    parser.add_argument("--captures", nargs="+", default=["1440x2560"],
                        help="capture resolutions HxW")
    parser.add_argument("--batches", nargs="+", type=int,
                        default=[1, 2, 4, 8])
    parser.add_argument("--weights", default=None)
    parser.add_argument("--transfer", default="auto",
                        help="transfer mode to warm (auto|host|device|"
                             "yuv420|delta)")
    parser.add_argument("--lanes", type=int, default=8,
                        help="delta_lanes for --transfer delta (cameras+1)")
    parser.add_argument("--k-buckets", nargs="+", type=int, default=None,
                        help="delta K buckets to warm (default: every "
                             "bucket up to the full-refresh size)")
    parser.add_argument("--gates", default="none", choices=["none", "device"],
                        help="warm the fused-gate program variants")
    parser.add_argument("--readback", type=int, default=None,
                        help="readback_topk compaction K (must match the "
                             "serving config's detection.readback_topk — it "
                             "changes the compiled program)")
    parser.add_argument("--benchmark", action="store_true")
    args = parser.parse_args()

    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, ProgramSpec)

    spec = ProgramSpec(detector_type=args.detector, variant=args.variant,
                       input_hw=tuple(args.input), transfer=args.transfer,
                       delta_lanes=args.lanes, gates=args.gates,
                       gate_lanes=args.lanes, readback_topk=args.readback)
    program = DetectorProgram(spec)
    if args.weights:
        from telescope_cam_detection_tpu.models.convert import load_variables
        loaded = load_variables(args.weights,
                                reference_variables=program.variables)
        if loaded is not None:
            program.variables = loaded

    if args.transfer == "delta":
        # warm each (batch, K-bucket) reconstruct+detect variant; warm()
        # owns the jitted-program signatures (a hand-built call here went
        # stale when the fused gates grew a gate_lanes argument)
        ih, iw = spec.input_hw
        num_tiles = (ih // spec.delta_tile) * (iw // spec.delta_tile)
        default_buckets = [k for k in (16, 32, 48, 64, 96, 128, 192, 256,
                                       384, 512) if k < num_tiles]
        buckets = args.k_buckets or (default_buckets + [num_tiles])
        for cap in args.captures:
            h, w = (int(v) for v in cap.split("x"))
            for batch in args.batches:
                for k in buckets:
                    t0 = time.time()
                    program.warm(batch, (h, w), k=k)
                    kind = ("gated delta" if args.gates == "device"
                            else "delta")
                    print(f"compiled {kind} batch={batch} "
                          f"capture={h}x{w} K={k} "
                          f"in {time.time() - t0:.1f}s", flush=True)
        return 0

    for cap in args.captures:
        h, w = (int(v) for v in cap.split("x"))
        for batch in args.batches:
            t0 = time.time()
            program.warm(batch, (h, w))
            print(f"compiled batch={batch} capture={h}x{w} "
                  f"in {time.time() - t0:.1f}s")
            if args.benchmark:
                frames = np.zeros((batch, h, w, 3), np.uint8)
                t0 = time.time()
                n = 10
                for _ in range(n):
                    program.detect_batch_rows(frames)
                dt = (time.time() - t0) / n * 1000
                print(f"  steady: {dt:.1f} ms/batch "
                      f"({batch / dt * 1000:.1f} fps)")
    print("cache warmed:", os.environ.get("TCD_XLA_CACHE_DIR", ".xla_cache"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
