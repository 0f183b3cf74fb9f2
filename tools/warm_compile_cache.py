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
    parser.add_argument("--benchmark", action="store_true")
    args = parser.parse_args()

    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, ProgramSpec)

    spec = ProgramSpec(detector_type=args.detector, variant=args.variant,
                       input_hw=tuple(args.input), transfer=args.transfer,
                       delta_lanes=args.lanes, gates=args.gates,
                       gate_lanes=args.lanes)
    program = DetectorProgram(spec)
    if args.weights:
        from telescope_cam_detection_tpu.models.convert import load_variables
        loaded = load_variables(args.weights,
                                reference_variables=program.variables)
        if loaded is not None:
            program.variables = loaded

    if args.transfer == "delta":
        # compile each (batch, K-bucket) reconstruct+detect variant directly
        from telescope_cam_detection_tpu.runtime.delta import pack_batch
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
                    program._get_delta_program(batch, (h, w), k)
                    # force the compile by tracing+executing a tiny call
                    import jax.numpy as jnp
                    lanes = np.zeros((batch,), np.int32)
                    idx = np.full((batch, k), num_tiles, np.int32)
                    tile_shape = (
                        (k, spec.delta_tile * spec.delta_tile * 3 // 2)
                        if spec.delta_payload == "yuv420"
                        else (k, spec.delta_tile, spec.delta_tile, 3))
                    tiles = np.zeros((batch, *tile_shape), np.uint8)
                    if program._delta_ref is None:
                        program._delta_ref = jnp.zeros(
                            program._delta_ref_shape, jnp.uint8)
                    f = program._filter_arrays
                    if args.gates == "device":
                        # warm the round-robin serving chain (coordinator
                        # batches spread across cameras) for this batch
                        from telescope_cam_detection_tpu.ops.motion import (
                            chain_shape)
                        n_cams = max(args.lanes - 1, 1)
                        lane_list = [i % n_cams for i in range(batch)]
                        lanes = np.asarray(lane_list, np.int32)
                        chain = chain_shape(lane_list)
                        fn = program._get_delta_program(batch, (h, w), k,
                                                        chain)
                        gs = program._gate_state_for(spec.input_hw)
                        new_ref, new_gs, packed = fn(
                            program.variables, program._delta_ref, gs,
                            jnp.asarray(lanes), jnp.asarray(idx),
                            jnp.asarray(tiles), program._gate_params,
                            f["class_conf"], f["min_area"],
                            f["max_area"], f["class_allowed"])
                        program._gate_states[spec.input_hw] = new_gs
                        np.asarray(packed)
                        print(f"compiled gated delta batch={batch} "
                              f"capture={h}x{w} K={k} chain={chain} "
                              f"in {time.time() - t0:.1f}s", flush=True)
                    else:
                        fn = program._get_delta_program(batch, (h, w), k)
                        new_ref, rows = fn(
                            program.variables, program._delta_ref,
                            jnp.asarray(lanes), jnp.asarray(idx),
                            jnp.asarray(tiles), f["class_conf"],
                            f["min_area"], f["max_area"],
                            f["class_allowed"])
                        np.asarray(rows)
                        print(f"compiled delta batch={batch} "
                              f"capture={h}x{w} K={k} "
                              f"in {time.time() - t0:.1f}s", flush=True)
                    program._delta_ref = new_ref
        return 0

    for cap in args.captures:
        h, w = (int(v) for v in cap.split("x"))
        for batch in args.batches:
            frames = np.zeros((batch, h, w, 3), np.uint8)
            t0 = time.time()
            program.detect_batch_rows(frames)
            print(f"compiled batch={batch} capture={h}x{w} "
                  f"in {time.time() - t0:.1f}s")
            if args.benchmark:
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
