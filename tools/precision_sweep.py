"""Record the serving precision sweep: fp32 / bf16 / int8 x {fps, mAP}.

The `detection.precision` knob (bf16 compute, W8A8 int8 convs on the MXU
via models/common.QuantConv2D) existed since round 3 with microbench
TOP/s numbers only; VERDICT r4 #8 wants the SERVING tradeoff recorded —
throughput AND quality per precision from one healthy window, the TPU
analog of the reference's TensorRT FP16 table
(reference tools/convert_yolox_to_tensorrt.py:13-16).

Runs `bench.py` once per precision (the bench's own health gate
waits/re-probes per pass; a degraded window is stamped in each artifact),
collects the JSON lines, and writes docs/traces/precision_sweep.json.

    python tools/precision_sweep.py [--iters 20] [--passes 2]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "traces", "precision_sweep.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--precisions", nargs="*",
                    default=["fp32", "bf16", "int8"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=1500.0,
                    help="per-precision bench timeout (s)")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    results = {}
    for prec in args.precisions:
        env = dict(os.environ,
                   BENCH_PRECISION=prec,
                   BENCH_ITERS=str(args.iters),
                   BENCH_PASSES=str(args.passes))
        print(f"=== {prec} ===", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True,
                timeout=args.timeout)
        except subprocess.TimeoutExpired:
            results[prec] = {"error": f"timeout after {args.timeout}s"}
            print(f"{prec}: TIMEOUT", flush=True)
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ""
        try:
            art = json.loads(line)
        except json.JSONDecodeError:
            results[prec] = {"error": f"rc={proc.returncode}",
                             "stderr_tail": proc.stderr[-500:]}
            print(f"{prec}: FAILED rc={proc.returncode}", flush=True)
            continue
        keep = {k: art.get(k) for k in (
            "value", "p50_frame_latency_ms", "p95_batch_latency_ms",
            "fps_passes", "pass_tflops", "degraded_window",
            "device_exec_ms_b4", "device_exec_ms_b4_serving",
            "mAP50_scene", "mAP50_scene_hard", "mAP50_95_scene_hard",
            "weights", "waited_s")}
        results[prec] = keep
        print(f"{prec}: {json.dumps(keep)}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
