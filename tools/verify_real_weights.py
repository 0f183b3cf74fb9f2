"""One-command real-weight gate (VERDICT r3 #7): prove a detector (and
optionally Stage-2) checkpoint serves correctly, end to end, with a single
PASS/FAIL line.

Stages (each reported, any failure fails the gate):
  1. convert   — load the checkpoint (Megvii YOLOX .pth via the torch
                 converter, or native .msgpack/.npz) into the serving tree.
  2. parity    — round-trip the loaded weights through the torch mirror
                 (tools/torch_yolox.py) and require IoU>=0.99, same class,
                 on every matched detection (the north-star gate,
                 tests/test_torch_parity.py semantics). SKIPs without torch.
  3. bench     — run bench.py with BENCH_WEIGHTS pointing at the converted
                 tree (short pass) and require a sane fps.
  4. stage2    — fuse the Stage-2 classifier into the gated program and
                 require its in-dispatch top-k to agree with the same
                 crops classified directly (fused-vs-unfused agreement).

Zero-egress note: with no --yolox argument the gate exercises itself on a
converter-exported STAND-IN (sharpened random weights written through the
torch name mapping), so the whole harness is verified runnable today; point
--yolox at a real Megvii checkpoint the moment one is reachable.

Usage:
  python tools/verify_real_weights.py                      # stand-in, nano
  python tools/verify_real_weights.py --yolox yolox_s.pth --variant yolox-s \
      [--eva02 eva02.msgpack] [--skip-bench]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(stage: str, status: str, detail: str = "") -> None:
    print(f"[verify] {stage:8s} {status}  {detail}", file=sys.stderr)


def make_standin(variant: str, tmp: str) -> str:
    """Converter-exported stand-in checkpoint: sharpened random flax vars
    written as a Megvii-named torch state dict (.pth) if torch is present,
    else as native .msgpack."""
    from telescope_cam_detection_tpu.models.convert import (
        export_yolox_to_torch_names, save_variables,
        sharpen_random_variables)
    from telescope_cam_detection_tpu.models.yolox import init_yolox
    _, variables = init_yolox(variant, 80, (256, 256), seed=3)
    variables = sharpen_random_variables(variables)
    try:
        import torch
        path = os.path.join(tmp, "standin.pth")
        state = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in export_yolox_to_torch_names(variables).items()}
        torch.save({"model": state}, path)
    except ImportError:
        path = os.path.join(tmp, "standin.msgpack")
        save_variables(variables, path)
    return path


def stage_convert(path: str, variant: str):
    from telescope_cam_detection_tpu.models.convert import (
        load_variables, trees_compatible)
    from telescope_cam_detection_tpu.models.yolox import init_yolox
    _, ref = init_yolox(variant, 80, (256, 256), seed=0)
    loaded = load_variables(path, reference_variables=ref)
    if loaded is None or not trees_compatible(loaded, ref):
        return None
    return loaded


def stage_parity(variant: str, variables) -> str:
    """'pass'/'fail: ...'/'skip: ...'."""
    try:
        import torch
        from tools.torch_yolox import TorchYOLOX, forward_numpy
    except ImportError as e:
        return f"skip: torch mirror unavailable ({e})"
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.models.convert import (
        export_yolox_to_torch_names)
    from telescope_cam_detection_tpu.models.yolox import (
        build_yolox, decode_outputs)
    from telescope_cam_detection_tpu.ops.nms import batched_nms
    from telescope_cam_detection_tpu.utils.frames import SyntheticFrameSource

    tm = TorchYOLOX(variant)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_yolox_to_torch_names(variables).items()}
    missing, unexpected = tm.load_state_dict(state, strict=False)
    real_missing = [m for m in missing if "num_batches_tracked" not in m]
    if unexpected or real_missing:
        return f"fail: converter name drift ({unexpected or real_missing})"

    src = SyntheticFrameSource(width=256, height=256, seed=1)
    frames = np.stack([src.frame_at(i) for i in range(2)]).astype(np.float32)
    model = build_yolox(variant, 80)
    outs = model.apply(variables, jnp.asarray(frames), train=False)
    fb, fo, fc = (np.asarray(a) for a in decode_outputs(outs))
    conf, iou_thr = 0.30, 0.45
    flax_rows = np.asarray(batched_nms(
        jnp.asarray(fb), jnp.asarray(fo), jnp.asarray(fc),
        conf_threshold=conf, iou_threshold=iou_thr, max_det=50,
        pre_nms_topk=256))
    tb, to, tc = forward_numpy(tm, frames)
    torch_rows = np.asarray(batched_nms(
        jnp.asarray(tb), jnp.asarray(to), jnp.asarray(tc),
        conf_threshold=conf, iou_threshold=iou_thr, max_det=50,
        pre_nms_topk=256))

    matched = 0
    for b in range(len(frames)):
        src_rows = flax_rows[b][flax_rows[b][:, 5] >= 0]
        dst_rows = torch_rows[b][torch_rows[b][:, 5] >= 0]
        if len(src_rows) != len(dst_rows):
            return (f"fail: row-count mismatch frame {b} "
                    f"({len(src_rows)} vs {len(dst_rows)})")
        for row in src_rows:
            x1 = np.maximum(row[0], dst_rows[:, 0])
            y1 = np.maximum(row[1], dst_rows[:, 1])
            x2 = np.minimum(row[2], dst_rows[:, 2])
            y2 = np.minimum(row[3], dst_rows[:, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            a1 = (row[2] - row[0]) * (row[3] - row[1])
            a2 = (dst_rows[:, 2] - dst_rows[:, 0]) * \
                (dst_rows[:, 3] - dst_rows[:, 1])
            iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
            j = int(np.argmax(iou))
            if iou[j] < 0.99:
                return f"fail: IoU {iou[j]:.4f} < 0.99"
            if int(row[6]) != int(dst_rows[j][6]):
                return "fail: class mismatch on matched rows"
            matched += 1
    return f"pass ({matched} rows matched, IoU>=0.99)"


def stage_bench(variables, tmp: str) -> str:
    from telescope_cam_detection_tpu.models.convert import save_variables
    wpath = os.path.join(tmp, "verified.msgpack")
    save_variables(variables, wpath)
    env = dict(os.environ)
    env.update(BENCH_WEIGHTS=wpath, BENCH_ITERS="6", BENCH_PASSES="1",
               BENCH_WARMUP="1", BENCH_CYCLE="8", BENCH_MAP="0",
               BENCH_SERIAL_PROBE="0", BENCH_DEVICE_EXEC="0")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                          env=env, capture_output=True, text=True,
                          timeout=1800)
    if proc.returncode != 0:
        return f"fail: bench rc={proc.returncode}: {proc.stderr[-300:]}"
    try:
        out = json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return f"fail: unparseable bench output: {proc.stdout[-200:]}"
    if out.get("weights") != "file" or out.get("value", 0) <= 0:
        return f"fail: bench did not serve the checkpoint: {out}"
    return f"pass ({out['value']} {out.get('unit', 'fps')})"


def stage_fused_stage2(variant: str, variables, eva02_path) -> str:
    import jax
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.models.eva02 import init_eva02
    from telescope_cam_detection_tpu.ops.crops import sample_crops
    from telescope_cam_detection_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
    from telescope_cam_detection_tpu.runtime.program import (
        DetectorProgram, FilterSettings, ProgramSpec)

    hw, s2_size, n_cls = (256, 256), 56, 16
    model, s2_vars = init_eva02("eva02-tiny", n_cls, s2_size, seed=1)
    if eva02_path:
        from telescope_cam_detection_tpu.models.convert import load_variables
        loaded = load_variables(eva02_path, reference_variables=s2_vars)
        if loaded is None:
            return f"fail: eva02 checkpoint unloadable: {eva02_path}"
        s2_vars = loaded
    prog = DetectorProgram(
        ProgramSpec(variant=variant, input_hw=hw, gates="device",
                    gate_lanes=1, gate_blur_size=5, gate_motion_blur_size=5,
                    max_det=16),
        variables=variables)
    prog.update_filters(FilterSettings(conf_threshold=0.05,
                                       wildlife_only=False))
    prog.attach_classifier(model, s2_vars, input_size=s2_size, max_crops=2,
                           crop_padding_percent=20)
    rng = np.random.default_rng(0)
    frame = rng.integers(40, 90, (*hw, 3), np.uint8)
    frame[60:180, 80:200] = 220
    rows, aux = prog.detect_batch_gated(frame[None], lanes=[0])
    if aux is None or not aux["species_valid"].any():
        return "fail: fused dispatch produced no classified crops"
    # unfused: classify the SAME selected rows directly (host-style path)
    c = int(np.argmax(aux["species_valid"][0]))
    r = rows[0][int(aux["species_row"][0][c])]
    x1, y1, x2, y2 = r[:4]
    bw, bh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
    px1, py1 = max(x1 - bw * 0.1, 0), max(y1 - bh * 0.1, 0)
    px2 = min(x2 + bw * 0.1, hw[1])
    py2 = min(y2 + bh * 0.1, hw[0])
    flat = jnp.asarray([[0.0, px1, py1, px2, py2]], jnp.float32)
    crops = sample_crops(jnp.asarray(frame[None]), flat, (s2_size, s2_size))
    x = crops[..., ::-1] / 255.0
    x = (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(
        CLIP_STD, np.float32)
    logits = model.apply(s2_vars, x, train=False)
    probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), -1))[0]
    fused_ids = aux["species_id"][0][c]
    fused_probs = aux["species_prob"][0][c]
    direct_top = np.argsort(-probs)[:len(fused_ids)]
    if int(fused_ids[0]) != int(direct_top[0]):
        return (f"fail: fused top-1 {fused_ids[0]} != direct "
                f"{direct_top[0]}")
    if abs(float(fused_probs[0]) - float(probs[direct_top[0]])) > 1e-3:
        return "fail: fused/direct top-1 probability drift > 1e-3"
    return "pass (fused == direct classification)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--yolox", help="YOLOX checkpoint (.pth/.msgpack/.npz); "
                                    "omitted = converter stand-in")
    ap.add_argument("--eva02", help="EVA02 Stage-2 checkpoint (optional)")
    ap.add_argument("--variant", default=None,
                    help="default: yolox-s for real weights, yolox-nano for "
                         "the stand-in")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()
    variant = args.variant or ("yolox-s" if args.yolox else "yolox-nano")

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        path = args.yolox or make_standin(variant, tmp)
        source = "real" if args.yolox else "stand-in"
        variables = stage_convert(path, variant)
        results["convert"] = ("pass" if variables is not None
                              else f"fail: {path} unloadable/incompatible")
        log("convert", results["convert"], f"{source}: {path}")
        if variables is None:
            print(f"VERIFY_REAL_WEIGHTS FAIL convert ({path})")
            return 1

        results["parity"] = stage_parity(variant, variables)
        log("parity", results["parity"])

        if args.skip_bench:
            results["bench"] = "skip: --skip-bench"
        else:
            results["bench"] = stage_bench(variables, tmp)
        log("bench", results["bench"])

        results["stage2"] = stage_fused_stage2(variant, variables, args.eva02)
        log("stage2", results["stage2"])

    failed = [k for k, v in results.items() if v.startswith("fail")]
    summary = "; ".join(f"{k}={v}" for k, v in results.items())
    if failed:
        print(f"VERIFY_REAL_WEIGHTS FAIL [{', '.join(failed)}] {summary}")
        return 1
    print(f"VERIFY_REAL_WEIGHTS PASS ({source} {variant}) {summary}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
