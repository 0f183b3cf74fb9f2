"""Measure encoded-video CPU decode throughput (SURVEY §7 hard part 4).

The reference ingests live RTSP H.264 and, on GPU hosts, decodes with
NVDEC (reference src/stream_capture_gpu_ffmpeg.py:101-117). TPU hosts have
no NVDEC: the north-star 8x1440p@30 target needs ~240 fps of CPU decode,
which SURVEY flagged as a conjecture to measure. This tool produces that
answer on the current host, zero-egress:

  1. synthesize a realistic 1440p clip (SyntheticFrameSource: correlated
     background + moving subject + sensor noise — NOT compressible black);
  2. encode it with the best codec cv2 ships here (avc1/H.264 if present,
     else mp4v/MPEG-4 pt2 — recorded in the artifact);
  3. measure single-stream decode fps, then aggregate decode fps with N
     concurrent decoder threads (cv2 releases the GIL in read());
  4. report how many 30 fps streams the host sustains at main-stream
     resolution, and at the 640x360 sub-stream the reference recommends
     for detection (config.yaml "stream: sub").

Writes docs/traces/decode_throughput.json and prints it.
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_JSON = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "traces", "decode_throughput.json")


def write_clip(path, w, h, n_frames, fps=30):
    import cv2
    from telescope_cam_detection_tpu.utils.frames import SyntheticFrameSource
    src = SyntheticFrameSource(width=w, height=h, seed=0)
    for fourcc_name in ("avc1", "mp4v"):
        fourcc = cv2.VideoWriter_fourcc(*fourcc_name)
        wr = cv2.VideoWriter(path, fourcc, fps, (w, h))
        if wr.isOpened():
            break
        wr.release()
    else:
        raise RuntimeError("no usable mp4 codec in this cv2 build")
    t0 = time.perf_counter()
    for i in range(n_frames):
        wr.write(src.frame_at(i))
    wr.release()
    encode_s = time.perf_counter() - t0
    size_mb = os.path.getsize(path) / 1e6
    return fourcc_name, encode_s, size_mb


def decode_once(path):
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open {path}")
    n = 0
    t0 = time.perf_counter()
    while True:
        ok, _ = cap.read()
        if not ok:
            break
        n += 1
    dt = time.perf_counter() - t0
    cap.release()
    return n, dt


def decode_parallel(path, n_threads):
    """N independent decoder threads over the same file (each its own
    VideoCapture — the per-camera model): aggregate decoded fps."""
    results = [None] * n_threads
    def work(i):
        results[i] = decode_once(path)
    threads = [threading.Thread(target=work, args=(i,))
               for i in range(n_threads)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total = sum(n for n, _ in results)
    return total / wall, wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--threads", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--out", default=OUT_JSON)
    args = ap.parse_args()

    import cv2
    ncpu = os.cpu_count()
    out = {"host_cpus": ncpu, "opencv": cv2.__version__,
           "frames_per_clip": args.frames, "resolutions": {}}
    for label, (w, h) in (("1440p_main", (2560, 1440)),
                          ("360p_sub", (640, 360))):
        path = f"/tmp/decode_probe_{label}.mp4"
        codec, encode_s, size_mb = write_clip(path, w, h, args.frames)
        n, dt = decode_once(path)
        if n != args.frames:
            print(f"warning: {label} decoded {n}/{args.frames} frames",
                  file=sys.stderr)
        entry = {"codec": codec, "clip_mb": round(size_mb, 1),
                 "encode_fps": round(args.frames / encode_s, 1),
                 "decode_fps_1thread": round(n / dt, 1),
                 "parallel": {}}
        best = n / dt
        for nt in args.threads:
            fps, wall = decode_parallel(path, nt)
            entry["parallel"][str(nt)] = round(fps, 1)
            best = max(best, fps)
        entry["max_aggregate_fps"] = round(best, 1)
        entry["streams_at_30fps"] = int(best // 30)
        out["resolutions"][label] = entry
        os.unlink(path)

    m = out["resolutions"]
    out["verdict_8x1440p30"] = (
        "yes" if m["1440p_main"]["streams_at_30fps"] >= 8 else
        "no-use-substreams" if m["360p_sub"]["streams_at_30fps"] >= 8
        else "no")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
