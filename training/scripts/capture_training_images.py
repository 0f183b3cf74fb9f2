#!/usr/bin/env python3
"""Capture training images from a live stream (or synthetic source).

Counterpart of reference training/scripts/capture_training_images.py /
extract_frames_from_stream.py: samples frames at an interval, optionally
only when the empty-frame gate sees motion, writes JPEGs for labeling.
"""
import argparse
import os
import queue
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default=None, help="rtsp:// or video file")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--out", required=True)
    parser.add_argument("--count", type=int, default=100)
    parser.add_argument("--interval", type=float, default=1.0,
                        help="seconds between saved frames")
    parser.add_argument("--motion-only", action="store_true")
    args = parser.parse_args()

    import cv2
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from telescope_cam_detection_tpu.pipeline.filters import EmptyFrameFilter
    from telescope_cam_detection_tpu.runtime.capture import (
        FileStreamCapture, RTSPStreamCapture, SyntheticStreamCapture)

    q: "queue.Queue" = queue.Queue(maxsize=2)
    if args.synthetic:
        cap = SyntheticStreamCapture(q, width=640, height=640, fps=30)
    elif args.url and args.url.startswith("rtsp"):
        cap = RTSPStreamCapture(args.url, q)
    elif args.url:
        cap = FileStreamCapture(args.url, q)
    else:
        parser.error("need --url or --synthetic")
    gate = EmptyFrameFilter(min_motion_area=200) if args.motion_only else None

    os.makedirs(args.out, exist_ok=True)
    if not cap.start():
        print("stream failed to open", file=sys.stderr)
        return 1
    saved = 0
    last_save = 0.0
    try:
        while saved < args.count:
            try:
                item = q.get(timeout=5)
            except queue.Empty:
                print("no frames arriving; giving up", file=sys.stderr)
                break
            if time.time() - last_save < args.interval:
                continue
            frame = item["frame"]
            if gate is not None and not gate.has_motion(frame):
                continue
            name = os.path.join(
                args.out, f"frame_{time.strftime('%Y%m%d_%H%M%S')}_{saved:05d}.jpg")
            cv2.imwrite(name, frame)
            saved += 1
            last_save = time.time()
            print(f"\rsaved {saved}/{args.count}", end="")
    finally:
        cap.stop()
    print(f"\ndone: {saved} frames in {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
