#!/usr/bin/env python3
"""Extract labeled-ready frames from a live camera for a fixed duration.

Counterpart of reference training/scripts/extract_frames_from_stream.py:
connects via camera credentials, samples one frame every --interval seconds
for --duration seconds, and writes timestamped JPEGs tagged with a session
description. Use capture_training_images.py instead for count-based or
motion-gated sampling.
"""
import argparse
import os
import queue
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ip", default=None, help="camera IP")
    parser.add_argument("--user", default="admin")
    parser.add_argument("--password", default=None)
    parser.add_argument("--protocol", default="rtsp-tcp")
    parser.add_argument("--stream", default="main")
    parser.add_argument("--url", default=None,
                        help="full rtsp:// URL (overrides --ip/--user)")
    parser.add_argument("--synthetic", action="store_true",
                        help="synthetic source (hermetic testing)")
    parser.add_argument("--output", default="training/raw_frames")
    parser.add_argument("--duration", type=int, default=300,
                        help="capture session length, seconds")
    parser.add_argument("--interval", type=float, default=1.0,
                        help="seconds between saved frames")
    parser.add_argument("--desc", default="session",
                        help="tag embedded in filenames")
    parser.add_argument("--quality", type=int, default=95)
    args = parser.parse_args()

    import cv2
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from telescope_cam_detection_tpu.runtime.capture import (
        RTSPStreamCapture, SyntheticStreamCapture, create_rtsp_url)

    q: "queue.Queue" = queue.Queue(maxsize=2)
    if args.synthetic:
        cap = SyntheticStreamCapture(q, width=640, height=640, fps=30)
    else:
        url = args.url or create_rtsp_url(
            ip=args.ip, username=args.user, password=args.password,
            protocol=args.protocol, stream=args.stream)
        if not url:
            parser.error("need --url, --ip(+--password), or --synthetic")
        cap = RTSPStreamCapture(url, q)

    os.makedirs(args.output, exist_ok=True)
    cap.start()
    saved = 0
    deadline = time.time() + args.duration
    next_save = 0.0
    try:
        while time.time() < deadline:
            try:
                item = q.get(timeout=2.0)
            except queue.Empty:
                continue
            now = time.time()
            if now < next_save:
                continue
            next_save = now + args.interval
            stamp = datetime.now().strftime("%Y%m%d_%H%M%S_%f")[:-3]
            path = os.path.join(args.output,
                                f"{args.desc}_{stamp}_{saved:05d}.jpg")
            cv2.imwrite(path, item["frame"],
                        [cv2.IMWRITE_JPEG_QUALITY, args.quality])
            saved += 1
            remaining = int(deadline - now)
            print(f"\rsaved {saved} frames ({remaining}s left) ", end="",
                  flush=True)
    except KeyboardInterrupt:
        pass
    finally:
        cap.stop()
    print(f"\ndone: {saved} frames -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
