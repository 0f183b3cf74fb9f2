#!/usr/bin/env python3
"""Poll /stats and report per-camera FPS + cross-camera lag.

Counterpart of reference scripts/monitor_camera_lag.py: watches capture
frame timestamps across cameras and flags cameras falling behind.
"""
import argparse
import json
import sys
import time
import urllib.request


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--interval", type=float, default=2.0)
    parser.add_argument("--iterations", type=int, default=0,
                        help="0 = run forever")
    parser.add_argument("--lag-threshold", type=float, default=2.0,
                        help="seconds behind the freshest camera to flag")
    args = parser.parse_args()

    url = f"http://{args.host}:{args.port}/stats"
    i = 0
    while args.iterations == 0 or i < args.iterations:
        i += 1
        try:
            with urllib.request.urlopen(url, timeout=5) as resp:
                stats = json.load(resp)
        except OSError as e:
            print(f"stats unavailable: {e}", file=sys.stderr)
            time.sleep(args.interval)
            continue
        cams = stats.get("cameras", {})
        if not cams:
            print("no cameras")
        else:
            freshest = max(c.get("last_frame_time", 0) for c in cams.values())
            rows = []
            for cid, c in sorted(cams.items()):
                lag = freshest - c.get("last_frame_time", 0)
                flag = " <-- LAGGING" if lag > args.lag_threshold else ""
                rows.append(f"{cid}: {c.get('fps', 0):5.1f} fps, "
                            f"lag {lag:5.2f}s, drops {c.get('frames_dropped', 0)}"
                            f"{flag}")
            print(time.strftime("%H:%M:%S"), " | ".join(rows))
        time.sleep(args.interval)
    return 0


if __name__ == "__main__":
    sys.exit(main())
