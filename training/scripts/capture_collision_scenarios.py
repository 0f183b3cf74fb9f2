#!/usr/bin/env python3
"""Guided capture of telescope-collision training scenarios.

Counterpart of reference training/scripts/capture_collision_scenarios.py:
walks the operator through each staged scenario (Phase-3 collision-detection
dataset), captures a burst of frames per scenario, and tracks completion so
a session can resume. Scenario staging instructions are printed before each
burst; press Enter when the rig is positioned, 's' to skip, 'q' to quit.
"""
import argparse
import json
import os
import queue
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

# (name, staging instructions, frames, priority, file tag)
SCENARIOS = [
    ("Tripod legs adjacent", "Stand both tripods with legs nearly "
     "touching (1-2 in apart).", 40, "critical", "tripod_adjacent"),
    ("Tripod legs crossing", "Arrange the rigs so a slew would sweep one "
     "set of legs across the other's.", 40, "critical", "tripod_crossing"),
    ("Tripod near miss", "Leave a 6-12 in warning gap between leg sets.",
     40, "critical", "tripod_nearmiss"),
    ("Tubes pointed at each other", "Aim both optical tubes directly at "
     "each other, 6-24 in apart.", 50, "critical", "tubes_pointed"),
    ("Tube slew-path block", "Park one scope inside the arc the other "
     "would slew through.", 40, "high", "tubes_slew_path"),
    ("Counterweight near leg", "Slew until a counterweight bar passes "
     "within ~6 in of the neighboring tripod leg.", 50, "high",
     "counterweight_leg"),
    ("Counterweights crossing", "Position both mounts so the counterweight "
     "arcs intersect mid-slew.", 35, "high", "counterweight_crossing"),
    ("Mount heads close at altitude", "Raise both scopes to 70-85 degrees "
     "with mount heads 6-12 in apart.", 35, "high", "mount_heads"),
    ("Safe wide spacing", "Normal operating spacing, no hazard — negative "
     "examples.", 60, "baseline", "safe_spacing"),
    ("Safe parked", "Both scopes parked in home position.", 30, "baseline",
     "safe_parked"),
]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default=None, help="rtsp:// URL")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--output", default="training/collision_scenarios")
    parser.add_argument("--burst-fps", type=float, default=2.0,
                        help="frames per second within a burst")
    parser.add_argument("--auto", action="store_true",
                        help="no prompts (synthetic/CI runs)")
    parser.add_argument("--scenario", type=int, default=None,
                        help="capture only this scenario number (1-based)")
    args = parser.parse_args()

    import cv2
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from telescope_cam_detection_tpu.runtime.capture import (
        RTSPStreamCapture, SyntheticStreamCapture)

    q: "queue.Queue" = queue.Queue(maxsize=2)
    if args.synthetic:
        cap = SyntheticStreamCapture(q, width=640, height=640, fps=30)
    elif args.url:
        cap = RTSPStreamCapture(args.url, q)
    else:
        parser.error("need --url or --synthetic")

    os.makedirs(args.output, exist_ok=True)
    progress_path = os.path.join(args.output, "progress.json")
    progress = {}
    if os.path.exists(progress_path):
        with open(progress_path) as f:
            progress = json.load(f)
        print(f"resuming: {sum(progress.values())} scenarios already done")

    cap.start()
    try:
        for num, (name, instructions, frames, priority, tag) in enumerate(
                SCENARIOS, start=1):
            if args.scenario and num != args.scenario:
                continue
            if progress.get(tag):
                print(f"[{num}/{len(SCENARIOS)}] {name}: done, skipping")
                continue
            print(f"\n[{num}/{len(SCENARIOS)}] {name}  ({priority}, "
                  f"{frames} frames)\n  {instructions}")
            if not args.auto:
                ans = input("  Enter=capture  s=skip  q=quit > ").strip()
                if ans == "q":
                    break
                if ans == "s":
                    continue
            saved = 0
            period = 1.0 / max(args.burst_fps, 0.1)
            while saved < frames:
                try:
                    item = q.get(timeout=5.0)
                except queue.Empty:
                    print("  no frames from camera; retrying...")
                    continue
                stamp = datetime.now().strftime("%Y%m%d_%H%M%S_%f")[:-3]
                cv2.imwrite(os.path.join(
                    args.output, f"collision_{tag}_{stamp}.jpg"),
                    item["frame"])
                saved += 1
                print(f"\r  captured {saved}/{frames}", end="", flush=True)
                time.sleep(period)
            print()
            progress[tag] = True
            with open(progress_path, "w") as f:
                json.dump(progress, f)
    except KeyboardInterrupt:
        print("\ninterrupted; progress saved")
    finally:
        cap.stop()
    done = sum(bool(v) for v in progress.values())
    print(f"session complete: {done}/{len(SCENARIOS)} scenarios captured "
          f"-> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
