#!/usr/bin/env python3
"""Browse saved snapshots/clips from the command line.

Counterpart of reference scripts/view_snapshots.py: lists products with
metadata, filters by camera/class/age, optional cleanup.
"""
import argparse
import json
import sys
import time
from pathlib import Path


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", default="clips")
    parser.add_argument("--camera", default=None)
    parser.add_argument("--class", dest="cls", default=None)
    parser.add_argument("--hours", type=float, default=None,
                        help="only show products newer than N hours")
    parser.add_argument("--limit", type=int, default=50)
    parser.add_argument("--delete-older-days", type=float, default=None)
    args = parser.parse_args()

    root = Path(args.dir)
    if not root.exists():
        print(f"no products directory at {root}")
        return 1

    if args.delete_older_days is not None:
        cutoff = time.time() - args.delete_older_days * 86400
        removed = 0
        for p in root.rglob("*"):
            if p.is_file() and p.stat().st_mtime < cutoff:
                p.unlink()
                removed += 1
        print(f"removed {removed} files older than {args.delete_older_days} days")
        return 0

    metas = sorted(root.rglob("*.json"),
                   key=lambda p: p.stat().st_mtime, reverse=True)
    shown = 0
    for meta_path in metas:
        if shown >= args.limit:
            break
        try:
            meta = json.loads(meta_path.read_text())
        except (json.JSONDecodeError, OSError):
            continue
        if args.camera and meta.get("camera_id") != args.camera:
            continue
        if args.cls and meta.get("trigger_class") != args.cls:
            continue
        if args.hours is not None and \
                time.time() - meta.get("timestamp", 0) > args.hours * 3600:
            continue
        dets = meta.get("detections", [])
        species = [d.get("species") for d in dets if d.get("species")]
        print(f"{meta.get('datetime')} [{meta.get('camera_id')}] "
              f"{meta.get('trigger_class')} "
              f"({meta.get('trigger_confidence', 0):.2f}) "
              f"{'/'.join(species) if species else ''} -> "
              f"{meta.get('media_path')}")
        shown += 1
    if shown == 0:
        print("no matching products")
    return 0


if __name__ == "__main__":
    sys.exit(main())
