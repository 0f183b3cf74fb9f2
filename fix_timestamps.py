#!/usr/bin/env python3
"""Repair snapshot metadata timestamps from filenames.

Counterpart of reference fix_timestamps.py: product filenames embed
``YYYYmmdd_HHMMSS``; when metadata JSON timestamps are missing or corrupted
(e.g. clock jumps), rewrite them from the filename.
"""
import argparse
import json
import re
import sys
import time
from datetime import datetime
from pathlib import Path

STAMP_RE = re.compile(r"(\d{8}_\d{6})")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", default="clips")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    root = Path(args.dir)
    fixed = 0
    for meta_path in root.rglob("*.json"):
        try:
            meta = json.loads(meta_path.read_text())
        except (json.JSONDecodeError, OSError):
            continue
        m = STAMP_RE.search(meta_path.stem)
        if not m:
            continue
        try:
            file_ts = time.mktime(
                datetime.strptime(m.group(1), "%Y%m%d_%H%M%S").timetuple())
        except ValueError:
            continue
        meta_ts = meta.get("timestamp")
        if meta_ts is not None and abs(meta_ts - file_ts) < 120:
            continue  # consistent enough
        print(f"{meta_path}: {meta_ts} -> {file_ts}")
        if not args.dry_run:
            meta["timestamp"] = file_ts
            meta["datetime"] = time.strftime("%Y-%m-%d %H:%M:%S",
                                             time.localtime(file_ts))
            tmp = meta_path.with_suffix(".json.tmp")
            tmp.write_text(json.dumps(meta, indent=2))
            tmp.replace(meta_path)
        fixed += 1
    print(f"{'would fix' if args.dry_run else 'fixed'} {fixed} metadata files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
