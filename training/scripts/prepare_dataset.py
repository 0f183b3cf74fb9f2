#!/usr/bin/env python3
"""Split raw captured images + YOLO labels into train/val trees.

Counterpart of reference training/scripts/prepare_dataset.py: 80/20 split,
writes the dataset YAML describing classes and paths.
"""
import argparse
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from telescope_cam_detection_tpu.train.data import find_pairs, split_pairs  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", required=True)
    parser.add_argument("--labels", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--val-fraction", type=float, default=0.2)
    parser.add_argument("--classes", nargs="+", required=True)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    pairs = find_pairs(args.images, args.labels)
    if not pairs:
        print("no image/label pairs found", file=sys.stderr)
        return 1
    train, val = split_pairs(pairs, args.val_fraction, args.seed)
    out = Path(args.out)
    for split, items in (("train", train), ("val", val)):
        for img, lbl in items:
            for sub, src in (("images", img), ("labels", lbl)):
                dst = out / split / sub / src.name
                dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(src, dst)
    yaml_path = out / "dataset.yaml"
    names = "\n".join(f"  {i}: {n}" for i, n in enumerate(args.classes))
    yaml_path.write_text(
        f"path: {out.resolve()}\ntrain: train/images\nval: val/images\n"
        f"nc: {len(args.classes)}\nnames:\n{names}\n")
    print(f"{len(train)} train / {len(val)} val -> {out}")
    print(f"dataset yaml: {yaml_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
