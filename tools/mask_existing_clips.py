#!/usr/bin/env python
"""Batch face-masking for already-saved snapshot/clip products.

The reference lists this as a known gap: "No batch masking tool (yet):
Existing clips must be manually reprocessed" (reference
docs/features/PRIVACY_MASKING.md "Current Limitations" / "Planned
Enhancements"). This closes it: walk a clips directory (the
SnapshotSaver layout — per-camera raw/ images, metadata JSON, mp4 clips)
and write masked copies with the same FaceMasker the live pipeline uses.

  images  <cam>/raw/NAME.jpg   -> <cam>/masked/NAME.jpg  (saver layout)
          other .jpg/.png      -> sibling NAME_masked.<ext>
  clips   <cam>/NAME.mp4       -> <cam>/NAME_masked.mp4 (frame-by-frame)

Already-masked outputs are skipped unless --overwrite; originals are
never modified or deleted (retention policy stays the operator's call).

Usage:
  python tools/mask_existing_clips.py clips/ [--style pixelate]
      [--min-face-size 30] [--overwrite] [--dry-run]
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
logger = logging.getLogger("mask_existing_clips")

IMAGE_EXTS = (".jpg", ".jpeg", ".png")


def mask_image(masker, src: Path, dst: Path, dry_run: bool,
               jpeg_quality: int) -> bool:
    import cv2
    if dry_run:
        logger.info("would mask %s -> %s", src, dst)
        return True
    frame = cv2.imread(str(src))
    if frame is None:
        logger.warning("unreadable image: %s", src)
        return False
    masked = masker.mask_frame(frame)
    dst.parent.mkdir(parents=True, exist_ok=True)
    params = ([cv2.IMWRITE_JPEG_QUALITY, jpeg_quality]
              if dst.suffix.lower() in (".jpg", ".jpeg") else [])
    if not cv2.imwrite(str(dst), masked, params):
        logger.warning("write failed: %s", dst)
        return False
    return True


def mask_clip(masker, src: Path, dst: Path, dry_run: bool) -> bool:
    import cv2
    if dry_run:
        logger.info("would mask %s -> %s", src, dst)
        return True
    cap = cv2.VideoCapture(str(src))
    if not cap.isOpened():
        logger.warning("unreadable clip: %s", src)
        return False
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(str(dst), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        # a silently-unopened writer would report success while writing
        # nothing — the one failure mode a privacy tool must not have
        logger.warning("VideoWriter failed to open (codec?): %s", dst)
        cap.release()
        try:
            dst.unlink()
        except OSError:
            pass
        return False
    frames = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            writer.write(masker.mask_frame(frame, copy=False))
            frames += 1
    finally:
        cap.release()
        writer.release()
    if frames == 0:
        logger.warning("no frames decoded: %s", src)
        try:
            dst.unlink()
        except OSError:
            pass
        return False
    logger.info("masked %d frames: %s", frames, dst.name)
    return True


def plan_outputs(root: Path):
    """Yield (kind, src, dst) for every maskable product under root."""
    for src in sorted(root.rglob("*")):
        if not src.is_file():
            continue
        suffix = src.suffix.lower()
        if suffix in IMAGE_EXTS:
            if src.parent.name == "masked" or "_masked" in src.stem:
                continue  # already a masked output
            if src.parent.name == "raw":
                # saver layout: mirror into the sibling masked/ tree
                dst = src.parent.parent / "masked" / src.name
            elif src.parent.name == "annotated":
                continue  # derived product; mask raw instead
            else:
                dst = src.with_name(f"{src.stem}_masked{src.suffix}")
            yield "image", src, dst
        elif suffix == ".mp4":
            if "_masked" in src.stem:
                continue
            yield "clip", src, src.with_name(f"{src.stem}_masked.mp4")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("clips_dir", help="clips/ directory to walk")
    ap.add_argument("--style", default="gaussian_blur",
                    choices=["gaussian_blur", "pixelate", "black_box",
                             "adaptive_blur"])
    ap.add_argument("--min-face-size", type=int, default=30)
    ap.add_argument("--blur-strength", type=int, default=25)
    ap.add_argument("--jpeg-quality", type=int, default=85)
    ap.add_argument("--overwrite", action="store_true",
                    help="re-mask even when the output already exists")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    root = Path(args.clips_dir)
    if not root.is_dir():
        logger.error("not a directory: %s", root)
        return 2

    from telescope_cam_detection_tpu.pipeline.face_mask import FaceMasker
    masker = FaceMasker(mask_style=args.style,
                        min_face_size=args.min_face_size,
                        blur_strength=args.blur_strength,
                        require_backend=True)

    done = skipped = failed = 0
    for kind, src, dst in plan_outputs(root):
        if dst.exists() and not args.overwrite:
            skipped += 1
            continue
        ok = (mask_image(masker, src, dst, args.dry_run, args.jpeg_quality)
              if kind == "image" else
              mask_clip(masker, src, dst, args.dry_run))
        done += ok
        failed += not ok
    logger.info("masked %d product(s), skipped %d existing, %d failed",
                done, skipped, failed)
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
