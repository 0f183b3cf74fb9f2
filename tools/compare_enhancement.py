#!/usr/bin/env python
"""A/B comparison of Stage-2 crop-enhancement methods.

The reference lists this as a future enhancement: "A/B testing framework
to compare methods" (reference docs/features/STAGE2_ENHANCEMENT_OPTIONS.md
"Future Enhancements"). This runs every method over the same crops and
reports, per method:

  * image metrics — contrast gain (gray stddev ratio), entropy gain
    (Shannon bits of the gray histogram), mean-luma shift: objective,
    weight-free quality proxies;
  * latency — ms/crop through the real enhancement path (jitted device
    CLAHE/bilateral, RRDBNet for realesrgan);
  * (with --weights + --taxonomy) classifier impact — mean top-1
    confidence and top-1 agreement vs the un-enhanced baseline, the
    metric that actually decides which method serves.

Crops come from --crops-dir (any jpg/png tree, e.g. saved snapshot raw/
products) or are synthesized as low-light wildlife-like patches when no
directory is given (zero-egress default).

Usage:
  python tools/compare_enhancement.py [--crops-dir clips/cam1/raw]
      [--methods none clahe auto realesrgan] [--limit 64]
      [--weights eva02.msgpack --taxonomy taxonomy.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_crops(crops_dir, limit):
    import cv2
    crops = []
    for p in sorted(Path(crops_dir).rglob("*")):
        if p.suffix.lower() not in (".jpg", ".jpeg", ".png"):
            continue
        img = cv2.imread(str(p))
        if img is not None:
            crops.append(img)
        if len(crops) >= limit:
            break
    return crops


def _synth_crops(n, seed=0, hw=(128, 128)):
    """Low-light wildlife-like patches: dim textured background + a
    brighter elliptical blob, mild sensor noise."""
    import cv2
    rng = np.random.default_rng(seed)
    crops = []
    for _ in range(n):
        base = rng.normal(45, 10, (*hw, 3))
        img = base.clip(0, 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (7, 7), 0)
        center = (int(rng.uniform(0.3, 0.7) * hw[1]),
                  int(rng.uniform(0.3, 0.7) * hw[0]))
        axes = (int(rng.uniform(0.15, 0.3) * hw[1]),
                int(rng.uniform(0.1, 0.25) * hw[0]))
        tone = int(rng.uniform(70, 110))
        cv2.ellipse(img, center, axes, rng.uniform(0, 180), 0, 360,
                    (tone, tone, tone), -1)
        noise = rng.normal(0, 6, img.shape)
        crops.append((img + noise).clip(0, 255).astype(np.uint8))
    return crops


def _gray(img):
    return (0.114 * img[..., 0].astype(np.float64)
            + 0.587 * img[..., 1] + 0.299 * img[..., 2])


def _entropy_bits(gray):
    hist, _ = np.histogram(gray, bins=256, range=(0, 256))
    p = hist / max(hist.sum(), 1)
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--crops-dir", default=None,
                    help="folder of crop images (default: synthesize)")
    ap.add_argument("--limit", type=int, default=32)
    ap.add_argument("--methods", nargs="+",
                    default=["none", "clahe", "auto"],
                    choices=["none", "clahe", "auto", "realesrgan"])
    ap.add_argument("--weights", default=None,
                    help="classifier weights msgpack (adds confidence A/B)")
    ap.add_argument("--taxonomy", default=None)
    ap.add_argument("--variant", default="eva02-large")
    ap.add_argument("--classifier-size", type=int, default=336)
    args = ap.parse_args(argv)

    from telescope_cam_detection_tpu.pipeline.enhancement import (
        ImageEnhancer)

    crops = (_load_crops(args.crops_dir, args.limit) if args.crops_dir
             else _synth_crops(args.limit))
    if not crops:
        print("no crops found", file=sys.stderr)
        return 2
    print(f"comparing {args.methods} over {len(crops)} crops "
          f"({'dir ' + args.crops_dir if args.crops_dir else 'synthetic'})")

    classifier = None
    if args.weights:
        from telescope_cam_detection_tpu.models.convert import load_variables
        from telescope_cam_detection_tpu.pipeline.species import (
            SpeciesClassifier)
        classifier = SpeciesClassifier(
            model_name=args.variant, input_size=args.classifier_size,
            taxonomy_file=args.taxonomy,
            variables=load_variables(args.weights))

    baseline_top1 = None
    results = {}
    for method in args.methods:
        enh = ImageEnhancer(method=method, bilateral_d=5)
        outs, times = [], []
        for crop in crops:
            t0 = time.perf_counter()
            outs.append(enh.enhance(crop))
            times.append((time.perf_counter() - t0) * 1000.0)
        contrast_gain, entropy_gain, luma_shift = [], [], []
        for crop, out in zip(crops, outs):
            g0, g1 = _gray(crop), _gray(out)
            contrast_gain.append((g1.std() + 1e-6) / (g0.std() + 1e-6))
            entropy_gain.append(_entropy_bits(g1) - _entropy_bits(g0))
            luma_shift.append(float(g1.mean() - g0.mean()))
        row = {
            "contrast_gain": round(float(np.mean(contrast_gain)), 3),
            "entropy_gain_bits": round(float(np.mean(entropy_gain)), 3),
            "luma_shift": round(float(np.mean(luma_shift)), 2),
            # first call includes compile; report warm median
            "ms_per_crop_p50": round(float(np.median(times[1:] or times)), 2),
        }
        if method == "auto":
            row["auto_enhanced"] = enh.auto_enhanced
            row["auto_passthrough"] = enh.auto_passthrough
        if classifier is not None:
            preds = [classifier.classify(o, top_k=1) for o in outs]
            top1 = [(p[0]["species_name"], p[0]["confidence"]) if p
                    else (None, 0.0) for p in preds]
            row["mean_top1_confidence"] = round(
                float(np.mean([c for _, c in top1])), 4)
            if method == "none":
                baseline_top1 = top1
            elif baseline_top1 is not None:
                agree = np.mean([a[0] == b[0]
                                 for a, b in zip(top1, baseline_top1)])
                row["top1_agreement_vs_none"] = round(float(agree), 3)
        results[method] = row

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
