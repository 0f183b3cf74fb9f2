#!/usr/bin/env python3
"""Prepare detector weights for this framework.

Counterpart of reference scripts/setup_wildlife_model.py: converts a Megvii
YOLOX torch checkpoint (.pth) to the framework-native msgpack format, or
creates a random-init checkpoint for smoke testing.

  python scripts/setup_model.py --variant yolox-s --torch yolox_s.pth \
      --out models/yolox/yolox_s.msgpack
  python scripts/setup_model.py --variant yolox-nano --random \
      --out models/yolox/yolox_nano_random.msgpack
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="yolox-s")
    parser.add_argument("--num-classes", type=int, default=80)
    parser.add_argument("--torch", default=None, help="source .pth checkpoint")
    parser.add_argument("--random", action="store_true")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from telescope_cam_detection_tpu.models.convert import (
        convert_yolox_from_torch, save_variables)
    from telescope_cam_detection_tpu.models.yolox import init_yolox

    _, variables = init_yolox(args.variant, args.num_classes, (64, 64))
    if args.torch:
        import torch
        ckpt = torch.load(args.torch, map_location="cpu", weights_only=True)
        state = ckpt.get("model", ckpt)
        variables = convert_yolox_from_torch(state, variables)
        print(f"converted torch checkpoint {args.torch}")
    elif not args.random:
        parser.error("need --torch <ckpt> or --random")
    save_variables(variables, args.out)
    print(f"saved {args.variant} weights -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
