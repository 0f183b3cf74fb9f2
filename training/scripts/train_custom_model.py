#!/usr/bin/env python3
"""Fine-tune a Stage-1 detector (YOLOX or RT-DETR) on a custom dataset.

Counterpart of reference training/scripts/train_custom_model.py (ultralytics
YOLOv8 fine-tuning), rebuilt on the framework's jax trainer: sharded train
step over a (dp, mp) mesh, orbax checkpoints, msgpack serving export, mAP
evaluation per epoch. YOLOX variants train under the SimOTA loss; rtdetr*
variants train under Hungarian-matched VFL/L1/GIoU with deep supervision
(train/detr_loss.py) — a capability the reference lacks entirely (it only
consumes upstream RT-DETR checkpoints).

  python training/scripts/train_custom_model.py \
      --images training/datasets/desert_wildlife/images \
      --variant yolox-s --classes 10 --epochs 20 --batch 8 \
      --out runs/desert
  python training/scripts/train_custom_model.py --synthetic \
      --variant rtdetrv2-r18vd --classes 4 --epochs 5 --out runs/detr
  # hermetic smoke run (no data needed):
  python training/scripts/train_custom_model.py --synthetic --epochs 2 \
      --steps-per-epoch 5 --out /tmp/run
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", default=None)
    parser.add_argument("--labels", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--variant", default="yolox-nano")
    parser.add_argument("--classes", type=int, default=4)
    parser.add_argument("--input", nargs=2, type=int, default=[128, 128])
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--mesh", type=int, default=0,
                        help="shard over N devices (0 = single device)")
    parser.add_argument("--model-parallel", type=int, default=1)
    parser.add_argument("--out", required=True)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--assigner", default="simota",
                        choices=["simota", "center"])
    parser.add_argument("--dn-groups", type=int, default=2,
                        help="rtdetr contrastive-denoising groups "
                             "(0 disables CDN; yolox ignores)")
    parser.add_argument("--no-augment", action="store_true",
                        help="disable mosaic/mixup/flip/HSV augmentation")
    parser.add_argument("--eval-every", type=int, default=1,
                        help="epochs between held-out mAP evals "
                             "(0 disables)")
    parser.add_argument("--eval-limit", type=int, default=64,
                        help="max validation images per eval")
    parser.add_argument("--ema", type=float, default=0.9998,
                        help="EMA decay for exported weights (0 disables)")
    parser.add_argument("--warmup-epochs", type=float, default=1.0)
    parser.add_argument("--min-lr-ratio", type=float, default=0.05)
    parser.add_argument("--constant-lr", action="store_true",
                        help="disable the warmup+cosine schedule")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize blocks under grad "
                             "(jax.checkpoint): bigger batches per chip "
                             "for ~1 extra forward of FLOPs")
    parser.add_argument("--cpu", action="store_true",
                        help="force a virtual CPU mesh of --mesh devices "
                             "(hermetic smoke runs without TPU hardware)")
    args = parser.parse_args()

    if args.cpu:
        n = max(args.mesh, 1)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()
    from telescope_cam_detection_tpu.parallel.mesh import create_mesh
    from telescope_cam_detection_tpu.train.checkpoint import (
        export_serving_weights, restore_train_state, save_train_state)
    from telescope_cam_detection_tpu.train.data import (
        DetectionDataset, SyntheticDetectionDataset, find_pairs, split_pairs)
    from telescope_cam_detection_tpu.train.trainer import build_training

    input_hw = tuple(args.input)
    if args.synthetic:
        train_ds = SyntheticDetectionDataset(
            n=max(args.batch * (args.steps_per_epoch or 8), args.batch),
            input_hw=input_hw, num_classes=args.classes)
        val_ds = SyntheticDetectionDataset(n=args.batch, input_hw=input_hw,
                                           num_classes=args.classes, seed=99)
    else:
        if not args.images:
            parser.error("need --images or --synthetic")
        pairs = find_pairs(args.images, args.labels)
        if not pairs:
            print("no image/label pairs found", file=sys.stderr)
            return 1
        train_pairs, val_pairs = split_pairs(pairs)
        train_ds = DetectionDataset(train_pairs, input_hw)
        val_ds = DetectionDataset(val_pairs, input_hw)
    print(f"dataset: {len(train_ds)} train / {len(val_ds)} val")

    steps = args.steps_per_epoch or max(len(train_ds) // args.batch, 1)
    mesh = create_mesh(args.mesh, args.model_parallel) if args.mesh else None
    model, state, train_step = build_training(
        variant=args.variant, num_classes=args.classes, input_hw=input_hw,
        learning_rate=args.lr, mesh=mesh, assigner=args.assigner,
        total_steps=None if args.constant_lr else steps * args.epochs,
        warmup_steps=int(args.warmup_epochs * steps),
        min_lr_ratio=args.min_lr_ratio, ema_decay=args.ema,
        dn_groups=args.dn_groups, remat=args.remat)
    augment = None
    if not args.no_augment:
        from telescope_cam_detection_tpu.train.augment import Augmenter
        augment = Augmenter(seed=0)
    ckpt_dir = os.path.join(args.out, "checkpoints")
    if args.resume:
        state = restore_train_state(ckpt_dir, state)
        print(f"resumed at step {int(jax.device_get(state.step))}")

    loader = None
    if mesh is not None:
        # Multi-host-capable path: per-process loading + augment on a
        # prefetch thread, assembled into dp-sharded global arrays.
        from telescope_cam_detection_tpu.train.data import ShardedBatchLoader
        loader = ShardedBatchLoader(train_ds, args.batch, mesh,
                                    augment=augment)

    eval_fn = None
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        if loader is not None:
            batches = loader.epoch(epoch)
        else:
            batches = train_ds.batches(args.batch, seed=epoch, epochs=1)
        for imgs, lbls in batches:
            if loader is None:
                if augment is not None:
                    imgs_u8 = np.clip(imgs, 0, 255).astype(np.uint8)
                    imgs_u8, lbls = augment(imgs_u8, np.asarray(lbls))
                    imgs = imgs_u8.astype(np.float32)
                imgs, lbls = jnp.asarray(imgs), jnp.asarray(lbls)
            state, metrics = train_step(state, imgs, lbls)
            losses.append(float(jax.device_get(metrics["loss"])))
            if len(losses) >= steps:
                break
        msg = (f"epoch {epoch + 1}/{args.epochs}: loss "
               f"{np.mean(losses):.4f} ({time.time() - t0:.1f}s, "
               f"{len(losses)} steps)")
        # single-device eval only: mp-sharded params span hosts, and every
        # process would redundantly run the same loop on a mesh
        if args.eval_every and mesh is None \
                and (epoch + 1) % args.eval_every == 0:
            if eval_fn is None:
                from telescope_cam_detection_tpu.train.evaluate import (
                    make_eval_fn)
                family = ("rtdetr" if args.variant.startswith("rtdetr")
                          else "yolox")
                eval_fn = make_eval_fn(model, family=family)
            variables = {"params": jax.device_get(state.serving_params()),
                         "batch_stats": jax.device_get(state.batch_stats)}
            m = eval_fn(variables, val_ds, limit=args.eval_limit)
            msg += f" | val mAP50 {m['mAP50']:.3f} mAP50-95 {m['mAP50_95']:.3f}"
        print(msg)
        save_train_state(ckpt_dir, state)

    weights_path = os.path.join(args.out, f"{args.variant}_custom.msgpack")
    export_serving_weights(state, weights_path)
    print(f"serving weights -> {weights_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
