#!/usr/bin/env python3
"""Fine-tune the Stage-2 species classifier (EVA02) on your own crops.

Capability the reference lacks: its classifier is a frozen timm checkpoint
(reference src/species_classifier.py:235-270) — deployments cannot adapt
it to their local species or camera imagery. This script fine-tunes the
Flax EVA02 (train/classifier.py: mixup, label smoothing, layer-wise LR
decay, EMA, optional (dp, mp) mesh sharding) on a folder-per-class crop
dataset (e.g. hand-sorted snapshot saver raw/ output) and exports:

  * <out>/<model>_species.msgpack — weights the serving SpeciesClassifier
    loads directly (species_classification.inat_classifier.weights);
  * <out>/taxonomy.json — class-id -> name list for
    species_classification.inat_classifier.taxonomy_file.

  python training/scripts/finetune_species_classifier.py \
      --images sorted_crops/ --model eva02-large --size 336 \
      --init-weights weights/eva02_inat.msgpack --epochs 10 --out runs/sp
  # hermetic smoke run (no data needed):
  python training/scripts/finetune_species_classifier.py --synthetic \
      --model eva02-tiny --size 64 --epochs 2 --out /tmp/sp
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", default=None,
                        help="root dir with one sub-folder per class")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--model", default="eva02-large")
    parser.add_argument("--size", type=int, default=336)
    parser.add_argument("--classes", type=int, default=4,
                        help="synthetic mode only (folders define it else)")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight-decay", type=float, default=0.05)
    parser.add_argument("--layer-decay", type=float, default=0.75)
    parser.add_argument("--label-smoothing", type=float, default=0.1)
    parser.add_argument("--no-mixup", action="store_true")
    parser.add_argument("--ema", type=float, default=0.9998)
    parser.add_argument("--warmup-epochs", type=float, default=1.0)
    parser.add_argument("--init-weights", default=None,
                        help="pretrained .msgpack to start from (a head of "
                             "a different class count is re-initialized)")
    parser.add_argument("--mesh", type=int, default=0)
    parser.add_argument("--model-parallel", type=int, default=1)
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize blocks under grad "
                             "(jax.checkpoint): bigger batches per chip "
                             "for ~1 extra forward of FLOPs")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out", required=True)
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
    from telescope_cam_detection_tpu.models.convert import (
        load_variables, save_variables)
    from telescope_cam_detection_tpu.parallel.mesh import create_mesh
    from telescope_cam_detection_tpu.train.classifier import (
        build_classifier_training)
    from telescope_cam_detection_tpu.train.data import (
        ClassificationFolderDataset, SyntheticClassificationDataset)

    if args.synthetic:
        ds = SyntheticClassificationDataset(
            n=max(args.batch * (args.steps_per_epoch or 8), args.batch),
            image_size=args.size, num_classes=args.classes)
    else:
        if not args.images:
            parser.error("need --images or --synthetic")
        ds = ClassificationFolderDataset(args.images, args.size)
        if not len(ds):
            print("no images found", file=sys.stderr)
            return 1
    print(f"dataset: {len(ds)} crops, {ds.num_classes} classes")
    if len(ds) < args.batch:
        args.batch = len(ds)
        print(f"dataset smaller than batch; training at batch {args.batch}")
    dp = max(args.mesh, 1) // max(args.model_parallel, 1)
    if args.mesh and args.batch % max(dp, 1):
        parser.error(f"--batch {args.batch} must be divisible by the dp "
                     f"axis size ({dp} = mesh/model_parallel) for sharded "
                     f"training")

    init_vars = None
    if args.init_weights:
        init_vars = load_variables(args.init_weights)
        if init_vars is None:
            print(f"could not load {args.init_weights}", file=sys.stderr)
            return 1

    steps = args.steps_per_epoch or max(len(ds) // args.batch, 1)
    mesh = create_mesh(args.mesh, args.model_parallel) if args.mesh else None
    model, state, step = build_classifier_training(
        model_name=args.model, num_classes=ds.num_classes,
        image_size=args.size, learning_rate=args.lr,
        weight_decay=args.weight_decay, layer_decay=args.layer_decay,
        mesh=mesh, total_steps=steps * args.epochs,
        warmup_steps=int(args.warmup_epochs * steps), ema_decay=args.ema,
        use_mixup=not args.no_mixup, label_smoothing=args.label_smoothing,
        init_variables=init_vars, remat=args.remat)

    loader = None
    if mesh is not None:
        # multi-host path: per-process loading, dp-sharded global arrays
        from telescope_cam_detection_tpu.train.data import (
            OneHotView, ShardedBatchLoader)
        loader = ShardedBatchLoader(OneHotView(ds), args.batch, mesh)

    rng = jax.random.PRNGKey(0)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses, accs = [], []
        batches = (loader.epoch(epoch) if loader is not None
                   else ds.batches(args.batch, seed=epoch, epochs=1))
        for imgs, labels in batches:
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, jnp.asarray(imgs),
                                  jnp.asarray(labels), sub)
            losses.append(float(jax.device_get(metrics["loss"])))
            accs.append(float(jax.device_get(metrics["accuracy"])))
            if len(losses) >= steps:
                break
        print(f"epoch {epoch + 1}/{args.epochs}: loss {np.mean(losses):.4f} "
              f"acc {np.mean(accs):.3f} ({time.time() - t0:.1f}s, "
              f"{len(losses)} steps)")

    os.makedirs(args.out, exist_ok=True)
    weights_path = os.path.join(args.out, f"{args.model}_species.msgpack")
    save_variables({"params": jax.device_get(state.serving_params())},
                   weights_path)
    taxonomy_path = os.path.join(args.out, "taxonomy.json")
    with open(taxonomy_path, "w") as f:
        json.dump(list(ds.class_names), f, indent=1)
    print(f"serving weights -> {weights_path}")
    print(f"taxonomy       -> {taxonomy_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
