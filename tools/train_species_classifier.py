"""Train the Stage-2 species classifier checkpoint the bench/serving ships.

Round-4 verdict: "Stage-2 rides random weights everywhere it's measured" —
the detector got a trained, committed checkpoint (train_bench_weights.py)
but the species classifier had architecture+parity only, so every
soak/bench exercised Stage-2 latency, never discrimination. This tool is
the classifier's equivalent: fine-tune an EVA02 variant on the closed
synthetic taxonomy (utils.frames.SPECIES_TABLE — 16 species across 4
genera / 2 families, distinguishable by pattern statistics), evaluate
top-1/top-5 THROUGH the serving SpeciesClassifier program (the exact
preprocess+forward+top-k path the two-stage pipeline dispatches), and ship:

  * weights/eva02_species.npz   — fp16 checkpoint (auto-loaded by bench.py
    for the species_top1 artifact field; servable via
    species_classification.inat_classifier.weights)
  * weights/eva02_species.json  — sidecar metadata (earned accuracy)
  * weights/species_taxonomy.json — taxonomy for hierarchical labels
    (species_classification.inat_classifier.taxonomy_file)

Reference bar: the reference serves EVA02-L iNat-2021 at 92% top-1 / 98%
top-5 over 10k species (reference docs/architecture/ARCHITECTURE.md:281,
loaded at src/species_classifier.py:250-268). This is the zero-egress
equivalent: a real trained checkpoint over the taxonomy this repo's
synthetic scenes actually contain.

Usage (CPU trains eva02-tiny@112 in ~10 min):
    python tools/train_species_classifier.py [--steps 800] [--batch 32]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "weights")
DEFAULT_OUT = os.path.join(WEIGHTS_DIR, "eva02_species.npz")
TAXONOMY_OUT = os.path.join(WEIGHTS_DIR, "species_taxonomy.json")


def preload(ds):
    import numpy as np
    imgs, labels = [], []
    for i in range(len(ds)):
        img, cid = ds.load(i)
        imgs.append(img)
        labels.append(cid)
    return np.stack(imgs), np.asarray(labels, np.int64)


def evaluate_serving(variables, args, seed, n, taxonomy_path):
    """Top-1/top-5 + genus/family accuracy through the SERVING
    SpeciesClassifier's jitted program (preprocess fused, same pixels the
    two-stage pipeline classifies)."""
    import numpy as np
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.pipeline.species import SpeciesClassifier
    from telescope_cam_detection_tpu.train.data import SpeciesCropDataset
    from telescope_cam_detection_tpu.utils.frames import SPECIES_TABLE

    clf = SpeciesClassifier(
        model_name=args.variant, num_classes=len(SPECIES_TABLE),
        input_size=args.size, taxonomy_file=taxonomy_path,
        variables=variables, param_dtype=jnp.float32)
    ds = SpeciesCropDataset(n=n, image_size=args.size, seed=seed)
    crops, labels = preload(ds)
    fn = clf._program(args.eval_batch, (args.size, args.size))
    top1 = top5 = genus1 = family1 = 0
    species_level = 0
    for s in range(0, len(crops), args.eval_batch):
        chunk = crops[s:s + args.eval_batch]
        buf = np.zeros((args.eval_batch, *crops.shape[1:]), np.uint8)
        buf[:len(chunk)] = chunk
        top_p, top_i = fn(clf.variables, jnp.asarray(buf))
        top_p = np.asarray(top_p)[:len(chunk)]
        top_i = np.asarray(top_i)[:len(chunk)]
        for j in range(len(chunk)):
            true = int(labels[s + j])
            pred = int(top_i[j, 0])
            top1 += pred == true
            top5 += true in top_i[j, :5].tolist()
            genus1 += (SPECIES_TABLE[pred]["genus"]
                       == SPECIES_TABLE[true]["genus"])
            family1 += (SPECIES_TABLE[pred]["family"]
                        == SPECIES_TABLE[true]["family"])
            species_level += float(top_p[j, 0]) >= 0.5
    n_eval = len(crops)
    return {
        "top1": round(top1 / n_eval, 4),
        "top5": round(top5 / n_eval, 4),
        "genus_top1": round(genus1 / n_eval, 4),
        "family_top1": round(family1 / n_eval, 4),
        # fraction answered at species level by the hierarchical bands
        # (confidence >= 0.5; below that serving falls back to genus)
        "species_level_rate": round(species_level / n_eval, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="eva02-tiny")
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--train-n", type=int, default=4096)
    ap.add_argument("--val-n", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--layer-decay", type=float, default=1.0,
                    help="layer-wise LR decay; <1 is a FINE-TUNE recipe "
                         "(damps early layers) — from-scratch training "
                         "wants 1.0")
    ap.add_argument("--no-mixup", action="store_true")
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--init-from", default=None,
                    help="warm-start from an existing checkpoint")
    ap.add_argument("--save-every", type=int, default=200)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()   # honors TCD_PLATFORM=cpu; persistent cache on TPU
    import jax
    import jax.numpy as jnp

    from telescope_cam_detection_tpu.models.convert import (
        load_variables, save_variables_npz)
    from telescope_cam_detection_tpu.train.classifier import (
        build_classifier_training)
    from telescope_cam_detection_tpu.train.data import SpeciesCropDataset
    from telescope_cam_detection_tpu.utils.frames import (
        SPECIES_TABLE, species_taxonomy)

    os.makedirs(WEIGHTS_DIR, exist_ok=True)
    with open(TAXONOMY_OUT, "w") as f:
        json.dump(species_taxonomy(), f, indent=1)
    print(f"taxonomy -> {TAXONOMY_OUT}")

    num_classes = len(SPECIES_TABLE)
    meta_path = os.path.splitext(args.out)[0] + ".json"

    def write_meta(extra):
        meta = {
            "variant": args.variant, "input_size": args.size,
            "num_classes": num_classes, "steps": args.steps,
            "batch": args.batch, "lr": args.lr, "seed": args.seed,
            "trained_backend": jax.default_backend(),
            "dataset": ("SpeciesCropDataset over SPECIES_TABLE "
                        "(16 synthetic species, 4 genera, 2 families)"),
        }
        meta.update(extra)
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)
        return meta

    if args.eval_only:
        loaded = load_variables(args.out)
        if loaded is None:
            raise SystemExit(f"no checkpoint at {args.out}")
        metrics = evaluate_serving(loaded, args, seed=args.seed + 7777,
                                   n=args.val_n, taxonomy_path=TAXONOMY_OUT)
        print("held-out:", metrics)
        print(json.dumps(write_meta(metrics), indent=1))
        return

    init_vars = None
    if args.init_from:
        init_vars = load_variables(args.init_from)
        if init_vars is None:
            raise SystemExit(f"could not load {args.init_from}")

    print(f"generating {args.train_n} training crops "
          f"({num_classes} species @ {args.size}^2)...")
    train_ds = SpeciesCropDataset(n=args.train_n, image_size=args.size,
                                  seed=args.seed + 1)
    crops, labels = preload(train_ds)
    onehot = np.zeros((len(labels), num_classes), np.float32)
    onehot[np.arange(len(labels)), labels] = 1.0

    model, state, step = build_classifier_training(
        model_name=args.variant, num_classes=num_classes,
        image_size=args.size, learning_rate=args.lr,
        total_steps=args.steps, warmup_steps=max(args.steps // 20, 10),
        ema_decay=args.ema, layer_decay=args.layer_decay,
        use_mixup=not args.no_mixup, init_variables=init_vars,
        seed=args.seed)

    rng = jax.random.PRNGKey(args.seed)
    order_rng = np.random.default_rng(args.seed)
    order = order_rng.permutation(len(crops))
    pos = 0
    t0 = time.time()
    loss = acc = 0.0
    for i in range(args.steps):
        if pos + args.batch > len(order):
            order = order_rng.permutation(len(crops))
            pos = 0
        idx = order[pos:pos + args.batch]
        pos += args.batch
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, jnp.asarray(crops[idx]),
                              jnp.asarray(onehot[idx]), sub)
        if (i + 1) % 50 == 0 or i == 0:
            loss = float(jax.device_get(metrics["loss"]))
            acc = float(jax.device_get(metrics["accuracy"]))
            print(f"step {i + 1}/{args.steps}: loss {loss:.4f} "
                  f"acc {acc:.3f} ({time.time() - t0:.0f}s)", flush=True)
        if args.save_every and (i + 1) % args.save_every == 0:
            save_variables_npz(
                {"params": jax.device_get(state.serving_params())}, args.out)

    serving = {"params": jax.device_get(state.serving_params())}
    save_variables_npz(serving, args.out)
    print(f"weights -> {args.out}")

    metrics = evaluate_serving(serving, args, seed=args.seed + 7777,
                               n=args.val_n, taxonomy_path=TAXONOMY_OUT)
    print("held-out:", metrics)
    meta = write_meta({**metrics, "final_loss": round(loss, 4),
                       "final_train_acc": round(acc, 4)})
    print(json.dumps(meta, indent=1))


if __name__ == "__main__":
    main()
