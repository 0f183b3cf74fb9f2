"""Train + hermetically prove the open-vocabulary detector.

The reference's open-vocab engines (GroundingDINO, YOLO-World) arrive as
frozen pretrained torch checkpoints; with zero egress this repo instead
PROVES open-vocabulary behavior end to end on its own:

  1. train the region-text contrastive detector + text tower jointly
     (train/ov.py) on compositional vocabulary scenes whose prompts are
     attribute pairs ("red square"), with ~1/5 of all (color, shape)
     combinations HELD OUT of training entirely;
  2. evaluate mAP50 on the training vocabulary AND on the held-out
     compositions — prompts the tower has never seen together. Held-out
     transfer is the open-vocabulary claim, measured, not asserted;
  3. measure prompt selectivity through the SERVING engine
     (runtime/openvocab.OpenVocabEngine): scenes containing off-vocabulary
     objects must not fire when the prompt list excludes them;
  4. save an fp16 checkpoint {det, txt} the engine boots from.

Usage:
    python tools/train_openvocab.py [--steps 1500] [--hw 160]
    python tools/train_openvocab.py --eval-only   # re-verify a checkpoint
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "weights", "openvocab_nano.npz")


def preload(ds):
    import numpy as np
    pairs = [ds.load(i) for i in range(len(ds))]
    return (np.stack([p[0] for p in pairs]).astype(np.uint8),
            np.stack([p[1] for p in pairs]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="ov-nano")
    ap.add_argument("--hw", type=int, default=160,
                    help="square train/eval resolution")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--train-n", type=int, default=768)
    ap.add_argument("--val-n", type=int, default=64)
    ap.add_argument("--holdout-every", type=int, default=5,
                    help="hold out 1/N of (color, shape) compositions")
    ap.add_argument("--negative-every", type=int, default=5,
                    help="1/N of compositions become trained negatives "
                         "(unlabeled distractors); smaller N = stronger "
                         "'composition absent from prompts => silent' "
                         "pressure at the cost of train-vocab size")
    ap.add_argument("--max-distractors", type=int, default=2,
                    help="up to N negative-composition distractors per "
                         "training scene")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--grammar", default="basic",
                    choices=("basic", "extended"),
                    help="basic: 24 color-shape pairs; extended: 72 "
                         "texture-color-shape triples (held-out prompts "
                         "compose THREE attributes never seen together)")
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--save-every", type=int, default=200)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--init-from", default=None,
                    help="warm-start {det, txt} from an existing "
                         "checkpoint (continuation training)")
    ap.add_argument("--val-every-comp", type=int, default=0,
                    help="carve 1/N of compositions into a SELECTION "
                         "group (disjoint from train/held-out/negatives): "
                         "best-snapshot keeping tracks val-composition "
                         "mAP50 so the final held-out eval stays "
                         "leak-free; 0 disables selection")
    ap.add_argument("--select-every", type=int, default=250,
                    help="steps between selection evals")
    args = ap.parse_args()

    import numpy as np

    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()   # honors TCD_PLATFORM=cpu; persistent cache on TPU
    import jax
    import jax.numpy as jnp

    from telescope_cam_detection_tpu.models.convert import (
        load_variables, save_variables_npz)
    from telescope_cam_detection_tpu.runtime.openvocab import OpenVocabEngine
    from telescope_cam_detection_tpu.train.evaluate import evaluate_detections
    from telescope_cam_detection_tpu.train.ov import (
        build_ov_training, make_ov_infer)
    from telescope_cam_detection_tpu.train.ov_data import (
        VocabSceneDataset, split_phrases_groups,
        split_phrases_with_negatives)

    hw = (args.hw, args.hw)
    if args.val_every_comp:
        groups = split_phrases_groups(
            args.holdout_every, args.negative_every, seed=args.seed,
            grammar=args.grammar, val_every=args.val_every_comp)
        train_p, held_p, neg_p, val_p = (groups["train"], groups["heldout"],
                                         groups["negatives"], groups["val"])
    else:
        train_p, held_p, neg_p = split_phrases_with_negatives(
            args.holdout_every, args.negative_every, seed=args.seed,
            grammar=args.grammar)
        val_p = []
    print(f"backend={jax.default_backend()}  train vocab {len(train_p)}, "
          f"held-out {held_p}, negatives {neg_p}, selection-val {val_p}",
          file=sys.stderr)

    loss = float("nan")
    selected_step, best_val = None, None
    if not args.eval_only:
        det, txt, state, step_fn = build_ov_training(
            train_p, variant=args.variant, input_hw=hw,
            learning_rate=args.lr, seed=args.seed, total_steps=args.steps,
            warmup_steps=max(args.steps // 15, 10))
        step_fn = jax.jit(step_fn, donate_argnums=0)
        if args.init_from:
            from telescope_cam_detection_tpu.models.convert import (
                cast_tree_like, trees_compatible)
            loaded = load_variables(args.init_from)
            if loaded is None or set(loaded) != {"det", "txt"} \
                    or "batch_stats" not in loaded["det"]:
                raise SystemExit(
                    f"--init-from unreadable or not an ov checkpoint: "
                    f"{args.init_from}")
            ref_p = jax.device_get(state.params)
            ref_b = jax.device_get(state.batch_stats)
            new_p = {"det": loaded["det"]["params"],
                     "txt": loaded["txt"]["params"]}
            new_b = {"det": loaded["det"]["batch_stats"]}
            # structure AND leaf shapes must match (a different --variant
            # has identical module names but different widths; without
            # this check cast_tree_like would install wrong-shaped params
            # that explode opaquely inside jit)
            if not (trees_compatible(new_p, ref_p)
                    and trees_compatible(new_b, ref_b)):
                raise SystemExit(
                    f"--init-from checkpoint incompatible with variant "
                    f"{args.variant!r}: {args.init_from}")
            state = state.replace(params=cast_tree_like(new_p, ref_p),
                                  batch_stats=cast_tree_like(new_b, ref_b))
            print(f"warm start from {args.init_from}", file=sys.stderr)

        # hard-negative distractors (compositions outside the prompt list,
        # disjoint from the eval held-out set) + empty background scenes:
        # the off-vocab precision fix (round-4 sidecar fired 3.3x/image)
        ds = VocabSceneDataset(train_p, n=args.train_n, width=hw[1],
                               height=hw[0], seed=args.seed,
                               n_objects=(0, 3),
                               distractor_phrases=neg_p,
                               n_distractors=(0, args.max_distractors))
        t0 = time.perf_counter()
        imgs, lbls = preload(ds)
        print(f"dataset {imgs.shape} in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

        def snapshot():
            return {
                "det": {"params": jax.device_get(state.params["det"]),
                        "batch_stats": jax.device_get(
                            state.batch_stats["det"])},
                "txt": {"params": jax.device_get(state.params["txt"])},
            }

        sel_imgs = sel_lbls = sel_tokens = sel_infer = None
        best_snap = None
        if val_p:
            from telescope_cam_detection_tpu.models.openvocab import (
                tokenize_prompts)
            from telescope_cam_detection_tpu.runtime.program import (
                rows_to_detections)
            sel_ds = VocabSceneDataset(val_p, n=48, width=hw[1],
                                       height=hw[0], seed=args.seed + 901)
            sel_imgs, sel_lbls = preload(sel_ds)
            # CALIBRATED selection: score val-composition scenes with the
            # full train+val prompt list active. A val-only prompt list
            # (9 prompts vs the ~40 a serving vocabulary carries) has no
            # cross-prompt competition and once selected a step-800
            # underfit snapshot that scored 0.67 on 9 prompts but 0.39 on
            # the real vocabulary. Val GT indices shift by len(train_p)
            # to address the combined list.
            sel_lbls = sel_lbls.copy()
            sel_lbls[..., 4] = np.where(sel_lbls[..., 4] >= 0,
                                        sel_lbls[..., 4] + len(train_p),
                                        sel_lbls[..., 4])
            sel_tokens = jnp.asarray(tokenize_prompts(train_p + val_p))
            sel_infer = make_ov_infer(det, txt, conf_threshold=0.05)

        def val_map50() -> float:
            det_vars = {"params": state.params["det"],
                        "batch_stats": state.batch_stats["det"]}
            preds = []
            for i in range(0, len(sel_imgs), 8):
                rows = np.asarray(sel_infer(
                    det_vars, state.params["txt"], sel_tokens,
                    jnp.asarray(sel_imgs[i:i + 8], jnp.float32)))
                preds.extend(rows_to_detections(r) for r in rows)
            return evaluate_detections(preds, list(sel_lbls))["mAP50"]

        rng = np.random.default_rng(args.seed)
        t0 = time.perf_counter()
        for s in range(args.steps):
            idx = rng.choice(len(imgs), args.batch, replace=False)
            state, m = step_fn(state, jnp.asarray(imgs[idx], jnp.float32),
                               jnp.asarray(lbls[idx]))
            if s % 50 == 0 or s == args.steps - 1:
                loss = float(jax.device_get(m["loss"]))
                print(f"step {s}: loss {loss:.3f} "
                      f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr,
                      flush=True)
            if val_p and ((s and s % args.select_every == 0)
                          or s == args.steps - 1):
                v = val_map50()
                if best_val is None or v > best_val:
                    best_val, selected_step = v, s
                    best_snap = snapshot()
                print(f"step {s}: val-comp mAP50 {v:.4f} "
                      f"(best {best_val:.4f} @ {selected_step})",
                      file=sys.stderr, flush=True)
            if args.save_every and s and s % args.save_every == 0:
                save_variables_npz(snapshot(), args.out)
        # selection keeps the best val-composition snapshot; the held-out
        # eval below then scores THAT checkpoint (still leak-free: the
        # held-out group never influenced which snapshot won)
        save_variables_npz(best_snap if best_snap is not None
                           else snapshot(), args.out)
    elif load_variables(args.out) is None:
        raise SystemExit(f"--eval-only: no checkpoint at {args.out}")

    # -- evaluation through the SERVING engine ------------------------------
    def make_engine(prompts):
        eng = OpenVocabEngine(prompts, weights=args.out,
                              variant=args.variant, input_hw=hw,
                              box_threshold=0.05, text_threshold=0.0,
                              max_det=20, pre_nms_topk=200)
        if not eng.load_model():
            raise SystemExit("engine failed to load the checkpoint")
        return eng

    def eval_vocab(prompts, seed, **ds_kw):
        eng = make_engine(prompts)
        vds = VocabSceneDataset(prompts, n=args.val_n, width=hw[1],
                                height=hw[0], seed=seed, **ds_kw)
        imgs, lbls = preload(vds)
        preds = []
        for i in range(0, len(imgs), 8):
            batch = [imgs[j] for j in range(i, min(i + 8, len(imgs)))]
            for dets in eng.detect_batch(batch):
                preds.append([{**d, "class_id": d["prompt_index"]}
                              for d in dets])
        return eng, evaluate_detections(preds, list(lbls))

    _, m_train = eval_vocab(train_p, seed=31337)
    _, m_held = eval_vocab(held_p, seed=31338)

    # -- prompt selectivity: off-vocabulary objects must stay silent --------
    # scenes draw ONLY held-out-composition objects, prompts = train vocab:
    # every detection is a false fire on an unprompted object
    eng = make_engine(train_p)

    def off_vocab_fires(phrases, seed):
        off = VocabSceneDataset(phrases, n=32, width=hw[1], height=hw[0],
                                seed=seed, n_objects=(1, 3))
        imgs, _ = preload(off)
        return sum(len([d for d in dets if d["confidence"] >= 0.25])
                   for dets in eng.detect_batch(list(imgs))) / len(imgs)

    # (a) UNSEEN compositions (the honest generalization number: these
    # pairs were never positives nor negatives in training)
    selectivity_fpr = off_vocab_fires(held_p, 424242)
    # (b) the trained-negative compositions (train-distribution check)
    neg_fpr = off_vocab_fires(neg_p, 424243)

    meta = {
        "variant": args.variant, "input_hw": list(hw),
        "steps": args.steps, "batch": args.batch, "lr": args.lr,
        "seed": args.seed, "final_loss": round(loss, 4),
        "grammar": args.grammar,
        "trained_backend": jax.default_backend(),
        "train_vocab": len(train_p), "heldout_vocab": held_p,
        **({"selection_vocab": val_p,
            "mAP50_val_selection": round(best_val, 4),
            "selected_step": selected_step} if val_p and best_val is not None
           else {}),
    }
    if args.eval_only:
        # a re-verify run must not rewrite TRAINING provenance with this
        # invocation's arg defaults (final_loss would even become literal
        # NaN in the JSON) — keep the original sidecar's training fields,
        # refresh only the measured numbers below
        sidecar = os.path.splitext(args.out)[0] + ".json"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                prev = json.load(f)
            if prev.get("grammar", "basic") != args.grammar:
                raise SystemExit(
                    f"--eval-only with --grammar {args.grammar} but the "
                    f"checkpoint trained on "
                    f"{prev.get('grammar', 'basic')!r}: the eval split "
                    f"would not match the training split; pass the "
                    f"sidecar's grammar")
            for k in ("steps", "batch", "lr", "seed", "final_loss",
                      "trained_backend", "variant",
                      "selection_vocab", "mAP50_val_selection",
                      "selected_step"):
                if k in prev:
                    meta[k] = prev[k]
        else:
            meta.pop("trained_backend", None)
            meta["final_loss"] = None
    meta.update({
        "mAP50_train_vocab": round(m_train["mAP50"], 4),
        "mAP50_heldout_vocab": round(m_held["mAP50"], 4),
        "negative_vocab": neg_p,
        "offvocab_fires_per_image_conf25": round(selectivity_fpr, 3),
        "negvocab_fires_per_image_conf25": round(neg_fpr, 3),
        "dataset": ("VocabSceneDataset (compositional color x shape)"
                    if args.grammar == "basic" else
                    "VocabSceneDataset (compositional texture x color "
                    "x shape)"),
    })
    with open(os.path.splitext(args.out)[0] + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
