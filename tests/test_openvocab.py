"""Open-vocabulary detection: tokenizer, model, engine, joint training.

Covers the TPU-native counterpart of the reference's legacy open-vocab
engines (src/inference_engine.py GroundingDINO, src/two_stage_pipeline.py
YOLO-World): phrase-labelled detections with class_id=-1, caption parity,
prompt swapping without recompilation, and the hermetic compositional
open-vocabulary proof (train/ov_data.py).
"""
import queue

import numpy as np
import pytest

from telescope_cam_detection_tpu.models.openvocab import (
    MAX_PROMPT_TOKENS,
    NO_CLASS_ID,
    encode_prompts,
    init_openvocab,
    rows_to_phrase_detections,
    tokenize_prompt,
    tokenize_prompts,
)

HW = (64, 64)


# -- tokenizer ---------------------------------------------------------------

def test_tokenizer_deterministic_and_padded():
    a = tokenize_prompt("Red Square")
    b = tokenize_prompt("red square!")
    assert a.shape == (MAX_PROMPT_TOKENS,)
    assert np.array_equal(a, b)   # case/punctuation-insensitive
    assert a[2] == 1 and a[3] == 0   # EOS then padding
    assert (a[:2] >= 2).all()


def test_tokenizer_attribute_words_distinct():
    from telescope_cam_detection_tpu.train.ov_data import OV_COLORS, OV_SHAPES
    words = list(OV_COLORS) + list(OV_SHAPES)
    ids = {w: int(tokenize_prompt(w)[0]) for w in words}
    assert len(set(ids.values())) == len(words), ids


def test_tokenizer_truncates_long_prompts():
    t = tokenize_prompt("a b c d e f g h i j k")
    assert t.shape == (MAX_PROMPT_TOKENS,)
    assert t[-1] == 1   # EOS survives truncation


# -- text tower / prompt embedding -------------------------------------------

def test_encode_prompts_padding_and_norms():
    _, _, txt, txt_vars = init_openvocab("ov-nano", HW, max_prompts=4,
                                         seed=0)
    emb = np.asarray(encode_prompts(txt, txt_vars,
                                    ["red square", "green circle"],
                                    pad_to=4))
    assert emb.shape == (4, 128)
    norms = np.linalg.norm(emb, axis=-1)
    assert np.allclose(norms[:2], 1.0, atol=1e-5)
    assert np.allclose(norms[2:], 0.0)   # padding rows are zero vectors
    with pytest.raises(ValueError):
        encode_prompts(txt, txt_vars, ["a", "b", "c"], pad_to=2)


def test_prompt_swap_same_bucket_no_recompile():
    import jax
    _, _, txt, txt_vars = init_openvocab("ov-nano", HW, max_prompts=4,
                                         seed=0)
    with jax.log_compiles(False):
        e1 = encode_prompts(txt, txt_vars, ["red square"], pad_to=4)
        e2 = encode_prompts(txt, txt_vars, ["blue cross", "white circle"],
                            pad_to=4)
    assert e1.shape == e2.shape == (4, 128)
    assert not np.allclose(np.asarray(e1[0]), np.asarray(e2[0]))


# -- detector model ------------------------------------------------------------

def test_ov_model_yolox_compatible_layout():
    """The OV head's per-level (reg, obj, cls) triples must drive
    decode_outputs + batched_nms unchanged, with P prompt channels."""
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.models.yolox import decode_outputs
    from telescope_cam_detection_tpu.ops.nms import batched_nms

    det, det_vars, txt, txt_vars = init_openvocab("ov-nano", HW,
                                                  max_prompts=4, seed=0)
    emb = encode_prompts(txt, txt_vars, ["red square", "green circle"],
                         pad_to=4)
    frames = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (2, *HW, 3)), jnp.float32)
    outs = det.apply(det_vars, frames, emb, train=False)
    assert len(outs) == 3
    for lvl, stride in enumerate((8, 16, 32)):
        reg, obj, cls = outs[lvl]
        assert reg.shape == (2, HW[0] // stride, HW[1] // stride, 4)
        assert obj.shape[-1] == 1 and cls.shape[-1] == 4
    boxes, objc, clsp = decode_outputs(outs)
    rows = batched_nms(boxes, objc, clsp, conf_threshold=0.0, max_det=8,
                       pre_nms_topk=32)
    assert rows.shape == (2, 8, 7)


def test_rows_to_phrase_detections_contract():
    rows = np.array([
        [10, 10, 20, 20, 0.9, 0.8, 0],    # prompt 0
        [0, 0, 5, 5, 0.9, -1.0, 0],       # invalid marker
        [1, 1, 4, 4, 0.9, 0.9, 3],        # padding prompt index -> dropped
        [2, 2, 8, 8, 0.5, 0.4, 1],        # conf 0.2 < text_threshold
    ], np.float32)
    dets = rows_to_phrase_detections(rows, ["red square", "green circle"],
                                     text_threshold=0.25)
    assert len(dets) == 1
    d = dets[0]
    assert d["class_id"] == NO_CLASS_ID        # reference NO_CLASS_ID parity
    assert d["class_name"] == "red square"
    assert d["prompt_index"] == 0
    assert abs(d["confidence"] - 0.72) < 1e-6
    assert d["bbox"]["width"] == 10 and d["bbox"]["area"] == 100


# -- vocab scenes ---------------------------------------------------------------

def test_vocab_scene_dataset_deterministic_and_labelled():
    from telescope_cam_detection_tpu.train.ov_data import (
        VocabSceneDataset, all_phrases, split_phrases)
    phrases = all_phrases()
    assert len(phrases) == 24
    train_p, held_p = split_phrases(holdout_every=5, seed=0)
    assert len(held_p) == 4 and not set(held_p) & set(train_p)
    ds = VocabSceneDataset(phrases, n=6, width=96, height=96, seed=3)
    img, lbl = ds.load(2)
    assert img.shape == (96, 96, 3) and lbl.shape == (6, 5)
    img2, lbl2 = ds.load(2)
    assert np.array_equal(img, img2) and np.array_equal(lbl, lbl2)
    valid = lbl[lbl[:, 4] >= 0]
    assert len(valid) >= 1
    for x1, y1, x2, y2, cls in valid:
        assert 0 <= x1 < x2 <= 96 and 0 <= y1 < y2 <= 96
        assert 0 <= int(cls) < len(phrases)


def test_split_phrases_with_negatives_three_disjoint_groups():
    """The off-vocab precision fix needs train / eval-held-out /
    train-negative compositions pairwise disjoint (negatives as training
    distractors must NOT leak the eval pairs), with every attribute still
    present in the train vocab."""
    from telescope_cam_detection_tpu.train.ov_data import (
        OV_COLORS, OV_SHAPES, all_phrases, split_phrases,
        split_phrases_with_negatives)
    train, held, neg = split_phrases_with_negatives(5, 5, seed=0)
    assert len(held) == 4 and len(neg) == 4
    assert not set(held) & set(neg)
    assert not set(train) & (set(held) | set(neg))
    assert len(train) + len(held) + len(neg) == len(all_phrases())
    for attr in list(OV_COLORS) + list(OV_SHAPES):
        assert any(attr in p for p in train), attr
    # the held-out group matches the 2-way split at the same seed: sidecar
    # mAP50_heldout numbers stay comparable across rounds
    _, held2 = split_phrases(5, seed=0)
    assert held == held2


def test_vocab_scene_distractors_render_unlabelled():
    from telescope_cam_detection_tpu.train.ov_data import VocabSceneDataset
    base = VocabSceneDataset(["red square"], n=4, width=96, height=96,
                             seed=9, n_objects=(1, 1))
    with_d = VocabSceneDataset(["red square"], n=4, width=96, height=96,
                               seed=9, n_objects=(1, 1),
                               distractor_phrases=["blue circle"],
                               n_distractors=(2, 2))
    img_b, lbl_b = base.load(1)
    img_d, lbl_d = with_d.load(1)
    assert np.array_equal(lbl_b[lbl_b[:, 4] >= 0][:, 4],
                          lbl_d[lbl_d[:, 4] >= 0][:, 4])
    assert not np.array_equal(img_b, img_d)   # distractors did render


# -- serving engine ---------------------------------------------------------------

def _engine(**kw):
    from telescope_cam_detection_tpu.runtime.openvocab import OpenVocabEngine
    eng = OpenVocabEngine(["red square", "green circle"], variant="ov-nano",
                          input_hw=HW, box_threshold=0.01,
                          text_threshold=0.0, max_det=8, pre_nms_topk=32,
                          **kw)
    assert eng.load_model()
    return eng


def test_engine_detect_contract():
    eng = _engine()
    assert eng.caption == "red square . green circle ."   # reference :82-86
    frame = np.random.default_rng(0).integers(
        0, 255, (120, 160, 3), np.uint8)
    dets = eng.detect(frame)
    for d in dets:
        assert d["class_id"] == NO_CLASS_ID
        assert d["class_name"] in eng.text_prompts
        b = d["bbox"]
        assert 0 <= b["x1"] <= b["x2"] <= 160
        assert 0 <= b["y1"] <= b["y2"] <= 120
    stats = eng.get_stats()
    assert stats["is_loaded"] and stats["caption"] == eng.caption


def test_engine_prompt_swap_and_batch_padding():
    eng = _engine()
    n_compiled = len(eng._compiled)
    eng.update_prompts(["blue cross"])
    frames = [np.zeros((64, 64, 3), np.uint8) for _ in range(3)]
    out = eng.detect_batch(frames)   # pads 3 -> 4
    assert len(out) == 3
    for dets in out:
        for d in dets:
            assert d["class_name"] == "blue cross"
    # same frame resolution + prompt bucket: the single-frame program from
    # warmup is reused; the batch-4 program is the only new compile
    assert len(eng._compiled) == n_compiled + 1


def test_engine_queue_loop():
    from telescope_cam_detection_tpu.utils.frames import make_frame_dict
    in_q: "queue.Queue" = queue.Queue(maxsize=4)
    out_q: "queue.Queue" = queue.Queue(maxsize=4)
    eng = _engine(input_queue=in_q, output_queue=out_q)
    assert eng.start()
    try:
        frame = np.random.default_rng(1).integers(
            0, 255, (*HW, 3), np.uint8)
        in_q.put(make_frame_dict(frame, 7, "cam1"))
        result = out_q.get(timeout=30)
    finally:
        eng.stop()
    assert result["frame_id"] == 7 and result["camera_id"] == "cam1"
    assert "inference_time" in result and "detections" in result
    assert result["frame_shape"] == frame.shape
    assert not eng.inference_thread.is_alive()


def test_engine_checkpoint_roundtrip(tmp_path):
    from telescope_cam_detection_tpu.models.convert import (
        save_variables_npz)
    from telescope_cam_detection_tpu.runtime.openvocab import OpenVocabEngine
    det, det_vars, txt, txt_vars = init_openvocab("ov-nano", HW,
                                                  max_prompts=4, seed=7)
    path = str(tmp_path / "ov.npz")
    save_variables_npz({"det": det_vars, "txt": txt_vars}, path)
    eng = OpenVocabEngine(["red square"], weights=path, variant="ov-nano",
                          input_hw=HW, box_threshold=0.01,
                          text_threshold=0.0, max_det=8, pre_nms_topk=32)
    assert eng.load_model()
    frame = np.random.default_rng(2).integers(0, 255, (*HW, 3), np.uint8)
    ref_rows = eng._infer_rows(frame[None])
    # fresh engine from the same file must reproduce identical rows (fp16
    # checkpoint determinism)
    eng2 = OpenVocabEngine(["red square"], weights=path, variant="ov-nano",
                           input_hw=HW, box_threshold=0.01,
                           text_threshold=0.0, max_det=8, pre_nms_topk=32)
    assert eng2.load_model()
    np.testing.assert_array_equal(ref_rows, eng2._infer_rows(frame[None]))


def test_engine_rejects_missing_checkpoint_towers(tmp_path):
    from telescope_cam_detection_tpu.models.convert import (
        save_variables_npz)
    from telescope_cam_detection_tpu.runtime.openvocab import OpenVocabEngine
    _, det_vars, _, _ = init_openvocab("ov-nano", HW, max_prompts=4)
    path = str(tmp_path / "det_only.npz")
    save_variables_npz({"det": det_vars}, path)
    eng = OpenVocabEngine(["red square"], weights=path, variant="ov-nano",
                          input_hw=HW)
    assert not eng.load_model()   # loud failure, no silent random fallback


# -- joint training (slow) --------------------------------------------------------

@pytest.mark.slow
def test_ov_joint_training_learns():
    """150 joint steps on 2 prompts at 64^2 must cut the SimOTA loss by
    >40% and backprop through the text tower (its params move)."""
    import jax
    import jax.numpy as jnp
    from telescope_cam_detection_tpu.train.ov import build_ov_training
    from telescope_cam_detection_tpu.train.ov_data import VocabSceneDataset

    prompts = ["red square", "green circle"]
    det, txt, state, step = build_ov_training(
        prompts, variant="ov-nano", input_hw=HW, total_steps=150,
        warmup_steps=10, learning_rate=2e-3)
    step = jax.jit(step, donate_argnums=0)
    ds = VocabSceneDataset(prompts, n=64, width=HW[1], height=HW[0],
                           seed=0, size_range=(16, 40))
    imgs = np.stack([ds.load(i)[0] for i in range(64)])
    lbls = np.stack([ds.load(i)[1] for i in range(64)])
    txt_before = jax.device_get(state.params["txt"])
    rng = np.random.default_rng(0)
    losses = []
    for s in range(150):
        idx = rng.choice(64, 8, replace=False)
        state, m = step(state, jnp.asarray(imgs[idx]),
                        jnp.asarray(lbls[idx]))
        losses.append(float(m["loss"]))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < first * 0.6, (first, last)
    txt_after = jax.device_get(state.params["txt"])
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), txt_before, txt_after))
    assert max(moved) > 1e-4   # gradients reached the text tower


def test_engine_two_stage_handoff(tmp_path):
    """use_two_stage routes phrase detections through the Stage-2 pipeline
    (reference two_stage_pipeline.py YOLO-World+iNat wiring): with
    classify_classes={-1: ...} (open vocabulary has no dataset ids) the
    classifier annotates eligible detections with species fields."""
    import json
    import queue as queue_mod
    from telescope_cam_detection_tpu.pipeline.species import SpeciesClassifier
    from telescope_cam_detection_tpu.pipeline.two_stage import (
        TwoStageDetectionPipeline)
    from telescope_cam_detection_tpu.utils.frames import make_frame_dict

    tax = {str(i): {"common_name": f"Species {i}", "name": f"species_{i}",
                    "genus": f"G{i}", "family": f"F{i}", "order": f"O{i}",
                    "class": "Mammalia"} for i in range(16)}
    p = tmp_path / "taxonomy.json"
    p.write_text(json.dumps(tax))
    clf = SpeciesClassifier(model_name="eva02-tiny", num_classes=16,
                            input_size=56, taxonomy_file=str(p), seed=0)
    pipeline = TwoStageDetectionPipeline(
        species_classifier=clf, min_crop_size=2, confidence_threshold=0.0,
        classify_classes={-1: "animal"})
    in_q: "queue_mod.Queue" = queue_mod.Queue()
    out_q: "queue_mod.Queue" = queue_mod.Queue()
    eng = _engine(use_two_stage=True, two_stage_pipeline=pipeline,
                  input_queue=in_q, output_queue=out_q)
    assert eng.start()
    try:
        frame = np.random.default_rng(5).integers(
            0, 255, (*HW, 3), np.uint8)
        in_q.put(make_frame_dict(frame, 1))
        result = out_q.get(timeout=60)
    finally:
        eng.stop()
    assert result["detections"], "random-init @ threshold 0.01 must fire"
    classified = [d for d in result["detections"] if "species" in d
                  or "species_name" in d or "stage2" in d
                  or any(k.startswith("species") for k in d)]
    assert classified, (
        f"no detection carried Stage-2 fields: {result['detections'][:2]}")


def test_engine_variant_from_sidecar(tmp_path):
    """variant=None resolves from the checkpoint's sidecar metadata, so the
    shipped weights (ov-nano) load without the caller knowing the variant."""
    import json
    from telescope_cam_detection_tpu.models.convert import save_variables_npz
    from telescope_cam_detection_tpu.runtime.openvocab import OpenVocabEngine
    _, det_vars, _, txt_vars = init_openvocab("ov-nano", HW, max_prompts=4,
                                              seed=3)
    path = str(tmp_path / "ov.npz")
    save_variables_npz({"det": det_vars, "txt": txt_vars}, path)
    (tmp_path / "ov.json").write_text(json.dumps({"variant": "ov-nano"}))
    eng = OpenVocabEngine(["red square"], weights=path, input_hw=HW,
                          box_threshold=0.01, max_det=8, pre_nms_topk=32)
    assert eng.variant == "ov-nano"
    assert eng.load_model()
    # no sidecar -> flagship default
    eng2 = OpenVocabEngine(["red square"], input_hw=HW)
    assert eng2.variant == "ov-s"


# -- extended (texture) grammar -------------------------------------------------

def test_extended_grammar_phrases_and_split():
    """72 texture-color-shape triples; three disjoint groups; every
    attribute word (including every texture) survives in training."""
    from telescope_cam_detection_tpu.train.ov_data import (
        OV_COLORS, OV_SHAPES, OV_TEXTURES, all_phrases, parse_phrase,
        split_phrases_with_negatives)
    phrases = all_phrases("extended")
    assert len(phrases) == len(OV_TEXTURES) * len(OV_COLORS) * len(OV_SHAPES)
    assert len(set(phrases)) == len(phrases)
    for p in phrases:
        t, c, s = parse_phrase(p)
        assert t in OV_TEXTURES and c in OV_COLORS and s in OV_SHAPES
    train, held, neg = split_phrases_with_negatives(5, 5, seed=0,
                                                    grammar="extended")
    assert len(held) == 14 and len(neg) == 14
    assert not set(held) & set(neg)
    assert not set(train) & (set(held) | set(neg))
    for attr in list(OV_COLORS) + list(OV_SHAPES) + list(OV_TEXTURES):
        assert any(attr in p.split() for p in train), attr


def test_parse_phrase_two_word_is_solid_and_rejects_garbage():
    import pytest
    from telescope_cam_detection_tpu.train.ov_data import parse_phrase
    assert parse_phrase("red square") == ("solid", "red", "square")
    assert parse_phrase("striped blue cross") == ("striped", "blue", "cross")
    for bad in ("red", "shiny red square", "striped red square extra",
                "striped mauve square", "striped red blob"):
        with pytest.raises(ValueError):
            parse_phrase(bad)


def test_textures_render_distinguishably():
    """The three textures of one color x shape must produce visibly
    different pixels (otherwise the texture axis is unlearnable), and the
    solid path must be byte-identical to the 2-word phrase (the extended
    renderer consumes no extra rng draws)."""
    from telescope_cam_detection_tpu.train.ov_data import VocabSceneDataset

    def render(phrase):
        ds = VocabSceneDataset([phrase], n=1, width=96, height=96, seed=11,
                               n_objects=(1, 1), size_range=(48, 48))
        return ds.load(0)

    img_solid2, lbl2 = render("red square")
    img_solid3, lbl3 = render("solid red square")
    assert np.array_equal(img_solid2, img_solid3)
    assert np.array_equal(lbl2, lbl3)
    img_striped, _ = render("striped red square")
    img_spotted, _ = render("spotted red square")
    assert not np.array_equal(img_solid3, img_striped)
    assert not np.array_equal(img_solid3, img_spotted)
    assert not np.array_equal(img_striped, img_spotted)
    # textures only darken INSIDE the object: the (48,48) object is the
    # only difference between the renders
    diff = np.any(img_solid3 != img_striped, axis=-1)
    ys, xs = np.nonzero(diff)
    x1, y1, x2, y2, _ = lbl3[0]
    assert ys.min() >= y1 and ys.max() < y2
    assert xs.min() >= x1 and xs.max() < x2


def test_split_phrases_groups_four_disjoint_and_prefix_stable():
    """The selection-val group must be disjoint from train/held-out/
    negatives, and the first three groups must equal the 3-way split at
    the same seed (sidecar held-out numbers stay comparable whether or
    not selection was used)."""
    from telescope_cam_detection_tpu.train.ov_data import (
        split_phrases_groups, split_phrases_with_negatives)
    g = split_phrases_groups(5, 5, val_every=8, seed=0, grammar="extended")
    assert len(g["val"]) == 72 // 8
    sets = [set(g[k]) for k in ("train", "heldout", "negatives", "val")]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            assert not sets[i] & sets[j]
    t3, h3, n3 = split_phrases_with_negatives(5, 5, seed=0,
                                              grammar="extended")
    assert g["heldout"] == h3 and g["negatives"] == n3
    assert set(g["train"]) | set(g["val"]) == set(t3)
    # val_every=0 -> identical to the 3-way split
    g0 = split_phrases_groups(5, 5, val_every=0, seed=0, grammar="extended")
    assert g0["val"] == [] and g0["train"] == t3
