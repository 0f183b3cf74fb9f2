"""Compositional vocabulary scenes for open-vocabulary training/eval.

The reference's open-vocabulary engines (GroundingDINO
``src/inference_engine.py``, YOLO-World ``src/two_stage_pipeline.py``) ride
pretrained web-scale vision-language weights. This environment has zero
egress, so open-vocabulary behavior must be *learned and proven
hermetically*: scenes contain parametric objects named by attribute
composition ("red square", "green circle"); training sees a subset of
(color, shape) combinations; evaluation prompts HELD-OUT combinations.
A detector that scores well on held-out prompts is doing real
open-vocabulary transfer — its text tower composes attribute embeddings it
never saw together — not memorizing a class list.

Deterministic in (seed, index) like every generator in this repo.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from telescope_cam_detection_tpu.utils.frames import _smooth_background

# BGR fills; names are single tokens so 2-word phrases tokenize cleanly
OV_COLORS: Dict[str, Tuple[int, int, int]] = {
    "red": (40, 40, 220),
    "green": (60, 180, 75),
    "blue": (220, 130, 40),
    "yellow": (50, 220, 230),
    "white": (235, 235, 235),
    "purple": (180, 60, 140),
}
OV_SHAPES: Tuple[str, ...] = ("square", "circle", "triangle", "cross")
# surface patterns for the 3-word grammar ("striped red square"): a third
# independent attribute axis, so held-out prompts require composing THREE
# embeddings never seen together — a strictly stronger linguistic claim
# than the 2-word color x shape grammar
OV_TEXTURES: Tuple[str, ...] = ("solid", "striped", "spotted")


def parse_phrase(phrase: str) -> Tuple[str, str, str]:
    """Phrase -> (texture, color, shape). 2-word phrases are implicitly
    solid; 3-word phrases lead with the texture."""
    words = phrase.split()
    if len(words) == 2:
        texture, (color, shape) = "solid", words
    elif len(words) == 3:
        texture, color, shape = words
    else:
        raise ValueError(f"unparseable phrase {phrase!r}")
    if texture not in OV_TEXTURES:
        raise ValueError(f"unknown texture in {phrase!r}")
    if color not in OV_COLORS:
        raise ValueError(f"unknown color in {phrase!r}")
    if shape not in OV_SHAPES:
        raise ValueError(f"unknown shape in {phrase!r}")
    return texture, color, shape


def all_phrases(grammar: str = "basic") -> List[str]:
    """`basic`: 24 color-shape pairs (texture implicitly solid).
    `extended`: 72 texture-color-shape triples, texture always explicit —
    the phrase set partitions the object space (no phrase subsumes
    another), so each object has exactly one ground-truth prompt."""
    if grammar == "basic":
        return [f"{c} {s}" for c in OV_COLORS for s in OV_SHAPES]
    if grammar == "extended":
        return [f"{t} {c} {s}" for t in OV_TEXTURES
                for c in OV_COLORS for s in OV_SHAPES]
    raise ValueError(f"unknown grammar {grammar!r}")


def _grammar_attrs(grammar: str) -> List[str]:
    attrs = list(OV_COLORS) + list(OV_SHAPES)
    if grammar == "extended":
        attrs += list(OV_TEXTURES)
    return attrs


def split_phrases(holdout_every: int = 5, seed: int = 0,
                  grammar: str = "basic") -> Tuple[List[str], List[str]]:
    """Deterministic compositional split: every color and every shape
    appears in training, but ~1/holdout_every (color, shape) PAIRS are held
    out entirely — the eval prompts the tower must compose unseen."""
    rng = np.random.default_rng(seed)
    phrases = all_phrases(grammar)
    order = rng.permutation(len(phrases))
    held = sorted(int(i) for i in order[: len(phrases) // holdout_every])
    train = [p for i, p in enumerate(phrases) if i not in held]
    heldout = [phrases[i] for i in held]
    # composition guarantee: every attribute must survive in training
    for attr in _grammar_attrs(grammar):
        assert any(attr in p.split() for p in train), attr
    return train, heldout


def split_phrases_with_negatives(
    holdout_every: int = 5, negative_every: int = 5, seed: int = 0,
    grammar: str = "basic",
) -> Tuple[List[str], List[str], List[str]]:
    """Three DISJOINT composition groups: (train, eval-held-out,
    train-negatives).

    The round-4 checkpoint fired 3.3x/image on off-vocabulary objects at
    the serving threshold: training never showed an object whose
    composition was absent from the prompt list, so the head learned
    "attributes present => fire" instead of the conjunction. The fix
    renders `negatives` as UNLABELED distractors during training — pairs
    whose color AND shape each appear in the train vocab, but never that
    combination — teaching "composition not in the prompt list => silent"
    as a rule. Crucially the negatives are disjoint from the eval held-out
    pairs, so the held-out mAP still measures honest compositional
    transfer (the model has never seen those pairs as positives OR
    negatives)."""
    rng = np.random.default_rng(seed)
    phrases = all_phrases(grammar)
    order = rng.permutation(len(phrases))
    n_held = len(phrases) // holdout_every
    n_neg = len(phrases) // negative_every
    held = sorted(int(i) for i in order[:n_held])
    neg = sorted(int(i) for i in order[n_held:n_held + n_neg])
    train = [p for i, p in enumerate(phrases)
             if i not in held and i not in neg]
    heldout = [phrases[i] for i in held]
    negatives = [phrases[i] for i in neg]
    for attr in _grammar_attrs(grammar):
        assert any(attr in p.split() for p in train), attr
    return train, heldout, negatives


def _shape_mask(shape: str, s: int) -> np.ndarray:
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    c = (s - 1) / 2.0
    if shape == "square":
        return np.ones((s, s), bool)
    if shape == "circle":
        return ((yy - c) ** 2 + (xx - c) ** 2) <= c * c
    if shape == "triangle":   # apex up, base down
        return np.abs(xx - c) <= (yy / 2.0 + 0.5)
    if shape == "cross":
        arm = max(s // 6, 1)
        return (np.abs(xx - c) <= arm) | (np.abs(yy - c) <= arm)
    raise ValueError(f"unknown shape {shape!r}")


def split_phrases_groups(
    holdout_every: int = 5, negative_every: int = 5, val_every: int = 0,
    seed: int = 0, grammar: str = "basic",
) -> Dict[str, List[str]]:
    """Four pairwise-disjoint composition groups: train / heldout /
    negatives / val.

    `val` exists for MODEL SELECTION (early stopping, best-snapshot
    keeping): selecting on the final `heldout` group would leak it into
    training decisions and void the compositional-transfer claim, so
    selection gets its own disjoint compositions and `heldout` stays
    untouched until the single final eval. `heldout` and `negatives` are
    IDENTICAL to split_phrases_with_negatives at the same seed, so
    sidecar heldout numbers stay comparable whether or not selection was
    used; `train` necessarily shrinks (val is carved out of it —
    train ∪ val equals the 3-way split's train set), so
    mAP50_train_vocab and the training distribution are NOT comparable
    across selection/no-selection runs. val_every=0 -> empty val group."""
    rng = np.random.default_rng(seed)
    phrases = all_phrases(grammar)
    order = rng.permutation(len(phrases))
    n_held = len(phrases) // holdout_every
    n_neg = len(phrases) // negative_every
    n_val = len(phrases) // val_every if val_every else 0
    held = sorted(int(i) for i in order[:n_held])
    neg = sorted(int(i) for i in order[n_held:n_held + n_neg])
    val = sorted(int(i) for i in order[n_held + n_neg:
                                       n_held + n_neg + n_val])
    excluded = set(held) | set(neg) | set(val)
    train = [p for i, p in enumerate(phrases) if i not in excluded]
    groups = {"train": train,
              "heldout": [phrases[i] for i in held],
              "negatives": [phrases[i] for i in neg],
              "val": [phrases[i] for i in val]}
    for attr in _grammar_attrs(grammar):
        assert any(attr in p.split() for p in train), attr
    return groups


def _texture_gain(texture: str, s: int) -> np.ndarray:
    """(s, s) multiplicative brightness pattern for a texture word.
    Deterministic in the object size only — patterns are a surface
    property, not a stochastic one, so the renderer consumes no extra
    rng draws and the solid path stays reproducible."""
    yy, xx = np.mgrid[0:s, 0:s]
    if texture == "striped":
        period = max(s // 5, 3)
        bands = (yy // max(period // 2, 1)) % 2
        return np.where(bands == 0, 1.0, 0.45).astype(np.float32)
    if texture == "spotted":
        period = max(s // 4, 4)
        cy = (yy % period) - period / 2.0 + 0.5
        cx = (xx % period) - period / 2.0 + 0.5
        r = period * 0.3
        dots = (cy ** 2 + cx ** 2) <= r * r
        return np.where(dots, 0.4, 1.0).astype(np.float32)
    raise ValueError(f"unknown texture {texture!r}")


def _iou(a, b) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def render_vocab_scene(
    rng: np.random.Generator,
    phrases: Sequence[str],
    width: int = 256,
    height: int = 256,
    n_objects: Tuple[int, int] = (1, 3),
    size_range: Tuple[int, int] = (28, 72),
    noise_sigma: float = 3.0,
    distractor_phrases: Optional[Sequence[str]] = None,
    n_distractors: Tuple[int, int] = (0, 0),
) -> Tuple[np.ndarray, List[Tuple[Tuple[float, float, float, float], int]]]:
    """One scene: smooth background + labeled objects drawn from `phrases`
    (+ optional UNLABELED objects drawn from `distractor_phrases` — objects
    outside the prompted vocabulary that the detector must not fire on).
    Returns (uint8 BGR image, [(xyxy box, phrase_index)])."""
    frame = _smooth_background(rng, width, height).astype(np.int16)
    if noise_sigma > 0:
        frame = frame + rng.normal(0, noise_sigma,
                                   (height, width, 3)).astype(np.int16)
    frame = np.clip(frame, 0, 255).astype(np.uint8)

    boxes: List[Tuple[float, float, float, float]] = []
    labels: List[Tuple[Tuple[float, float, float, float], int]] = []

    def place(phrase: str, label_idx: Optional[int]) -> None:
        texture_name, color_name, shape_name = parse_phrase(phrase)
        color = np.asarray(OV_COLORS[color_name], np.float32)
        s = int(rng.integers(size_range[0], size_range[1] + 1))
        mask = _shape_mask(shape_name, s)
        for _ in range(12):   # rejection-sample a low-overlap position
            x = int(rng.integers(0, max(width - s, 1)))
            y = int(rng.integers(0, max(height - s, 1)))
            box = (float(x), float(y), float(x + s), float(y + s))
            if all(_iou(box, b) < 0.15 for b in boxes):
                break
        else:
            return   # crowded scene: skip rather than stack objects
        tex = color[None, None, :] + rng.normal(0, 8, (s, s, 3))
        if texture_name != "solid":
            # deterministic patterns (no extra rng draws: the solid path
            # stays byte-identical to the pre-extended-grammar renderer,
            # so shipped-checkpoint evals reproduce)
            tex = tex * _texture_gain(texture_name, s)[..., None]
            tex = np.clip(tex, 0, 255)
        region = frame[y:y + s, x:x + s].astype(np.float32)
        frame[y:y + s, x:x + s] = np.clip(
            np.where(mask[..., None], tex, region), 0, 255).astype(np.uint8)
        boxes.append(box)
        if label_idx is not None:
            labels.append((box, label_idx))

    n = int(rng.integers(n_objects[0], n_objects[1] + 1))
    for _ in range(n):
        idx = int(rng.integers(len(phrases)))
        place(phrases[idx], idx)
    if distractor_phrases:
        nd = int(rng.integers(n_distractors[0], n_distractors[1] + 1))
        for _ in range(nd):
            place(distractor_phrases[int(rng.integers(
                len(distractor_phrases)))], None)
    return frame, labels


class VocabSceneDataset:
    """Static-shape (image, labels) pairs over a phrase vocabulary; label
    class ids are INDICES INTO `phrases` (the contrastive head's class axis
    is the prompt axis). Optional distractors render objects from outside
    the vocabulary that must stay undetected."""

    def __init__(self, phrases: Sequence[str], n: int = 256,
                 width: int = 256, height: int = 256, seed: int = 0,
                 max_gt: int = 6,
                 n_objects: Tuple[int, int] = (1, 3),
                 size_range: Tuple[int, int] = (28, 72),
                 distractor_phrases: Optional[Sequence[str]] = None,
                 n_distractors: Tuple[int, int] = (0, 0)):
        self.phrases = list(phrases)
        self.n = n
        self.width, self.height = width, height
        self.seed = seed
        self.max_gt = max_gt
        self.n_objects = n_objects
        self.size_range = size_range
        self.distractor_phrases = (list(distractor_phrases)
                                   if distractor_phrases else None)
        self.n_distractors = n_distractors

    def __len__(self) -> int:
        return self.n

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        rng = np.random.default_rng(self.seed * 100_003 + idx)
        img, labels = render_vocab_scene(
            rng, self.phrases, self.width, self.height, self.n_objects,
            self.size_range,
            distractor_phrases=self.distractor_phrases,
            n_distractors=self.n_distractors)
        out = np.full((self.max_gt, 5), -1.0, np.float32)
        for j, (box, cls) in enumerate(labels[: self.max_gt]):
            out[j] = [*box, float(cls)]
        return img.astype(np.float32), out
