"""Open-vocabulary text-prompted detection, TPU-native.

Counterpart of the reference's LEGACY open-vocabulary Stage-1 engines:
GroundingDINO (``/root/reference/src/inference_engine.py:24-96`` — text
prompts joined into a caption, phrase-labelled detections, ``class_id=-1``)
and YOLO-World (``/root/reference/src/two_stage_pipeline.py:13,28`` —
``set_classes(prompts)`` then closed-set-speed detection). Both were
superseded by YOLOX in the reference ("47x faster",
``src/inference_engine_yolox.py:4``) and survive only as unwired legacy
files; this module re-designs the capability TPU-first instead of porting
either torch stack:

* **Region-text contrastive head** (the YOLO-World scheme): the vision
  branch emits an L2-normalized per-location region embedding; a text
  tower embeds each prompt; class logits are scaled cosine similarities.
  The prompt set is embedded ONCE and passed to the detector as a plain
  ``(P, D)`` array argument — swapping vocabularies at runtime never
  recompiles the jitted program (the XLA-native analog of YOLO-World's
  offline "reparameterize the vocabulary into the head" trick).
* **Max-sigmoid text attention** on each FPN level (the essence of
  YOLO-World's RepVL-PAN T-CSP blocks): features are gated by their best
  prompt affinity before the head sees them.
* **Output-layout compatibility with our YOLOX head**: ``__call__``
  returns the same per-level ``(reg, obj, cls_logit)`` triples, so
  ``models.yolox.decode_outputs``, ``ops.nms.batched_nms`` and the whole
  SimOTA training stack (``train/loss.py``) drive this model unchanged —
  ``num_classes`` is simply the prompt count.
* **Zero-egress text tower**: a compact pre-LN transformer over hashed
  word tokens (FNV-1a -> 4096 buckets). There is no pretrained CLIP here
  by design (this environment has no egress); open-vocabulary behavior is
  *learned and proven hermetically* — train on scenes whose prompts are
  attribute compositions ("red square", "green circle"), hold out whole
  compositions, and the tower's compositional embeddings must carry
  detection to prompts never seen in training (tools/train_openvocab.py
  measures exactly that).

The MXU does all the heavy lifting: backbone/neck convs and the
``(B*H*W, D) x (D, P)`` similarity matmuls are large, batched and fusable;
the per-prompt gating is elementwise tail work XLA fuses into them.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from telescope_cam_detection_tpu.models.common import ConvBnAct, DWConvBlock
from telescope_cam_detection_tpu.models.yolox import (
    _w,
    CSPDarknet,
    PAFPN,
    YOLOX_VARIANTS,
)

# prompt index for "no class": open-vocabulary detections carry the matched
# phrase, not a dataset class id (reference src/inference_engine.py:21)
NO_CLASS_ID = -1

OV_VOCAB_SIZE = 4096
MAX_PROMPT_TOKENS = 8
_PAD_ID = 0
_EOS_ID = 1


def _fnv1a(word: str) -> int:
    h = 0xCBF29CE484222325
    for b in word.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def tokenize_prompt(prompt: str, max_len: int = MAX_PROMPT_TOKENS) -> np.ndarray:
    """Prompt string -> (max_len,) int32 hashed word-token ids.

    Lowercased alphanumeric words hash into OV_VOCAB_SIZE-2 buckets via
    FNV-1a (deterministic across runs/platforms — the stability a python
    ``hash()`` would not give), EOS-terminated, zero-padded. A first-party
    tokenizer instead of a BPE vocabulary keeps the tower weight-free of
    external assets; hash collisions act as mild embedding tying."""
    import re
    words = re.findall(r"[a-z0-9]+", prompt.lower())
    ids = [(_fnv1a(w) % (OV_VOCAB_SIZE - 2)) + 2 for w in words]
    ids = ids[: max_len - 1] + [_EOS_ID]
    ids += [_PAD_ID] * (max_len - len(ids))
    return np.asarray(ids, np.int32)


def tokenize_prompts(prompts: Sequence[str],
                     max_len: int = MAX_PROMPT_TOKENS) -> np.ndarray:
    return np.stack([tokenize_prompt(p, max_len) for p in prompts])


class TextEncoder(nn.Module):
    """Compact CLIP-style text tower: token+position embeddings, pre-LN
    transformer blocks, masked mean-pool, projection, L2-normalize."""
    vocab_size: int = OV_VOCAB_SIZE
    dim: int = 128
    depth: int = 3
    heads: int = 4
    max_len: int = MAX_PROMPT_TOKENS
    out_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens (P, L) int32 -> (P, out_dim) L2-normalized embeddings."""
        x = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                     name="tok_embed")(tokens)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.dim))
        x = x + pos[None, : tokens.shape[1]].astype(self.dtype)
        pad_mask = tokens != _PAD_ID                      # (P, L)
        attn_mask = (pad_mask[:, None, None, :]
                     & pad_mask[:, None, :, None])        # (P, 1, L, L)
        for i in range(self.depth):
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype,
                name=f"attn_{i}")(h, mask=attn_mask)
            x = x + h
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            h = nn.Dense(self.dim * 4, dtype=self.dtype,
                         name=f"mlp_in_{i}")(h)
            h = nn.gelu(h)
            h = nn.Dense(self.dim, dtype=self.dtype, name=f"mlp_out_{i}")(h)
            x = x + h
        x = nn.LayerNorm(dtype=self.dtype, name="ln_f")(x)
        denom = jnp.maximum(pad_mask.sum(-1, keepdims=True), 1)
        pooled = (x * pad_mask[..., None]).sum(1) / denom
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(pooled)
        emb = emb.astype(jnp.float32)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)


class OVHead(nn.Module):
    """Text-conditioned decoupled head: YOLOX branches, but the class
    prediction is a region-embedding/text-embedding cosine similarity
    instead of a fixed-C conv."""
    embed_dim: int = 128
    width: float = 1.0
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, text_emb: jnp.ndarray, train: bool = False):
        dt, act = self.dtype, self.act
        hidden = _w(self.width, 256)
        block = DWConvBlock if self.depthwise else ConvBnAct
        # CLIP-style temperature + a negative bias prior so untrained /
        # padded prompts sit well below any box threshold
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(np.log(1 / 0.07)),
                                 ())
        logit_bias = self.param("logit_bias",
                                nn.initializers.constant(-4.0), ())
        scale = jnp.exp(logit_scale).astype(jnp.float32)
        outputs = []
        for lvl, f in enumerate(feats):
            x = ConvBnAct(hidden, 1, 1, act=act, dtype=dt,
                          name=f"stem{lvl}")(f, train)
            c = block(hidden, 3, 1, act=act, dtype=dt,
                      name=f"cls_conv{lvl}_0")(x, train)
            c = block(hidden, 3, 1, act=act, dtype=dt,
                      name=f"cls_conv{lvl}_1")(c, train)
            region = nn.Conv(self.embed_dim, (1, 1), dtype=dt,
                             name=f"region_embed{lvl}")(c)
            region = region.astype(jnp.float32)
            region = region / jnp.maximum(
                jnp.linalg.norm(region, axis=-1, keepdims=True), 1e-6)
            cls_logit = (jnp.einsum("bhwd,pd->bhwp", region, text_emb)
                         * scale + logit_bias)
            r = block(hidden, 3, 1, act=act, dtype=dt,
                      name=f"reg_conv{lvl}_0")(x, train)
            r = block(hidden, 3, 1, act=act, dtype=dt,
                      name=f"reg_conv{lvl}_1")(r, train)
            reg_out = nn.Conv(4, (1, 1), dtype=dt, name=f"reg_pred{lvl}")(r)
            obj_out = nn.Conv(1, (1, 1), dtype=dt, name=f"obj_pred{lvl}")(r)
            outputs.append((reg_out, obj_out, cls_logit))
        return outputs


class OpenVocabYOLOX(nn.Module):
    """YOLO-World-style open-vocabulary detector on our YOLOX trunk.

    ``__call__(images, text_emb)`` — text_emb is a runtime argument, not a
    parameter: one compiled program serves every vocabulary whose prompt
    count pads to the same bucket."""
    depth: float = 0.33
    width: float = 0.50
    depthwise: bool = False
    act: str = "silu"
    embed_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, text_emb: jnp.ndarray,
                 train: bool = False):
        """images (N, H, W, 3) float BGR 0..255 (YOLOX convention);
        text_emb (P, D) L2-normalized. Returns per-level
        (reg, obj, cls_logit) with cls_logit carrying P channels —
        decode_outputs/batched_nms/yolox_loss consume it unchanged."""
        feats = CSPDarknet(self.depth, self.width, self.depthwise, self.act,
                           self.dtype, name="backbone")(images, train)
        feats = PAFPN(self.depth, self.width, self.depthwise, self.act,
                      self.dtype, name="neck")(feats, train)
        # max-sigmoid text attention (RepVL-PAN essence): gate each level
        # by its best prompt affinity so text steers the features the head
        # regresses from, not just the final classification
        gated = []
        for lvl, f in enumerate(feats):
            proj = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                           name=f"text_gate_proj{lvl}")(f)
            proj = proj.astype(jnp.float32)
            proj = proj / jnp.maximum(
                jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-6)
            aff = jnp.einsum("bhwd,pd->bhwp", proj, text_emb)
            gate_scale = self.param(f"text_gate_scale{lvl}",
                                    nn.initializers.constant(1.0), ())
            gate_bias = self.param(f"text_gate_bias{lvl}",
                                   nn.initializers.constant(2.0), ())
            gate = jax.nn.sigmoid(aff.max(-1) * gate_scale + gate_bias)
            gated.append(f * gate[..., None].astype(f.dtype))
        return OVHead(self.embed_dim, self.width, self.depthwise, self.act,
                      self.dtype, name="head")(gated, text_emb, train)


# variant name -> same (depth, width, depthwise) table as YOLOX
OV_VARIANTS = {f"ov-{k.split('-', 1)[1]}": v for k, v in YOLOX_VARIANTS.items()}


def build_openvocab(name: str = "ov-s", embed_dim: int = 128,
                    dtype=jnp.float32) -> OpenVocabYOLOX:
    if name not in OV_VARIANTS:
        raise ValueError(f"unknown open-vocab variant {name!r}; "
                         f"valid: {sorted(OV_VARIANTS)}")
    depth, width, depthwise = OV_VARIANTS[name]
    return OpenVocabYOLOX(depth=depth, width=width, depthwise=depthwise,
                          embed_dim=embed_dim, dtype=dtype)


def build_text_encoder(embed_dim: int = 128, dim: int = 128, depth: int = 3,
                       dtype=jnp.float32) -> TextEncoder:
    return TextEncoder(dim=dim, depth=depth, out_dim=embed_dim, dtype=dtype)


def init_openvocab(
    name: str = "ov-s",
    input_hw: Tuple[int, int] = (640, 640),
    max_prompts: int = 8,
    embed_dim: int = 128,
    seed: int = 0,
    dtype=jnp.float32,
):
    """Build detector + text tower with matching embed_dim and init both."""
    det = build_openvocab(name, embed_dim, dtype)
    txt = build_text_encoder(embed_dim, dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    txt_vars = txt.init(k1, jnp.zeros((max_prompts, MAX_PROMPT_TOKENS),
                                      jnp.int32))
    dummy_emb = jnp.zeros((max_prompts, embed_dim), jnp.float32)
    det_vars = det.init(k2, jnp.zeros((1, *input_hw, 3), dtype), dummy_emb,
                        train=False)
    return det, det_vars, txt, txt_vars


def encode_prompts(txt, txt_vars, prompts: Sequence[str],
                   pad_to: int = 0) -> jnp.ndarray:
    """Embed a prompt list -> (P', D) with P' = pad_to (or next pow2 >=
    len(prompts)). Padding rows are zero vectors: cosine 0 against every
    region, which the head's -4 logit bias pins far below any threshold —
    so one compiled detector program serves any vocabulary up to the
    bucket size."""
    if not prompts:
        raise ValueError("need at least one prompt")
    n = len(prompts)
    if pad_to == 0:
        pad_to = max(1 << (n - 1).bit_length(), 4)
    if n > pad_to:
        raise ValueError(f"{n} prompts > pad_to={pad_to}")
    tokens = tokenize_prompts(prompts)
    emb = txt.apply(txt_vars, jnp.asarray(tokens))
    if pad_to > n:
        emb = jnp.concatenate(
            [emb, jnp.zeros((pad_to - n, emb.shape[1]), emb.dtype)])
    return emb


def rows_to_phrase_detections(rows: np.ndarray, prompts: Sequence[str],
                              text_threshold: float = 0.0) -> List[dict]:
    """(max_det, 7) packed NMS rows -> reference-contract detection dicts
    with ``class_name`` = matched phrase and ``class_id`` = NO_CLASS_ID
    (open vocabulary has no dataset class ids —
    reference src/inference_engine.py:21,204-213). Rows whose class index
    falls in the padding region (>= len(prompts)) or whose confidence is
    below text_threshold drop."""
    out = []
    for row in np.asarray(rows):
        x1, y1, x2, y2, obj_c, cls_c, cid = (float(v) for v in row[:7])
        if cls_c < 0:   # invalid-row marker (runtime/program.py rows)
            continue
        idx = int(cid)
        conf = obj_c * cls_c
        if idx < 0 or idx >= len(prompts) or conf < text_threshold:
            continue
        w, h = x2 - x1, y2 - y1
        out.append({
            "class_id": NO_CLASS_ID,
            "class_name": prompts[idx],
            "prompt_index": idx,
            "confidence": conf,
            "objectness": obj_c,
            "class_confidence": cls_c,
            "bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2,
                     "width": w, "height": h, "area": w * h},
        })
    return out
