"""Contrastive denoising (CDN) query construction for RT-DETR training.

Upstream RT-DETR(v2) trains with DINO-style contrastive denoising: noised
copies of the ground-truth boxes enter the decoder as extra queries whose
targets are KNOWN (no Hungarian matching), which stabilizes and speeds up
set-prediction convergence. Each GT contributes, per denoising group, one
POSITIVE query (small noise -> must reconstruct the GT) and one NEGATIVE
query (large noise -> must predict background).

Everything here is static-shape and jit-friendly: with G = MAX_GT padded
GT rows and `num_groups` groups, exactly D = 2 * num_groups * G denoising
queries are built per image; queries born from padding rows are marked
invalid — masked out of everyone's self-attention and excluded from the
loss. The self-attention mask enforces the DINO leak rules: matching
queries never see denoising queries, and each denoising group sees only
itself (plus the matching queries).

Layout: denoising queries come FIRST in the decoder sequence
([dn | match], upstream ordering), and the model splits the outputs back
apart (models/rtdetr.py RTDETR.__call__ dn= argument).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def cdn_attention_mask(num_groups: int, max_gt: int, num_queries: int,
                       dn_valid: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, D+Q, D+Q) boolean mask, True = may attend.

    Static structure: match->match all-True, match->dn all-False (leak
    rule), dn->match all-True, dn->dn only within the same group. Dynamic
    part: columns of invalid (padding-born) dn queries are masked for
    every row except the query's own diagonal (so no row ever attends to
    nothing).
    """
    d = 2 * num_groups * max_gt
    t = d + num_queries
    idx = jnp.arange(d)
    group = idx // (2 * max_gt)
    dn_dn = group[:, None] == group[None, :]                    # (D, D)
    base = jnp.ones((t, t), bool)
    base = base.at[:d, :d].set(dn_dn)
    base = base.at[d:, :d].set(False)                           # match -/-> dn

    # dynamic: nobody attends TO an invalid dn query
    col_ok = jnp.concatenate(
        [dn_valid, jnp.ones((dn_valid.shape[0], num_queries), bool)], axis=1)
    mask = base[None] & col_ok[:, None, :]
    mask = mask | jnp.eye(t, dtype=bool)[None]                  # keep diagonal
    return mask[:, None, :, :]


def build_cdn_queries(
    rng: jax.Array,
    targets: jnp.ndarray,              # (B, G, 5) xyxy pixels + class
    input_hw: Tuple[int, int],
    num_classes: int,
    num_groups: int = 2,
    box_noise_scale: float = 1.0,
    label_noise_ratio: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Noised GT queries (upstream rtdetr get_contrastive_denoising_training_group).

    Returns dict:
      labels   (B, D) int32 — class ids fed to the dn embedding
                (num_classes = background/padding id)
      boxes    (B, D, 4)    — noised cxcywh, normalized
      positive (B, D) bool  — positive (reconstruct) vs negative (background)
      gt_idx   (B, D) int32 — source GT row in `targets`
      valid    (B, D) bool  — born from a real (non-padding) GT
    """
    b, g, _ = targets.shape
    h, w = float(input_hw[0]), float(input_hw[1])
    x1, y1 = targets[..., 0] / w, targets[..., 1] / h
    x2, y2 = targets[..., 2] / w, targets[..., 3] / h
    gt_boxes = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2,
                          jnp.clip(x2 - x1, 0), jnp.clip(y2 - y1, 0)], -1)
    gt_cls = targets[..., 4]
    gt_valid = gt_cls >= 0
    gt_cls = jnp.clip(gt_cls, 0).astype(jnp.int32)

    reps = 2 * num_groups
    d = reps * g
    # tile: [group0 pos | group0 neg | group1 pos | ...]
    boxes = jnp.tile(gt_boxes, (1, reps, 1))                    # (B, D, 4)
    labels = jnp.tile(gt_cls, (1, reps))
    valid = jnp.tile(gt_valid, (1, reps))
    gt_idx = jnp.tile(jnp.arange(g, dtype=jnp.int32), (b, reps))
    slot = jnp.arange(d) // g
    positive = jnp.broadcast_to((slot % 2) == 0, (b, d))

    k_noise, k_flip, k_cls, k_sign = jax.random.split(rng, 4)

    # --- box noise (upstream magnitudes): positives shift each corner by
    # U[0,1) x half-extent x scale, negatives by U[1,2) — the contrastive
    # split that makes negatives unambiguous background
    half = boxes[..., 2:] / 2.0
    diff = jnp.concatenate([half, half], -1)                    # (B, D, 4)
    u = jax.random.uniform(k_noise, boxes.shape)                # [0, 1)
    mag = jnp.where(positive[..., None], u, 1.0 + u)
    sign = jnp.where(
        jax.random.bernoulli(k_sign, 0.5, boxes.shape), 1.0, -1.0)
    xyxy = jnp.concatenate([boxes[..., :2] - half, boxes[..., :2] + half], -1)
    noised = xyxy + sign * mag * diff * box_noise_scale
    noised = jnp.clip(noised, 0.0, 1.0)
    boxes = jnp.concatenate([(noised[..., :2] + noised[..., 2:]) / 2,
                             jnp.clip(noised[..., 2:] - noised[..., :2], 1e-4)],
                            -1)

    # --- label noise: flip labels of any valid dn query (positives AND
    # negatives) to a random class at ratio * 0.5, upstream semantics
    flip = jax.random.bernoulli(k_flip, label_noise_ratio * 0.5,
                                labels.shape)
    rand_cls = jax.random.randint(k_cls, labels.shape, 0, num_classes)
    labels = jnp.where(flip & valid, rand_cls, labels)
    # padding-born queries embed as background
    labels = jnp.where(valid, labels, num_classes)

    return {"labels": labels, "boxes": boxes, "positive": positive,
            "gt_idx": gt_idx, "valid": valid}
