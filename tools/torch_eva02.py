"""From-scratch torch mirror of the Flax EVA02 classifier (models/eva02.py).

Cross-framework parity harness for Stage-2 (tests/test_torch_parity.py):
the SAME Flax parameter pytree runs through (a) our jitted Flax model and
(b) this independent torch execution — any divergence in patch embedding,
RoPE, attention, sub-LN placement, SwiGLU, or the head fails the test.
The reference runs EVA02 through timm (species_classifier.py:235-353);
real timm checkpoints are unreachable (zero-egress), so parity is proven
modulo weights, exactly like the YOLOX mirror (tools/torch_yolox.py).

Consumes the Flax params dict directly (no name conversion): flax Dense
kernels are (in, out) so ``x @ W``; conv kernels are HWIO -> torch OIHW.
"""
from __future__ import annotations

import math
import sys
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from telescope_cam_detection_tpu.models.eva02 import (  # noqa: E402
    EVA02_VARIANTS,
)


def _rope_freqs_torch(dim: int, n_side: int,
                      theta: float = 100.0) -> torch.Tensor:
    """2D axial RoPE angle table, written independently of the flax model's
    `_rope_freqs` (torch ops, index arithmetic instead of repeats) so the
    parity test catches a frequency/position-generation bug in either side.
    Layout contract: rows scan the patch grid row-major (y outer, x inner);
    first dim/4 angles rotate with y, the next dim/4 with x."""
    quarter = dim // 4
    inv = theta ** (-torch.arange(quarter, dtype=torch.float64) / quarter)
    t = torch.arange(n_side * n_side, dtype=torch.float64)
    y_pos, x_pos = t // n_side, t % n_side
    ang_y = y_pos[:, None] * inv[None, :]          # (T, quarter)
    ang_x = x_pos[:, None] * inv[None, :]
    return torch.cat([ang_y, ang_x], dim=1).float()  # (T, dim/2)

_EPS = 1e-6  # flax LayerNorm default (torch's default is 1e-5)


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _dense(x: torch.Tensor, p: dict) -> torch.Tensor:
    y = x @ _t(p["kernel"])
    if "bias" in p:
        y = y + _t(p["bias"])
    return y


def _ln(x: torch.Tensor, p: dict) -> torch.Tensor:
    return F.layer_norm(x, x.shape[-1:], _t(p["scale"]), _t(p["bias"]), _EPS)


def _rope(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor,
          n_prefix: int = 1) -> torch.Tensor:
    """x: (B, T, H, D); cos/sin: (T - n_prefix, D/2)."""
    prefix, tokens = x[:, :n_prefix], x[:, n_prefix:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    t1, t2 = tokens.chunk(2, dim=-1)
    rotated = torch.cat([t1 * c - t2 * s, t1 * s + t2 * c], dim=-1)
    return torch.cat([prefix, rotated], dim=1)


@torch.no_grad()
def torch_eva02_forward(params: dict, images_nhwc: np.ndarray,
                        variant: str = "eva02-tiny",
                        image_size: int = 112) -> np.ndarray:
    """params: Flax ``variables['params']`` (numpy-able leaves);
    images_nhwc: (B, H, W, 3) normalized float32. Returns (B, classes)."""
    depth, dim, heads, mlp_hidden, patch = EVA02_VARIANTS[variant]
    head_dim = dim // heads
    n_side = image_size // patch

    x_img = torch.from_numpy(
        np.asarray(images_nhwc, np.float32)).permute(0, 3, 1, 2)
    w = _t(params["patch_embed"]["kernel"]).permute(3, 2, 0, 1)  # HWIO->OIHW
    x = F.conv2d(x_img, w, _t(params["patch_embed"]["bias"]), stride=patch)
    b = x.shape[0]
    # NCHW -> (B, T, C) in the same row-major order as the flax reshape
    x = x.permute(0, 2, 3, 1).reshape(b, n_side * n_side, dim)

    cls = _t(params["cls_token"]).expand(b, 1, dim)
    x = torch.cat([cls, x], dim=1)
    x = x + _t(params["pos_embed"])

    angles = _rope_freqs_torch(head_dim, n_side)
    cos, sin = torch.cos(angles), torch.sin(angles)

    for i in range(depth):
        p = params[f"block{i}"]
        h = _ln(x, p["norm1"])
        t_len = h.shape[1]
        q = _dense(h, p["q_proj"]).reshape(b, t_len, heads, head_dim)
        k = _dense(h, p["k_proj"]).reshape(b, t_len, heads, head_dim)
        v = _dense(h, p["v_proj"]).reshape(b, t_len, heads, head_dim)
        q = _rope(q, cos, sin)
        k = _rope(k, cos, sin)
        attn = F.scaled_dot_product_attention(
            q.permute(0, 2, 1, 3), k.permute(0, 2, 1, 3),
            v.permute(0, 2, 1, 3), scale=1.0 / math.sqrt(head_dim))
        attn = attn.permute(0, 2, 1, 3).reshape(b, t_len, dim)
        attn = _ln(attn, p["attn_ln"])          # sub-LN
        x = x + _dense(attn, p["proj"])

        h = _ln(x, p["norm2"])
        m = p["mlp"]
        gate = F.silu(_dense(h, m["w1"]))
        val = _dense(h, m["w2"])
        ff = _ln(gate * val, m["ffn_ln"])       # sub-LN
        x = x + _dense(ff, m["w3"])

    x = _ln(x, params["norm"])
    logits = _dense(x[:, 0], params["head"])
    return logits.numpy()
