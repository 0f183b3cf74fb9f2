"""From-scratch torch mirror of the Flax RT-DETRv2 (models/rtdetr.py).

Completes the cross-framework parity harness across every model family:
YOLOX (tools/torch_yolox.py), EVA02 (tools/torch_eva02.py), and now the
RT-DETR detector the reference drives through its vendored torch repo
(src/rtdetr_detector.py:26-425). The SAME Flax variables (params +
batch_stats) run through this independent torch execution — divergence in
the ResNet-vd backbone, AIFI positional encoding, CCFF fusion, deformable
sampling math, decoder refinement, or the NMS-free top-k postprocess fails
the parity test.

Layout notes: tensors stay NHWC (mirroring the Flax program exactly) and
permute around each torch conv/pool; Flax Dense kernels are (in, out);
conv kernels HWIO -> torch OIHW; BatchNorm eps 1e-3 with running stats;
LayerNorm eps 1e-6.
"""
from __future__ import annotations

import math
import sys
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from telescope_cam_detection_tpu.models.rtdetr import (  # noqa: E402
    HIDDEN,
    N_POINTS,
    RTDETR_VARIANTS,
)


def _sincos_pos_embed_2d_torch(h: int, w: int, dim: int,
                               temperature: float = 10000.0) -> torch.Tensor:
    """(h*w, dim) AIFI 2D sine-cosine embedding, written independently of
    the flax model's `sincos_pos_embed_2d` (torch ops, flat-index
    arithmetic) so the parity test catches a position-generation bug in
    either side. Layout contract: tokens scan row-major (y outer, x inner);
    channels are [sin(x), cos(x), sin(y), cos(y)] quarters."""
    assert dim % 4 == 0
    quarter = dim // 4
    omega = temperature ** (-torch.arange(quarter, dtype=torch.float64)
                            / quarter)
    t = torch.arange(h * w, dtype=torch.float64)
    ys, xs = t // w, t % w
    out_x = xs[:, None] * omega[None, :]
    out_y = ys[:, None] * omega[None, :]
    return torch.cat([torch.sin(out_x), torch.cos(out_x),
                      torch.sin(out_y), torch.cos(out_y)], dim=1).float()

_LN_EPS = 1e-6
_BN_EPS = 1e-3


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _dense(x: torch.Tensor, p: dict) -> torch.Tensor:
    y = x @ _t(p["kernel"])
    if "bias" in p:
        y = y + _t(p["bias"])
    return y


def _ln(x: torch.Tensor, p: dict) -> torch.Tensor:
    return F.layer_norm(x, x.shape[-1:], _t(p["scale"]), _t(p["bias"]),
                        _LN_EPS)


def _conv_bn_act(x: torch.Tensor, p: dict, s: dict, stride: int,
                 act: str) -> torch.Tensor:
    """ConvBnAct mirror (models/common.py): symmetric (k-1)//2 padding,
    BN with running stats, activation. x is NHWC."""
    w = _t(p["conv"]["kernel"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    pad = (w.shape[-1] - 1) // 2
    y = F.conv2d(x.permute(0, 3, 1, 2), w, stride=stride, padding=pad)
    bn_p, bn_s = p["bn"], s["bn"]
    y = F.batch_norm(y, _t(bn_s["mean"]), _t(bn_s["var"]),
                     _t(bn_p["scale"]), _t(bn_p["bias"]),
                     training=False, eps=_BN_EPS)
    y = y.permute(0, 2, 3, 1)
    if act == "relu":
        return F.relu(y)
    if act == "silu":
        return F.silu(y)
    if act == "identity":
        return y
    raise ValueError(act)


def _basic_block(x, p, s, stride):
    y = _conv_bn_act(x, p["conv1"], s["conv1"], stride, "relu")
    y = _conv_bn_act(y, p["conv2"], s["conv2"], 1, "identity")
    identity = x
    if "down" in p:
        if stride != 1:
            identity = F.avg_pool2d(identity.permute(0, 3, 1, 2), 2, 2) \
                .permute(0, 2, 3, 1)
        identity = _conv_bn_act(identity, p["down"], s["down"], 1, "identity")
    return F.relu(y + identity)


def _bottleneck_block(x, p, s, stride):
    y = _conv_bn_act(x, p["conv1"], s["conv1"], 1, "relu")
    y = _conv_bn_act(y, p["conv2"], s["conv2"], stride, "relu")
    y = _conv_bn_act(y, p["conv3"], s["conv3"], 1, "identity")
    identity = x
    if "down" in p:
        if stride != 1:
            identity = F.avg_pool2d(identity.permute(0, 3, 1, 2), 2, 2) \
                .permute(0, 2, 3, 1)
        identity = _conv_bn_act(identity, p["down"], s["down"], 1, "identity")
    return F.relu(y + identity)


def _backbone(x, p, s, depths, bottleneck):
    x = _conv_bn_act(x, p["stem1"], s["stem1"], 2, "relu")
    x = _conv_bn_act(x, p["stem2"], s["stem2"], 1, "relu")
    x = _conv_bn_act(x, p["stem3"], s["stem3"], 1, "relu")
    x = F.max_pool2d(x.permute(0, 3, 1, 2), 3, 2, padding=1) \
        .permute(0, 2, 3, 1)
    block = _bottleneck_block if bottleneck else _basic_block
    feats = []
    for stage, depth in enumerate(depths):
        for i in range(depth):
            stride = 2 if (i == 0 and stage > 0) else 1
            name = f"stage{stage}_block{i}"
            x = block(x, p[name], s[name], stride)
        if stage >= 1:
            feats.append(x)
    return feats


def _sdpa(q, k, v, heads):
    """jax.nn.dot_product_attention mirror for (B, T, H*D) projections."""
    b, t, dim = q.shape
    hd = dim // heads

    def split(x):
        return x.reshape(b, t, heads, hd).permute(0, 2, 1, 3)

    out = F.scaled_dot_product_attention(split(q), split(k), split(v),
                                         scale=1.0 / math.sqrt(hd))
    return out.permute(0, 2, 1, 3).reshape(b, t, dim)


def _aifi(tokens, pos, p, heads):
    q = k = tokens + pos
    attn = _sdpa(_dense(q, p["q"]), _dense(k, p["k"]),
                 _dense(tokens, p["v"]), heads)
    attn = _dense(attn, p["proj"])
    x = _ln(tokens + attn, p["norm1"])
    y = _dense(F.gelu(_dense(x, p["ffn1"]), approximate="tanh"), p["ffn2"])
    return _ln(x + y, p["norm2"])


def _rep_block(x, p, s):
    a = _conv_bn_act(x, p["conv3"], s["conv3"], 1, "identity")
    b = _conv_bn_act(x, p["conv1"], s["conv1"], 1, "identity")
    return F.silu(a + b)


def _csp_rep(x, p, s, n=3):
    a = _conv_bn_act(x, p["conv1"], s["conv1"], 1, "silu")
    b = _conv_bn_act(x, p["conv2"], s["conv2"], 1, "silu")
    for i in range(n):
        a = _rep_block(a, p[f"rep{i}"], s[f"rep{i}"])
    return _conv_bn_act(a + b, p["conv3"], s["conv3"], 1, "silu")


def _up2(x):
    n, h, w, c = x.shape
    return x[:, :, None, :, None, :].expand(n, h, 2, w, 2, c) \
        .reshape(n, h * 2, w * 2, c)


def _encoder(feats, p, s, heads):
    proj = [_conv_bn_act(f, p[f"input_proj{i}"], s[f"input_proj{i}"], 1,
                         "identity") for i, f in enumerate(feats)]
    s3, s4, s5 = proj
    b, h5, w5, _ = s5.shape
    tokens = s5.reshape(b, h5 * w5, HIDDEN)
    pos = _sincos_pos_embed_2d_torch(h5, w5, HIDDEN)[None]
    tokens = _aifi(tokens, pos, p["aifi"], heads)
    s5 = tokens.reshape(b, h5, w5, HIDDEN)

    lat5 = _conv_bn_act(s5, p["lateral1"], s["lateral1"], 1, "silu")
    p4 = _csp_rep(torch.cat([_up2(lat5), s4], -1),
                  p["fpn_block1"], s["fpn_block1"])
    lat4 = _conv_bn_act(p4, p["lateral2"], s["lateral2"], 1, "silu")
    p3 = _csp_rep(torch.cat([_up2(lat4), s3], -1),
                  p["fpn_block2"], s["fpn_block2"])

    d3 = _conv_bn_act(p3, p["down1"], s["down1"], 2, "silu")
    n4 = _csp_rep(torch.cat([d3, lat4], -1), p["pan_block1"], s["pan_block1"])
    d4 = _conv_bn_act(n4, p["down2"], s["down2"], 2, "silu")
    n5 = _csp_rep(torch.cat([d4, lat5], -1), p["pan_block2"], s["pan_block2"])
    return [p3, n4, n5]


def _ms_deform(values, locs, weights):
    """ops mirror of models/rtdetr.ms_deformable_attention: half-pixel
    bilinear sampling with border clamp, weighted point/level reduce.
    values: per level (B, H, W, heads, hd); locs (B, Q, heads, L, P, 2);
    weights (B, Q, heads, L, P). Returns (B, Q, heads, hd)."""
    b, q, heads, n_levels, n_points, _ = locs.shape
    out = None
    for lvl in range(n_levels):
        v = values[lvl]
        _, h, w, _, hd = v.shape
        loc = locs[:, :, :, lvl]                       # (B,Q,H,P,2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = torch.floor(x)
        y0 = torch.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]

        flat = v.reshape(b, h * w, heads, hd).permute(0, 2, 1, 3)  # B,H,HW,hd

        def gather(yy, xx):
            yy = yy.long().clamp(0, h - 1)
            xx = xx.long().clamp(0, w - 1)
            idx = (yy * w + xx).permute(0, 2, 1, 3) \
                .reshape(b, heads, q * n_points, 1).expand(-1, -1, -1, hd)
            g = torch.gather(flat, 2, idx)
            return g.reshape(b, heads, q, n_points, hd) \
                .permute(0, 2, 1, 3, 4)

        g00 = gather(y0, x0)
        g01 = gather(y0, x0 + 1)
        g10 = gather(y0 + 1, x0)
        g11 = gather(y0 + 1, x0 + 1)
        sampled = ((1 - fy) * (1 - fx) * g00 + (1 - fy) * fx * g01
                   + fy * (1 - fx) * g10 + fy * fx * g11)
        term = (sampled * weights[:, :, :, lvl][..., None]).sum(dim=3)
        out = term if out is None else out + term
    return out


def _ms_deform_attn(query, ref_points, value_levels, p, heads, levels):
    b, q, dim = query.shape
    hd = dim // heads
    wv = _t(p["value_proj"]["kernel"]).reshape(dim, heads * hd)
    bv = _t(p["value_proj"]["bias"]).reshape(heads * hd)
    values = []
    for v in value_levels:
        _, h, w, _ = v.shape
        pv = (v.reshape(b, h * w, dim) @ wv + bv) \
            .reshape(b, h, w, heads, hd)
        values.append(pv)

    n_points = N_POINTS
    off = _dense(query, p["sampling_offsets"]) \
        .reshape(b, q, heads, levels, n_points, 2)
    w_l = _dense(query, p["attention_weights"]) \
        .reshape(b, q, heads, levels * n_points)
    w_l = torch.softmax(w_l, -1).reshape(b, q, heads, levels, n_points)

    center = ref_points[:, :, None, None, None, :2]
    wh = ref_points[:, :, None, None, None, 2:]
    locs = center + off / n_points * wh * 0.5
    out = _ms_deform(values, locs, w_l)
    return _dense(out.reshape(b, q, dim), p["output_proj"])


def _decoder_layer(query, query_pos, ref_points, value_levels, p, heads,
                   levels):
    qk = query + query_pos
    sa = _sdpa(_dense(qk, p["sa_q"]), _dense(qk, p["sa_k"]),
               _dense(query, p["sa_v"]), heads)
    sa = _dense(sa, p["sa_proj"])
    query = _ln(query + sa, p["norm1"])
    ca = _ms_deform_attn(query + query_pos, ref_points, value_levels,
                         p["cross_attn"], heads, levels)
    query = _ln(query + ca, p["norm2"])
    y = _dense(F.relu(_dense(query, p["ffn1"])), p["ffn2"])
    return _ln(query + y, p["norm3"])


def _mlp(x, p, layers=3, act=F.relu):
    for i in range(layers - 1):
        x = act(_dense(x, p[f"l{i}"]))
    return _dense(x, p[f"l{layers - 1}"])


def _inv_sigmoid(x, eps=1e-5):
    x = x.clamp(eps, 1 - eps)
    return torch.log(x / (1 - x))


@torch.no_grad()
def torch_rtdetr_forward(variables: dict, images_nhwc: np.ndarray,
                         variant: str = "rtdetrv2-r18vd",
                         num_classes: int = 80, num_queries: int = 300,
                         heads: int = 8, levels: int = 3):
    """variables: Flax {params, batch_stats}; images (B, H, W, 3) float
    RGB 0..1. Returns (logits (B,Q,C), boxes cxcywh normalized (B,Q,4))."""
    depths, dec_layers = RTDETR_VARIANTS[variant]
    bottleneck = variant.endswith(("r50vd", "r101vd"))
    params, stats = variables["params"], variables["batch_stats"]

    x = torch.from_numpy(np.asarray(images_nhwc, np.float32))
    feats = _backbone(x, params["backbone"], stats["backbone"], depths,
                      bottleneck)
    value_levels = _encoder(feats, params["encoder"], stats["encoder"],
                            heads)

    b = x.shape[0]
    tokens, anchors = [], []
    for lvl, f in enumerate(value_levels):
        _, h, w, _ = f.shape
        tokens.append(f.reshape(b, h * w, HIDDEN))
        gy = (torch.arange(h, dtype=torch.float32)[:, None]
              .expand(h, w) + 0.5) / h
        gx = (torch.arange(w, dtype=torch.float32)[None, :]
              .expand(h, w) + 0.5) / w
        wh = torch.full((h, w, 2), 0.05 * (2.0 ** lvl))
        anchors.append(torch.cat([gx[..., None], gy[..., None], wh], -1)
                       .reshape(h * w, 4))
    memory = torch.cat(tokens, dim=1)
    anchors = torch.cat(anchors, dim=0)[None]

    enc_out = _ln(_dense(memory, params["enc_output"]), params["enc_norm"])
    enc_logits = _dense(enc_out, params["enc_score_head"])
    enc_boxes = torch.sigmoid(
        _mlp(enc_out, params["enc_bbox_head"]) + _inv_sigmoid(anchors))

    # stable descending argsort, matching jnp.argsort(-max_logits)
    max_np = enc_logits.max(dim=-1).values.numpy()
    topk = torch.from_numpy(
        np.argsort(-max_np, axis=1, kind="stable")[:, :num_queries].copy())
    ref_boxes = torch.gather(enc_boxes, 1,
                             topk[..., None].expand(-1, -1, 4))
    query = torch.gather(enc_out, 1, topk[..., None].expand(-1, -1, HIDDEN))

    boxes = ref_boxes
    for i in range(dec_layers):
        query_pos = _mlp(boxes, params["query_pos_head"], layers=2)
        query = _decoder_layer(query, query_pos, boxes, value_levels,
                               params[f"decoder{i}"], heads, levels)
        delta = _mlp(query, params[f"bbox_head{i}"])
        boxes = torch.sigmoid(delta + _inv_sigmoid(boxes))
    logits = _dense(query, params["class_head"])
    return logits.numpy(), boxes.numpy()


def torch_rtdetr_predict_rows(variables, images_nhwc, **kw) -> np.ndarray:
    """NMS-free top-k rows mirroring RTDETR.predict (models/rtdetr.py:461):
    (B, Q, 7) [x1,y1,x2,y2,1,score,class] in model-input pixels."""
    logits, boxes = torch_rtdetr_forward(variables, images_nhwc, **kw)
    b, q, c = logits.shape
    h, w = np.asarray(images_nhwc).shape[1:3]
    scores = 1.0 / (1.0 + np.exp(-logits))
    flat = scores.reshape(b, q * c)
    rows = np.zeros((b, q, 7), np.float32)
    for i in range(b):
        top_idx = np.argsort(-flat[i], kind="stable")[:q]
        top_scores = flat[i, top_idx]
        query_idx = top_idx // c
        class_idx = (top_idx % c).astype(np.float32)
        sel = boxes[i, query_idx]
        cx, cy, bw, bh = (sel[:, 0] * w, sel[:, 1] * h,
                          sel[:, 2] * w, sel[:, 3] * h)
        rows[i] = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                            cy + bh / 2, np.ones_like(top_scores),
                            top_scores, class_idx], axis=-1)
    return rows
