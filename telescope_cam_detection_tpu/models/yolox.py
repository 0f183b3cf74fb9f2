"""YOLOX detector family in Flax (CSPDarknet + PAFPN + decoupled head).

Functional re-implementation of the architecture the reference wraps via the
vendored Megvii repo (reference src/yolox_detector.py:43-426 drives it; the
model itself lives outside the reference tree). Built NHWC/TPU-first with
static shapes; the head decode produces (anchors, 4+1+C) tensors that feed
straight into ops.nms.batched_nms inside the same jitted program.

Variants match the standard YOLOX depth/width table so Megvii checkpoints
convert 1:1 (models/convert.py).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from telescope_cam_detection_tpu.models.common import (
    ConvBnAct,
    CSPLayer,
    DWConvBlock,
    Focus,
    SPPBottleneck,
    compute_dtype,
    upsample2x,
)

# name -> (depth_mult, width_mult, depthwise)
YOLOX_VARIANTS: Dict[str, Tuple[float, float, bool]] = {
    "yolox-nano": (0.33, 0.25, True),
    "yolox-tiny": (0.33, 0.375, False),
    "yolox-s": (0.33, 0.50, False),
    "yolox-m": (0.67, 0.75, False),
    "yolox-l": (1.00, 1.00, False),
    "yolox-x": (1.33, 1.25, False),
}

STRIDES = (8, 16, 32)


def _w(width: float, ch: int) -> int:
    return int(ch * width)


def _d(depth: float, n: int) -> int:
    return max(round(n * depth), 1)


class CSPDarknet(nn.Module):
    depth: float
    width: float
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        dt, act = self.dtype, self.act
        dw = self.depthwise
        base = _w(self.width, 64)

        x = Focus(base, 3, act=act, dtype=dt, name="stem")(x, train)

        block = DWConvBlock if dw else ConvBnAct
        CSP = (nn.remat(CSPLayer, static_argnums=(2,)) if self.remat
               else CSPLayer)
        # dark2
        x = block(base * 2, 3, 2, act=act, dtype=dt, name="dark2_conv")(x, train)
        x = CSP(base * 2, _d(self.depth, 3), True, depthwise=dw, act=act,
                dtype=dt, name="dark2_csp")(x, train)
        # dark3
        x = block(base * 4, 3, 2, act=act, dtype=dt, name="dark3_conv")(x, train)
        x = CSP(base * 4, _d(self.depth, 9), True, depthwise=dw, act=act,
                dtype=dt, name="dark3_csp")(x, train)
        c3 = x
        # dark4
        x = block(base * 8, 3, 2, act=act, dtype=dt, name="dark4_conv")(x, train)
        x = CSP(base * 8, _d(self.depth, 9), True, depthwise=dw, act=act,
                dtype=dt, name="dark4_csp")(x, train)
        c4 = x
        # dark5
        x = block(base * 16, 3, 2, act=act, dtype=dt, name="dark5_conv")(x, train)
        x = SPPBottleneck(base * 16, act=act, dtype=dt, name="dark5_spp")(x, train)
        x = CSP(base * 16, _d(self.depth, 3), False, depthwise=dw, act=act,
                dtype=dt, name="dark5_csp")(x, train)
        return c3, c4, x


class PAFPN(nn.Module):
    depth: float
    width: float
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        dt, act, dw = self.dtype, self.act, self.depthwise
        n = _d(self.depth, 3)
        ch = lambda c: _w(self.width, c)
        block = DWConvBlock if dw else ConvBnAct
        CSP = (nn.remat(CSPLayer, static_argnums=(2,)) if self.remat
               else CSPLayer)

        # top-down
        p5_lat = ConvBnAct(ch(512), 1, 1, act=act, dtype=dt,
                           name="lateral_conv0")(c5, train)
        x = jnp.concatenate([upsample2x(p5_lat), c4], axis=-1)
        p4_td = CSP(ch(512), n, False, depthwise=dw, act=act, dtype=dt,
                    name="C3_p4")(x, train)

        p4_lat = ConvBnAct(ch(256), 1, 1, act=act, dtype=dt,
                           name="reduce_conv1")(p4_td, train)
        x = jnp.concatenate([upsample2x(p4_lat), c3], axis=-1)
        p3_out = CSP(ch(256), n, False, depthwise=dw, act=act, dtype=dt,
                     name="C3_p3")(x, train)

        # bottom-up
        x = block(ch(256), 3, 2, act=act, dtype=dt, name="bu_conv2")(p3_out, train)
        x = jnp.concatenate([x, p4_lat], axis=-1)
        p4_out = CSP(ch(512), n, False, depthwise=dw, act=act, dtype=dt,
                     name="C3_n3")(x, train)

        x = block(ch(512), 3, 2, act=act, dtype=dt, name="bu_conv1")(p4_out, train)
        x = jnp.concatenate([x, p5_lat], axis=-1)
        p5_out = CSP(ch(1024), n, False, depthwise=dw, act=act, dtype=dt,
                     name="C3_n4")(x, train)
        return p3_out, p4_out, p5_out


class YOLOXHead(nn.Module):
    """Decoupled head: shared-width stems, separate cls/reg branches."""
    num_classes: int = 80
    width: float = 1.0
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        dt, act = self.dtype, self.act
        hidden = _w(self.width, 256)
        block = DWConvBlock if self.depthwise else ConvBnAct
        outputs = []
        for lvl, f in enumerate(feats):
            x = ConvBnAct(hidden, 1, 1, act=act, dtype=dt,
                          name=f"stem{lvl}")(f, train)
            c = block(hidden, 3, 1, act=act, dtype=dt,
                      name=f"cls_conv{lvl}_0")(x, train)
            c = block(hidden, 3, 1, act=act, dtype=dt,
                      name=f"cls_conv{lvl}_1")(c, train)
            # prediction convs stay float even under int8 (tiny FLOPs,
            # box regression feeds exp() in the decode — quantization
            # noise there moves boxes directly)
            pdt = compute_dtype(dt)
            cls_out = nn.Conv(self.num_classes, (1, 1), dtype=pdt,
                              name=f"cls_pred{lvl}")(c)
            r = block(hidden, 3, 1, act=act, dtype=dt,
                      name=f"reg_conv{lvl}_0")(x, train)
            r = block(hidden, 3, 1, act=act, dtype=dt,
                      name=f"reg_conv{lvl}_1")(r, train)
            reg_out = nn.Conv(4, (1, 1), dtype=pdt, name=f"reg_pred{lvl}")(r)
            obj_out = nn.Conv(1, (1, 1), dtype=pdt, name=f"obj_pred{lvl}")(r)
            outputs.append((reg_out, obj_out, cls_out))
        return outputs


class YOLOX(nn.Module):
    num_classes: int = 80
    depth: float = 0.33
    width: float = 0.50
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32
    # rematerialize each CSP stage under grad (jax.checkpoint): recompute
    # stage activations in the backward pass instead of storing them —
    # bigger train batches per chip at ~1 extra forward of FLOPs
    remat: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images: (N, H, W, 3) float BGR 0..255 (YOLOX convention).

        Returns per-level raw head outputs.
        """
        feats = CSPDarknet(self.depth, self.width, self.depthwise, self.act,
                           self.dtype, remat=self.remat,
                           name="backbone")(images, train)
        feats = PAFPN(self.depth, self.width, self.depthwise, self.act,
                      self.dtype, remat=self.remat, name="neck")(feats, train)
        return YOLOXHead(self.num_classes, self.width, self.depthwise,
                         self.act, self.dtype, name="head")(feats, train)


# ---------------------------------------------------------------------------
# Decode: raw head outputs -> (boxes xyxy, obj_conf, class_probs)
# ---------------------------------------------------------------------------

def decode_outputs(
    level_outputs: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    strides: Sequence[int] = STRIDES,
):
    """YOLOX anchor-free decode: xy = (pred + grid) * stride,
    wh = exp(pred) * stride; sigmoid on obj/cls. Output shapes
    (N, A, 4), (N, A), (N, A, C) with A = sum(H_l * W_l)."""
    boxes_all, obj_all, cls_all = [], [], []
    for (reg, obj, cls), stride in zip(level_outputs, strides):
        n, h, w, _ = reg.shape
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        cx = (reg[..., 0] + gx[None]) * stride
        cy = (reg[..., 1] + gy[None]) * stride
        bw = jnp.exp(reg[..., 2]) * stride
        bh = jnp.exp(reg[..., 3]) * stride
        boxes = jnp.stack(
            [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
        boxes_all.append(boxes.reshape(n, h * w, 4))
        obj_all.append(jax.nn.sigmoid(obj[..., 0]).reshape(n, h * w))
        cls_all.append(jax.nn.sigmoid(cls).reshape(n, h * w, -1))
    return (jnp.concatenate(boxes_all, axis=1).astype(jnp.float32),
            jnp.concatenate(obj_all, axis=1).astype(jnp.float32),
            jnp.concatenate(cls_all, axis=1).astype(jnp.float32))


def build_yolox(name: str = "yolox-s", num_classes: int = 80,
                dtype=jnp.float32, remat: bool = False) -> YOLOX:
    if name not in YOLOX_VARIANTS:
        raise ValueError(f"unknown YOLOX variant {name!r}; "
                         f"valid: {sorted(YOLOX_VARIANTS)}")
    depth, width, depthwise = YOLOX_VARIANTS[name]
    return YOLOX(num_classes=num_classes, depth=depth, width=width,
                 depthwise=depthwise, dtype=dtype, remat=remat)


def init_yolox(name: str = "yolox-s", num_classes: int = 80,
               input_hw: Tuple[int, int] = (640, 640), seed: int = 0,
               dtype=jnp.float32):
    """Build a model + params (random init, for tests or training)."""
    model = build_yolox(name, num_classes, dtype)
    dummy = jnp.zeros((1, *input_hw, 3), compute_dtype(dtype))
    variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    return model, variables
