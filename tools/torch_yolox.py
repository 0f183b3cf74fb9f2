"""PyTorch mirror of the Flax YOLOX family, for cross-framework parity.

This is NOT the serving model — it exists so the torch<->flax weight
converter (models/convert.py) and the whole decode path can be validated
end-to-end against an independent torch execution of the SAME architecture
(the north star demands IoU>=0.99 bbox parity vs the torch reference;
reference decode semantics: src/yolox_detector.py:222-314).

It is written from our own Flax modules (models/yolox.py, models/common.py),
using Megvii-style state-dict names (the converter's export target:
models/convert.py flax_path_to_torch_name), so that
``export_yolox_to_torch_names(flax_vars)`` loads with ``strict=True``.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from telescope_cam_detection_tpu.models.yolox import STRIDES, YOLOX_VARIANTS


def _w(width: float, ch: int) -> int:
    return int(ch * width)


def _d(depth: float, n: int) -> int:
    return max(round(n * depth), 1)


class BaseConv(nn.Module):
    """Conv + BN(eps=1e-3) + SiLU (mirrors common.ConvBnAct)."""

    def __init__(self, in_ch: int, out_ch: int, k: int, stride: int,
                 groups: int = 1):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride, (k - 1) // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class DWConv(nn.Module):
    """Depthwise-separable conv (mirrors common.DWConvBlock)."""

    def __init__(self, in_ch: int, out_ch: int, k: int, stride: int):
        super().__init__()
        self.dconv = BaseConv(in_ch, in_ch, k, stride, groups=in_ch)
        self.pconv = BaseConv(in_ch, out_ch, 1, 1)

    def forward(self, x):
        return self.pconv(self.dconv(x))


class Bottleneck(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, shortcut: bool,
                 expansion: float, depthwise: bool):
        super().__init__()
        hidden = int(out_ch * expansion)
        Block = DWConv if depthwise else BaseConv
        self.conv1 = BaseConv(in_ch, hidden, 1, 1)
        self.conv2 = Block(hidden, out_ch, 3, 1)
        self.use_add = shortcut and in_ch == out_ch

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        return y + x if self.use_add else y


class CSPLayer(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, n: int, shortcut: bool,
                 depthwise: bool):
        super().__init__()
        hidden = int(out_ch * 0.5)
        self.conv1 = BaseConv(in_ch, hidden, 1, 1)
        self.conv2 = BaseConv(in_ch, hidden, 1, 1)
        self.m = nn.Sequential(*[
            Bottleneck(hidden, hidden, shortcut, 1.0, depthwise)
            for _ in range(n)])
        self.conv3 = BaseConv(2 * hidden, out_ch, 1, 1)

    def forward(self, x):
        a = self.m(self.conv1(x))
        return self.conv3(torch.cat([a, self.conv2(x)], dim=1))


class Focus(nn.Module):
    """Space-to-depth stem; patch order [tl, bl, tr, br] matches
    models/common.Focus."""

    def __init__(self, in_ch: int, out_ch: int, k: int):
        super().__init__()
        self.conv = BaseConv(in_ch * 4, out_ch, k, 1)

    def forward(self, x):
        tl = x[..., 0::2, 0::2]
        bl = x[..., 1::2, 0::2]
        tr = x[..., 0::2, 1::2]
        br = x[..., 1::2, 1::2]
        return self.conv(torch.cat([tl, bl, tr, br], dim=1))


class SPPBottleneck(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, ks=(5, 9, 13)):
        super().__init__()
        hidden = in_ch // 2
        self.conv1 = BaseConv(in_ch, hidden, 1, 1)
        self.pools = nn.ModuleList(
            [nn.MaxPool2d(k, 1, k // 2) for k in ks])
        self.conv2 = BaseConv(hidden * (len(ks) + 1), out_ch, 1, 1)

    def forward(self, x):
        x = self.conv1(x)
        return self.conv2(torch.cat([x] + [p(x) for p in self.pools], dim=1))


class CSPDarknet(nn.Module):
    def __init__(self, depth: float, width: float, depthwise: bool):
        super().__init__()
        Block = DWConv if depthwise else BaseConv
        base = _w(width, 64)
        self.stem = Focus(3, base, 3)
        self.dark2 = nn.Sequential(
            Block(base, base * 2, 3, 2),
            CSPLayer(base * 2, base * 2, _d(depth, 3), True, depthwise))
        self.dark3 = nn.Sequential(
            Block(base * 2, base * 4, 3, 2),
            CSPLayer(base * 4, base * 4, _d(depth, 9), True, depthwise))
        self.dark4 = nn.Sequential(
            Block(base * 4, base * 8, 3, 2),
            CSPLayer(base * 8, base * 8, _d(depth, 9), True, depthwise))
        self.dark5 = nn.Sequential(
            Block(base * 8, base * 16, 3, 2),
            SPPBottleneck(base * 16, base * 16),
            CSPLayer(base * 16, base * 16, _d(depth, 3), False, depthwise))

    def forward(self, x):
        x = self.stem(x)
        x = self.dark2(x)
        c3 = self.dark3(x)
        c4 = self.dark4(c3)
        c5 = self.dark5(c4)
        return c3, c4, c5


class YOLOPAFPN(nn.Module):
    """Named 'backbone' at the top level (Megvii convention)."""

    def __init__(self, depth: float, width: float, depthwise: bool):
        super().__init__()
        self.backbone = CSPDarknet(depth, width, depthwise)
        Block = DWConv if depthwise else BaseConv
        n = _d(depth, 3)
        ch = lambda c: _w(width, c)  # noqa: E731
        self.lateral_conv0 = BaseConv(ch(1024), ch(512), 1, 1)
        self.C3_p4 = CSPLayer(ch(1024), ch(512), n, False, depthwise)
        self.reduce_conv1 = BaseConv(ch(512), ch(256), 1, 1)
        self.C3_p3 = CSPLayer(ch(512), ch(256), n, False, depthwise)
        self.bu_conv2 = Block(ch(256), ch(256), 3, 2)
        self.C3_n3 = CSPLayer(ch(512), ch(512), n, False, depthwise)
        self.bu_conv1 = Block(ch(512), ch(512), 3, 2)
        self.C3_n4 = CSPLayer(ch(1024), ch(1024), n, False, depthwise)

    def forward(self, x):
        c3, c4, c5 = self.backbone(x)
        p5_lat = self.lateral_conv0(c5)
        x = torch.cat([F.interpolate(p5_lat, scale_factor=2, mode="nearest"),
                       c4], dim=1)
        p4_td = self.C3_p4(x)
        p4_lat = self.reduce_conv1(p4_td)
        x = torch.cat([F.interpolate(p4_lat, scale_factor=2, mode="nearest"),
                       c3], dim=1)
        p3_out = self.C3_p3(x)
        x = torch.cat([self.bu_conv2(p3_out), p4_lat], dim=1)
        p4_out = self.C3_n3(x)
        x = torch.cat([self.bu_conv1(p4_out), p5_lat], dim=1)
        p5_out = self.C3_n4(x)
        return p3_out, p4_out, p5_out


class YOLOXHead(nn.Module):
    def __init__(self, num_classes: int, width: float, depthwise: bool):
        super().__init__()
        hidden = _w(width, 256)
        in_chs = [_w(width, 256), _w(width, 512), _w(width, 1024)]
        Block = DWConv if depthwise else BaseConv
        self.stems = nn.ModuleList()
        self.cls_convs = nn.ModuleList()
        self.reg_convs = nn.ModuleList()
        self.cls_preds = nn.ModuleList()
        self.reg_preds = nn.ModuleList()
        self.obj_preds = nn.ModuleList()
        for in_ch in in_chs:
            self.stems.append(BaseConv(in_ch, hidden, 1, 1))
            self.cls_convs.append(nn.Sequential(
                Block(hidden, hidden, 3, 1), Block(hidden, hidden, 3, 1)))
            self.reg_convs.append(nn.Sequential(
                Block(hidden, hidden, 3, 1), Block(hidden, hidden, 3, 1)))
            self.cls_preds.append(nn.Conv2d(hidden, num_classes, 1))
            self.reg_preds.append(nn.Conv2d(hidden, 4, 1))
            self.obj_preds.append(nn.Conv2d(hidden, 1, 1))

    def forward(self, feats):
        outs = []
        for i, f in enumerate(feats):
            x = self.stems[i](f)
            c = self.cls_convs[i](x)
            r = self.reg_convs[i](x)
            outs.append((self.reg_preds[i](r), self.obj_preds[i](r),
                         self.cls_preds[i](c)))
        return outs


class TorchYOLOX(nn.Module):
    def __init__(self, variant: str = "yolox-s", num_classes: int = 80):
        super().__init__()
        depth, width, depthwise = YOLOX_VARIANTS[variant]
        self.backbone = YOLOPAFPN(depth, width, depthwise)
        self.head = YOLOXHead(num_classes, width, depthwise)

    def forward(self, x):
        return self.head(self.backbone(x))


@torch.no_grad()
def decode_outputs_torch(level_outputs, strides=STRIDES):
    """Mirror of models/yolox.decode_outputs: xy=(pred+grid)*stride,
    wh=exp(pred)*stride, sigmoid obj/cls -> (N,A,4) xyxy, (N,A), (N,A,C)."""
    boxes_all, obj_all, cls_all = [], [], []
    for (reg, obj, cls), stride in zip(level_outputs, strides):
        n, _, h, w = reg.shape
        gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                                torch.arange(w, dtype=torch.float32),
                                indexing="ij")
        cx = (reg[:, 0] + gx) * stride
        cy = (reg[:, 1] + gy) * stride
        bw = torch.exp(reg[:, 2]) * stride
        bh = torch.exp(reg[:, 3]) * stride
        boxes = torch.stack([cx - bw / 2, cy - bh / 2,
                             cx + bw / 2, cy + bh / 2], dim=-1)
        boxes_all.append(boxes.reshape(n, h * w, 4))
        obj_all.append(torch.sigmoid(obj[:, 0]).reshape(n, h * w))
        cls_all.append(torch.sigmoid(cls).permute(0, 2, 3, 1).reshape(n, h * w, -1))
    return (torch.cat(boxes_all, 1), torch.cat(obj_all, 1),
            torch.cat(cls_all, 1))


def forward_numpy(model: TorchYOLOX, frames_f32_bgr: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(N,H,W,3) float32 BGR 0..255 -> decoded (boxes, obj, cls) numpy."""
    model.eval()
    with torch.no_grad():
        x = torch.from_numpy(np.transpose(frames_f32_bgr, (0, 3, 1, 2)))
        outs = model(x)
        boxes, obj, cls = decode_outputs_torch(outs)
    return boxes.numpy(), obj.numpy(), cls.numpy()
