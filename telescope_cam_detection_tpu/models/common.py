"""Shared Flax building blocks for the detector/classifier model families.

NHWC layout throughout (XLA TPU's native conv layout); BatchNorm runs with
moving statistics at inference. Parameters can be held in bfloat16 with fp32
BN statistics; matmul/conv accumulation is fp32 via preferred_element_type.

The module `dtype` field additionally accepts the string sentinel ``"int8"``
(INT8): convolutions then run W8A8 on the MXU — weights quantized per output
channel, activations per tensor with a dynamic scale, int8xint8->int32
accumulation — while BatchNorm, activations and the tensor plumbing stay in
float. Inference-only (round() has no gradient); the same float checkpoint
serves any precision because quantization happens at dispatch, exactly like
the classifier's W8A8 path (ops/quant.py).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# dtype sentinel: W8A8 quantized convs (see module docstring)
INT8 = "int8"


def compute_dtype(dtype: Any):
    """The float dtype tensors travel in for a given module dtype.

    int8 convs still hand float tensors between blocks (BN/activations and
    the head predictions are float); everything else passes through.
    """
    return jnp.bfloat16 if dtype == INT8 else dtype


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.silu(x)


ACTIVATIONS: dict = {
    "silu": nn.silu,
    "relu": nn.relu,
    "gelu": nn.gelu,
    "lrelu": lambda x: nn.leaky_relu(x, 0.1),
    "identity": lambda x: x,
}


class QuantConv2D(nn.Module):
    """W8A8 int8 convolution for the TPU MXU (v5e: 2x the bf16 peak).

    Drop-in for nn.Conv at inference: the kernel parameter keeps nn.Conv's
    name/shape/init ("kernel", HWIO, lecun-normal) so float checkpoints load
    unchanged. Each call quantizes the float kernel per OUTPUT CHANNEL
    (max-abs/127 — negligible next to the conv itself and always in sync
    with weight hot-swaps) and the activation per tensor with a dynamic
    scale, convolves int8xint8 with int32 accumulation, and rescales to
    float. Grouped/depthwise convs fall back to float compute — their FLOPs
    are negligible and XLA's int8 grouped-conv support is not guaranteed.
    """
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    feature_group_count: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1] // self.feature_group_count
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        dn = ("NHWC", "HWIO", "NHWC")
        if self.feature_group_count > 1:
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                self.strides, self.padding, dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.float32)
        else:
            xf = x.astype(jnp.float32)
            s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6) / 127.0
            xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
            s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)),
                              1e-12) / 127.0
            wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, wq, self.strides, self.padding, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (s_x * s_w)
        if bias is not None:
            y = y + bias
        return y


class ConvBnAct(nn.Module):
    """Conv2D + BatchNorm + activation, the basic detector block."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        if self.dtype == INT8:
            x = QuantConv2D(
                self.features,
                kernel_size=(self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                feature_group_count=self.groups,
                use_bias=not self.use_bn,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                feature_group_count=self.groups,
                use_bias=not self.use_bn,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97, epsilon=1e-3,
                dtype=jnp.float32, name="bn",
            )(x)
        return ACTIVATIONS[self.act](x)


class DWConvBlock(nn.Module):
    """Depthwise-separable conv (YOLOX-nano uses these)."""
    features: int
    kernel: int = 3
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = ConvBnAct(in_ch, self.kernel, self.stride, groups=in_ch,
                      act=self.act, dtype=self.dtype, name="dconv")(x, train)
        x = ConvBnAct(self.features, 1, 1, act=self.act, dtype=self.dtype,
                      name="pconv")(x, train)
        return x


class Bottleneck(nn.Module):
    """1x1 -> 3x3 with optional residual."""
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, 1, 1, act=self.act, dtype=self.dtype,
                      name="conv1")(x, train)
        block = DWConvBlock if self.depthwise else ConvBnAct
        y = block(self.features, 3, 1, act=self.act, dtype=self.dtype,
                  name="conv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """Cross-stage-partial layer: split -> n bottlenecks -> concat -> fuse."""
    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expansion)
        a = ConvBnAct(hidden, 1, 1, act=self.act, dtype=self.dtype,
                      name="conv1")(x, train)
        b = ConvBnAct(hidden, 1, 1, act=self.act, dtype=self.dtype,
                      name="conv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(hidden, self.shortcut, 1.0, self.depthwise,
                           self.act, self.dtype, name=f"m{i}")(a, train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBnAct(self.features, 1, 1, act=self.act, dtype=self.dtype,
                         name="conv3")(y, train)


class Focus(nn.Module):
    """Space-to-depth stem: (H,W,C) -> (H/2,W/2,4C) -> conv."""
    features: int
    kernel: int = 3
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        tl = x[:, 0::2, 0::2, :]
        bl = x[:, 1::2, 0::2, :]
        tr = x[:, 0::2, 1::2, :]
        br = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvBnAct(self.features, self.kernel, 1, act=self.act,
                         dtype=self.dtype, name="conv")(x, train)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling with parallel max-pools."""
    features: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, 1, act=self.act, dtype=self.dtype,
                      name="conv1")(x, train)
        pools = [x]
        for ks in self.kernel_sizes:
            pad = ks // 2
            pools.append(nn.max_pool(
                x, window_shape=(ks, ks), strides=(1, 1),
                padding=((pad, pad), (pad, pad))))
        x = jnp.concatenate(pools, axis=-1)
        return ConvBnAct(self.features, 1, 1, act=self.act, dtype=self.dtype,
                         name="conv2")(x, train)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (PAFPN top-down path)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
