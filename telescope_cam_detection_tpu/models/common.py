"""Shared Flax building blocks for the detector/classifier model families.

NHWC layout throughout (XLA TPU's native conv layout); BatchNorm runs with
moving statistics at inference. Parameters can be held in bfloat16 with fp32
BN statistics; matmul/conv accumulation is fp32 via preferred_element_type.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.silu(x)


ACTIVATIONS: dict = {
    "silu": nn.silu,
    "relu": nn.relu,
    "gelu": nn.gelu,
    "lrelu": lambda x: nn.leaky_relu(x, 0.1),
    "identity": lambda x: x,
}


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
