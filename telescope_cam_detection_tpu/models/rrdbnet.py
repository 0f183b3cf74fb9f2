"""RRDBNet 4x super-resolution (Real-ESRGAN generator) in Flax.

Counterpart of the reference's realesrgan/RRDBNet dependency
(image_enhancement.py:106-144): Residual-in-Residual Dense Blocks with
pixel-shuffle-free nearest+conv upsampling, used to 4x-upscale small wildlife
crops before Stage-2 classification. NHWC; params convert from the official
RealESRGAN_x4plus checkpoint naming via models/convert.py.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DenseBlock(nn.Module):
    """5-conv dense block with 0.2-scaled residual."""
    features: int = 64
    growth: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        c1 = lrelu(nn.Conv(self.growth, (3, 3), dtype=self.dtype,
                           name="conv1")(x))
        c2 = lrelu(nn.Conv(self.growth, (3, 3), dtype=self.dtype,
                           name="conv2")(jnp.concatenate([x, c1], -1)))
        c3 = lrelu(nn.Conv(self.growth, (3, 3), dtype=self.dtype,
                           name="conv3")(jnp.concatenate([x, c1, c2], -1)))
        c4 = lrelu(nn.Conv(self.growth, (3, 3), dtype=self.dtype,
                           name="conv4")(jnp.concatenate([x, c1, c2, c3], -1)))
        c5 = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                     name="conv5")(jnp.concatenate([x, c1, c2, c3, c4], -1))
        return x + 0.2 * c5


class RRDB(nn.Module):
    features: int = 64
    growth: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = DenseBlock(self.features, self.growth, self.dtype, name="rdb1")(x)
        y = DenseBlock(self.features, self.growth, self.dtype, name="rdb2")(y)
        y = DenseBlock(self.features, self.growth, self.dtype, name="rdb3")(y)
        return x + 0.2 * y


def _upsample2x_nearest(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class RRDBNet(nn.Module):
    """x4 generator: conv -> n_blocks RRDB -> trunk conv -> 2x(nearest+conv)
    -> HR convs."""
    features: int = 64
    growth: int = 32
    n_blocks: int = 23
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, 3) float RGB 0..1 -> (N, 4H, 4W, 3)."""
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        feat = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                       name="conv_first")(images)
        trunk = feat
        for i in range(self.n_blocks):
            trunk = RRDB(self.features, self.growth, self.dtype,
                         name=f"body{i}")(trunk)
        trunk = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                        name="conv_body")(trunk)
        feat = feat + trunk
        feat = lrelu(nn.Conv(self.features, (3, 3), dtype=self.dtype,
                             name="conv_up1")(_upsample2x_nearest(feat)))
        feat = lrelu(nn.Conv(self.features, (3, 3), dtype=self.dtype,
                             name="conv_up2")(_upsample2x_nearest(feat)))
        feat = lrelu(nn.Conv(self.features, (3, 3), dtype=self.dtype,
                             name="conv_hr")(feat))
        return nn.Conv(3, (3, 3), dtype=jnp.float32, name="conv_last")(feat)
