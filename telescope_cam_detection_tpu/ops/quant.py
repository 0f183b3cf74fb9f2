"""Dynamic int8 (W8A8) quantized matmul for the MXU.

The v5e's systolic array runs int8 x int8 -> int32 at 2x its bf16 rate
(394 vs 197 peak TOP/s; measured through XLA `dot_general` with
`preferred_element_type=int32`: 276 TOP/s vs 153 TFLOP/s bf16 at
transformer-MLP shapes = 1.8x). For matmul-dominated models (the EVA02
Stage-2 classifier the reference wraps in species_classifier.py:235-353 is
~83% projection/MLP FLOPs) that is a direct serving speedup the reference's
torch/A30 stack gets only via TensorRT int8 calibration.

Scheme — the standard dynamic "row/column symmetric" W8A8:

  * weights: per-output-channel symmetric scales, quantized from the
    served checkpoint on the fly inside the jitted program (a single
    max-reduce + round over W, bandwidth-trivial next to the matmul
    itself). No calibration pass, no separate quantized checkpoint; weight
    hot-swaps keep working because quantization is a pure function of the
    dispatch-argument weights.
  * activations: per-token (per matmul row) symmetric scales computed at
    run time — per-token scaling absorbs the outlier tokens that break
    per-tensor static quantization on ViTs.
  * accumulation: int32 on the MXU; dequantize in the f32 epilogue
    (XLA fuses scale-multiply + bias into the matmul output).

Everything here is shape-polymorphic over leading batch dims and runs on
CPU for hermetic tests (XLA:CPU lowers int8 dot_general too, just without
the 2x).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def quantize_channels_int8(w: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of a (K, N) weight.

    Returns (w_q int8 (K, N), scales f32 (N,)) with
    w ~= w_q * scales (column-wise), |error| <= scales/2 elementwise.
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)
    scales = jnp.maximum(amax, _EPS) / 127.0
    w_q = jnp.clip(jnp.round(w32 / scales), -127, 127).astype(jnp.int8)
    return w_q, scales


def quantize_rows_int8(x: jnp.ndarray):
    """Symmetric per-row (per-token) int8 quantization of (..., K).

    Returns (x_q int8 (..., K), scales f32 (..., 1))."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scales = jnp.maximum(amax, _EPS) / 127.0
    x_q = jnp.clip(jnp.round(x32 / scales), -127, 127).astype(jnp.int8)
    return x_q, scales


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype=None) -> jnp.ndarray:
    """Quantize-and-multiply: float (..., K) @ float (K, N) via int8 MXU.

    Both operands are quantized dynamically (per-token rows, per-channel
    columns), multiplied int8 x int8 -> int32, and dequantized in f32.
    """
    x_q, s_x = quantize_rows_int8(x)
    w_q, s_w = quantize_channels_int8(w)
    acc = lax.dot_general(x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * s_w
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


class QuantDense(nn.Module):
    """Drop-in `nn.Dense` replacement computing through the int8 MXU path.

    The parameter tree (names, shapes, init, f32 param dtype) is identical
    to `nn.Dense`, so checkpoints, the torch converter (models/convert.py),
    and weight hot-swap move freely between quantized and unquantized
    builds of the same model — precision is a serving-time choice, exactly
    like `detection.precision: bf16`.
    """
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32  # output/compute dtype (matches nn.Dense)

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return int8_matmul(x, kernel, bias, out_dtype=self.dtype)
