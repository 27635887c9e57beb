"""Dynamic int8 quantized matmul for TPU training.

The round-1 roofline analysis (docs/PERFORMANCE.md) showed the training
step is BERT-GEMM-bound at ~78% of the chip's bf16 matmul ceiling — the
remaining single-chip headroom is precision, not scheduling. TPU MXUs
execute s8 x s8 -> s32 matmuls at 2x the bf16 rate, so quantizing the
four big dense GEMMs per BERT layer (QKV, attention output, FFN up/down
— 98% of layer FLOPs) halves the dominant cost.

Recipe (SwitchBack-style dynamic quantization, no calibration state):

- forward:  y = (q(x) @ q(w)) * sx * sw, with per-row scales for x
  (amax over the contraction axis) and per-column scales for w.
- backward, straight-through wrt quantization (the rounding error is
  treated as noise, standard for quantization-aware training):
    dx = g @ w.T    -- full precision by default ('int8'): the gradient
                       *direction* entering earlier layers is the
                       accuracy-critical quantity;
    dw = x.T @ g    -- int8 (per-example quantization noise averages out
                       over the batch in the weight-gradient sum).
  mode 'int8_all' also runs dx in int8 (fastest, more noise);
  mode 'int8_fwd' keeps the whole backward in bf16 (most conservative).

`QuantDense` is a drop-in for `nn.Dense`: identical parameter
names/shapes/init, so checkpoints and the name-based optimizer partition
(train/optim.py) are unchanged and the mode can be flipped between runs
of the same task.

Kernel routing: by default the s8 x s8 contraction goes through XLA
`dot_general` (measured at only ~1.0-1.1x the bf16 rate on the v5e at
BERT shapes — see docs/PERFORMANCE.md). Set MIMRL_INT8_PALLAS=1 to route
shapes the hand-tiled Mosaic kernel supports through
`ops/pallas/int8_matmul.py` (fused dequant epilogue, no s32 HBM
round-trip); `tools/microbench_gemm.py` measures both paths.

No reference counterpart (the reference trains f32 throughout); this is
TPU-native perf work toward the >=10x BASELINE.md north star.
"""

from __future__ import annotations

import functools
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

MODES = ("none", "int8_fwd", "int8", "int8_all")


def _quantize(x: Array, axis: int):
    """Symmetric int8 quantization with a dynamic scale over `axis`
    (the contraction axis). Returns (q, scale) with x ~= q * scale."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = (jnp.maximum(amax, 1e-8) / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _use_pallas() -> bool:
    """Trace-time knob: route supported int8 GEMMs through the Mosaic
    kernel (ops/pallas/int8_matmul.py) instead of XLA dot_general."""
    return os.environ.get("MIMRL_INT8_PALLAS", "0") == "1"


def _int8_matmul(x: Array, w: Array, out_dtype) -> Array:
    """x [..., K] @ w [K, N] through the int8 MXU path.
    Per-row scales for x, per-column scales for w."""
    qx, sx = _quantize(x, axis=-1)          # sx [..., 1]
    qw, sw = _quantize(w, axis=0)           # sw [1, N]
    if _use_pallas():
        from mimrl_tpu.ops.pallas.int8_matmul import int8_matmul, supports

        lead = qx.shape[:-1]
        m = 1
        for d in lead:
            m *= d
        k, n = qw.shape
        if supports(m, k, n):
            out = int8_matmul(qx.reshape(m, k), qw,
                              sx.reshape(m, 1), sw.reshape(1, n),
                              out_dtype=out_dtype)
            return out.reshape(*lead, n)
    acc = jax.lax.dot_general(
        qx, qw, (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * sw).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_dot(x: Array, w: Array, mode: str = "int8",
             out_dtype: Any = jnp.float32) -> Array:
    """Quantized x @ w with straight-through gradients (see module doc).
    x: [..., K], w: [K, N]."""
    return _int8_matmul(x, w, out_dtype)


def _int8_dot_fwd(x, w, mode, out_dtype):
    return _int8_matmul(x, w, out_dtype), (x, w)


def _int8_dot_bwd(mode, out_dtype, res, g):
    x, w = res
    gd = g.astype(x.dtype)
    if mode == "int8_all":
        # dx = g @ w.T, both quantized (contraction axis: N)
        dx = _int8_matmul(gd, w.T, x.dtype)
    else:
        dx = jnp.einsum("...n,kn->...k", gd, w).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = gd.reshape(-1, gd.shape[-1])
    if mode in ("int8", "int8_all"):
        # dw = x.T @ g, both quantized (contraction axis: batch rows)
        dw = _int8_matmul(x2.T, g2, w.dtype)
    else:  # int8_fwd: full-precision backward
        dw = (x2.T @ g2).astype(w.dtype)
    return dx, dw


int8_dot.defvjp(_int8_dot_fwd, _int8_dot_bwd)


class QuantDense(nn.Module):
    """nn.Dense drop-in with int8 MXU matmuls. Same param names/shapes/
    init as nn.Dense, so swapping it in/out preserves checkpoints and
    the name-based optimizer partition."""

    features: int
    mode: str = "int8"
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        y = int8_dot(x, kernel, self.mode, self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def make_dense(quant_mode: str, features: int, dtype: Any, name: str,
               use_bias: bool = True):
    """Dense-layer factory: nn.Dense for mode 'none', QuantDense
    otherwise (identical param tree either way)."""
    assert quant_mode in MODES, quant_mode
    if quant_mode == "none":
        return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    return QuantDense(features, mode=quant_mode, use_bias=use_bias,
                      dtype=dtype, name=name)
