"""Pallas int8 matmul kernel for TPU.

Why this exists: XLA's `dot_general(s8, s8) -> s32` on the v5e was
measured at ~1.0-1.1x the bf16 GEMM rate at BERT shapes (docs/
PERFORMANCE.md) — nowhere near the 2x MXU-peak ratio the datasheet
promises — which made the int8 training path (`ops/quant.py`) a net
loss end-to-end. This kernel checks whether a hand-tiled Mosaic matmul
can reach the native int8 MXU rate; `ops/quant.py` routes through it
when `use_pallas=True` and it wins on the measured hardware.

Design: grid over (M/bm, N/bn), full-K tiles (K in the canonical BERT
GEMMs is 768 or 3072 — an int8 [bm, K] tile at bm=512, K=3072 is 1.5 MB,
comfortably inside the ~16 MB VMEM budget with double buffering). The
scale application (per-row sx, per-column sw) is fused into the kernel
epilogue so the int32 accumulator never round-trips HBM: the output is
written directly in the compute dtype.

No reference counterpart (the reference trains f32 torch,
/root/reference/Solver.py); TPU-native perf work toward the >=10x
BASELINE.md north star.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _matmul_kernel(a_ref, b_ref, sa_ref, sb_ref, o_ref):
    """One (bm, bn) output tile: s8 x s8 -> s32 on the MXU, then the
    dequantization epilogue (row scales x col scales) on the VPU."""
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * sa_ref[:] * sb_ref[:]).astype(
        o_ref.dtype)


def _pick_block(dim: int, want: int, floor: int) -> int:
    """Largest power-of-two tile <= `want` that divides `dim`
    (>= `floor`, the Mosaic int8 minimum for that axis), else 0."""
    b = want
    while b >= floor:
        if dim % b == 0:
            return b
        b //= 2
    return 0


def supports(m: int, k: int, n: int) -> bool:
    """Whether (m, k) x (k, n) maps onto the kernel's tiling: int8
    native tiles are (32, 128), so M needs a 32-multiple tile, N and K
    128-multiples."""
    return (_pick_block(m, 512, 32) > 0 and _pick_block(n, 512, 128) > 0
            and k % 128 == 0)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret"))
def int8_matmul(a: jax.Array, b: jax.Array, sa: jax.Array, sb: jax.Array,
                block_m: int = 512, block_n: int = 512,
                out_dtype=jnp.bfloat16, interpret: bool = False):
    """(a_s8 [M, K] @ b_s8 [K, N]) * sa [M, 1] * sb [1, N] -> [M, N].

    block_m/block_n are upper bounds; the actual tile is the largest
    power-of-two divisor of M/N below them (BERT GEMMs: M = bs*time_len,
    N in {768, 2304, 3072} -> 512 or 256 tiles).
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    block_m = _pick_block(m, min(block_m, m), 1)
    block_n = _pick_block(n, min(block_n, n), 1)
    assert block_m and block_n, (m, n)
    grid = (m // block_m, n // block_n)
    return pl.pallas_call(
        _matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(a, b, sa.astype(jnp.float32), sb.astype(jnp.float32))
