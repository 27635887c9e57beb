"""Fused multi-head attention kernel (scores never leave VMEM).

Why this kernel exists: at MIMRL's canonical shapes (bs=128, heads=12,
T=100, head_dim=64 — ref: the BERT tower of Model.py:430-437 at
``--time_len 100``) the attention FLOPs are negligible (<0.5 ms/step)
but the XLA lowering materializes the float32 score tensor
``[bs, 12, 100, 100]`` to HBM three times per layer (scores, softmax,
dropped probs) plus the dropout mask — measured at 9.9 ms forward /
23.8 ms fwd+bwd across the 12 layers, ~26% of the whole train step.
This kernel computes QK^T -> bias -> softmax -> dropout -> @V for a
whole batch row (all heads) in one VMEM-resident program:

    HBM traffic per layer = read q,k,v + write out  (the [T, T] scores,
    probs and dropout mask live only in VMEM)

Dropout uses the per-core TPU PRNG (`pltpu.prng_*`): the mask is a pure
function of (seed, batch row), so the backward kernel REGENERATES it
instead of storing it — residuals are just (q, k, v). The backward
recomputes softmax the same way and emits dq, dk, dv in one program per
batch row (flash-attention backward algebra).

Semantics parity: identical math to the XLA path in
`models/bert.py::BertSelfAttention` (f32 scores/softmax, bf16 matmul
inputs, inverted-dropout scaling). The mask STREAM differs from flax's
`nn.Dropout` (TPU hardware PRNG vs threefry) — same keep probability,
different bits — which only matters for bit-reproducing a specific
threefry run; the solver's dropout already defaults to the hardware RNG
(`--rng_impl rbg`) for the same reason.

Equality with the XLA path (deterministic mode, fwd + grads) is tested
in interpret mode on CPU (tests/test_flash_attention.py) and the solver
convergence suite covers the training path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _variant() -> str:
    """Kernel strategy (resolved at trace time; see tools/fa_tune.py):

    - ``row``     one program per batch row, Python loop over heads
                  (12 sequential [T, hd] x [hd, T] dots per program)
    - ``batched`` one program per R batch rows (``MIMRL_FA_ROWS``),
                  ONE dot_general with (R, nh) batch dims — gives
                  Mosaic a single large batched contraction to
                  pipeline instead of 12 serial small ones
    - ``bh``      grid (bs, nh): one program per (row, head) — max
                  grid parallelism, smallest VMEM footprint

    All variants compute identical math; the dropout BIT STREAMS
    differ between variants (each is self-consistent fwd/bwd).

    Default 'batched' (R=1): measured fastest at both reference
    operating points (docs/FA_TUNE_avec.json: fwd+bwd dropout-on
    2.26 ms vs row 2.90 vs bh 4.14 vs XLA-rbg 4.67 at
    [128, 12, 150, 64]).
    """
    v = os.environ.get("MIMRL_FA_VARIANT", "batched")
    if v not in ("row", "batched", "bh"):
        raise ValueError(f"MIMRL_FA_VARIANT={v!r} (want row|batched|bh)")
    return v


def _rows_per_program(bs: int) -> int:
    r = int(os.environ.get("MIMRL_FA_ROWS", "1"))
    while r > 1 and bs % r:
        r //= 2
    return max(r, 1)


def _hash_bits(seed: Array, tag: int, shape) -> Array:
    """Stateless uint32 bits for interpret mode (pltpu.prng_* has no CPU
    lowering): a murmur3-style finalizer over (seed, tag, position).
    Statistically fine for dropout; the TPU path uses the hardware PRNG."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 2)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    x = (r * jnp.uint32(0x9E3779B1) ^ c * jnp.uint32(0x85EBCA77)
         ^ (seed.astype(jnp.uint32) + jnp.uint32(tag) * jnp.uint32(0xC2B2AE35)))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _dropout_bits(seed_scalar, h: int, shape, hw: bool) -> Array:
    if hw:
        return pltpu.prng_random_bits(shape)
    return _hash_bits(seed_scalar, h + 1, shape)


def _hash_bits_nd(seed: Array, shape) -> Array:
    """Interpret-mode bits for >2-D shapes: mix EVERY axis position into
    the hash (the 2-D helper only mixes the trailing two, which would
    repeat the mask across leading batch/head dims)."""
    mults = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE35, 0x27D4EB2F,
             0x165667B1, 0xD3A2646C)
    x = jnp.broadcast_to(seed.astype(jnp.uint32), shape)
    for d in range(len(shape)):
        i = jax.lax.broadcasted_iota(jnp.uint32, shape, d)
        x = x ^ (i + jnp.uint32(1)) * jnp.uint32(mults[d % len(mults)])
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _dropout_bits_nd(seed_scalar, shape, hw: bool) -> Array:
    if hw:
        return pltpu.prng_random_bits(shape)
    return _hash_bits_nd(seed_scalar, shape)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                dropout_p: float, scale: float, hw_prng: bool):
    """One program = one batch row: q/k/v [1, nh, T, hd]; bias [1, 1, 1, T]."""
    b = pl.program_id(0)
    nh, T = q_ref.shape[1], q_ref.shape[2]
    row_seed = seed_ref[0] + b
    if dropout_p > 0.0 and hw_prng:
        pltpu.prng_seed(row_seed)
    bias_row = bias_ref[0, 0]  # [1, T] f32

    for h in range(nh):
        q = q_ref[0, h]  # [T, hd] bf16
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [T, T]
        s = s * scale + bias_row  # broadcast [1,T] over rows
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if dropout_p > 0.0:
            bits = _dropout_bits(row_seed, h, (T, T), hw_prng)
            keep = bits > jnp.uint32(dropout_p * 4294967296.0)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [T, hd]
        out_ref[0, h] = o.astype(out_ref.dtype)


def _fwd_kernel_batched(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                        dropout_p: float, scale: float, hw_prng: bool):
    """One program = R batch rows, ALL heads as dot_general batch dims:
    q/k/v [R, nh, T, hd]; bias [R, 1, 1, T]."""
    g = pl.program_id(0)
    R, nh, T, hd = q_ref.shape
    B = R * nh  # Mosaic's tpu.matmul supports ONE batch dim — merge
    seed = seed_ref[0] + g
    if dropout_p > 0.0 and hw_prng:
        pltpu.prng_seed(seed)
    q = q_ref[...].reshape(B, T, hd)
    k = k_ref[...].reshape(B, T, hd)
    v = v_ref[...].reshape(B, T, hd)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [B, T, T]
    # bias: one [T] key-bias vector per batch row, repeated per head
    bias_b = jnp.broadcast_to(
        bias_ref[:, 0, 0, :][:, None, :], (R, nh, T)).reshape(B, 1, T)
    s = s * scale + bias_b
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_p > 0.0:
        bits = _dropout_bits_nd(seed, (B, T, T), hw_prng)
        keep = bits > jnp.uint32(dropout_p * 4294967296.0)
        p = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
    o = jax.lax.dot_general(
        p.astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [B, T, hd]
    out_ref[...] = o.reshape(R, nh, T, hd).astype(out_ref.dtype)


def _fwd_kernel_bh(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                   dropout_p: float, scale: float, hw_prng: bool, nh: int):
    """One program = one (batch row, head): q/k/v [1, 1, T, hd]."""
    b, h = pl.program_id(0), pl.program_id(1)
    T = q_ref.shape[2]
    seed = seed_ref[0] + b * nh + h
    if dropout_p > 0.0 and hw_prng:
        pltpu.prng_seed(seed)
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * scale + bias_ref[0, 0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_p > 0.0:
        bits = _dropout_bits_nd(seed, (T, T), hw_prng)
        keep = bits > jnp.uint32(dropout_p * 4294967296.0)
        p = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
    o = jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = o.astype(out_ref.dtype)


def _fwd_call(q, k, v, bias, seed, dropout_p: float):
    bs, nh, T, hd = q.shape
    scale = 1.0 / (hd ** 0.5)
    variant = _variant()
    hw = not _interpret()

    if variant == "batched":
        R = _rows_per_program(bs)
        kern = functools.partial(_fwd_kernel_batched, dropout_p=dropout_p,
                                 scale=scale, hw_prng=hw)
        qkv_spec = pl.BlockSpec((R, nh, T, hd), lambda g, _s: (g, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bs // R,),
                in_specs=[
                    qkv_spec, qkv_spec, qkv_spec,
                    pl.BlockSpec((R, 1, 1, T), lambda g, _s: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=qkv_spec,
            ),
            out_shape=jax.ShapeDtypeStruct((bs, nh, T, hd), q.dtype),
            interpret=_interpret(),
        )(seed, q, k, v, bias)

    if variant == "bh":
        kern = functools.partial(_fwd_kernel_bh, dropout_p=dropout_p,
                                 scale=scale, hw_prng=hw, nh=nh)
        qkv_spec = pl.BlockSpec((1, 1, T, hd), lambda b, h, _s: (b, h, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bs, nh),
                in_specs=[
                    qkv_spec, qkv_spec, qkv_spec,
                    pl.BlockSpec((1, 1, 1, T), lambda b, h, _s: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=qkv_spec,
            ),
            out_shape=jax.ShapeDtypeStruct((bs, nh, T, hd), q.dtype),
            interpret=_interpret(),
        )(seed, q, k, v, bias)

    kern = functools.partial(_fwd_kernel, dropout_p=dropout_p, scale=scale,
                             hw_prng=hw)
    grid = (bs,)
    qkv_spec = pl.BlockSpec((1, nh, T, hd), lambda b, _s: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                qkv_spec, qkv_spec, qkv_spec,
                pl.BlockSpec((1, 1, 1, T), lambda b, _s: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nh, T, hd), lambda b, _s: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((bs, nh, T, hd), q.dtype),
        interpret=_interpret(),
    )(seed, q, k, v, bias)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, dropout_p: float, scale: float,
                hw_prng: bool):
    b = pl.program_id(0)
    nh, T = q_ref.shape[1], q_ref.shape[2]
    row_seed = seed_ref[0] + b
    if dropout_p > 0.0 and hw_prng:
        # same seed stream as the forward -> identical masks per head
        pltpu.prng_seed(row_seed)
    bias_row = bias_ref[0, 0]

    for h in range(nh):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h].astype(jnp.float32)  # [T, hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * scale + bias_row
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [T, T] f32
        if dropout_p > 0.0:
            bits = _dropout_bits(row_seed, h, (T, T), hw_prng)
            keep = bits > jnp.uint32(dropout_p * 4294967296.0)
            inv = 1.0 / (1.0 - dropout_p)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            pd = p
        # dV = Pd^T @ dO   (contract over query rows)
        dv = jax.lax.dot_general(
            pd.astype(q.dtype), do.astype(q.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dPd = dO @ V^T
        dpd = jax.lax.dot_general(
            do.astype(q.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [T, T]
        if dropout_p > 0.0:
            dp = jnp.where(keep, dpd * inv, 0.0)
        else:
            dp = dpd
        # dS = P * (dP - rowsum(dP * P))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _bwd_kernel_batched(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, *, dropout_p: float,
                        scale: float, hw_prng: bool):
    g = pl.program_id(0)
    R, nh, T, hd = q_ref.shape
    B = R * nh  # single merged batch dim (Mosaic tpu.matmul limit)
    seed = seed_ref[0] + g
    if dropout_p > 0.0 and hw_prng:
        pltpu.prng_seed(seed)
    q = q_ref[...].reshape(B, T, hd)
    k = k_ref[...].reshape(B, T, hd)
    v = v_ref[...].reshape(B, T, hd)
    do = do_ref[...].reshape(B, T, hd).astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    bias_b = jnp.broadcast_to(
        bias_ref[:, 0, 0, :][:, None, :], (R, nh, T)).reshape(B, 1, T)
    s = s * scale + bias_b
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [B, T, T] f32
    if dropout_p > 0.0:
        bits = _dropout_bits_nd(seed, (B, T, T), hw_prng)
        keep = bits > jnp.uint32(dropout_p * 4294967296.0)
        inv = 1.0 / (1.0 - dropout_p)
        pd = jnp.where(keep, p * inv, 0.0)
    else:
        pd = p
    # dV = Pd^T @ dO  (contract over query rows)
    dv = jax.lax.dot_general(
        pd.astype(q.dtype), do.astype(q.dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # dPd = dO @ V^T
    dpd = jax.lax.dot_general(
        do.astype(q.dtype), v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if dropout_p > 0.0:
        dp = jnp.where(keep, dpd * inv, 0.0)
    else:
        dp = dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dq_ref[...] = dq.reshape(R, nh, T, hd).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(R, nh, T, hd).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(R, nh, T, hd).astype(dv_ref.dtype)


def _bwd_kernel_bh(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, *, dropout_p: float,
                   scale: float, hw_prng: bool, nh: int):
    b, h = pl.program_id(0), pl.program_id(1)
    T = q_ref.shape[2]
    seed = seed_ref[0] + b * nh + h
    if dropout_p > 0.0 and hw_prng:
        pltpu.prng_seed(seed)
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * scale + bias_ref[0, 0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_p > 0.0:
        bits = _dropout_bits_nd(seed, (T, T), hw_prng)
        keep = bits > jnp.uint32(dropout_p * 4294967296.0)
        inv = 1.0 / (1.0 - dropout_p)
        pd = jnp.where(keep, p * inv, 0.0)
    else:
        pd = p
    dv = jax.lax.dot_general(
        pd.astype(q.dtype), do.astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpd = jax.lax.dot_general(
        do.astype(q.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout_p > 0.0:
        dp = jnp.where(keep, dpd * inv, 0.0)
    else:
        dp = dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)
    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd_call(q, k, v, bias, seed, do, dropout_p: float):
    bs, nh, T, hd = q.shape
    scale = 1.0 / (hd ** 0.5)
    variant = _variant()
    hw = not _interpret()
    shp = jax.ShapeDtypeStruct((bs, nh, T, hd), q.dtype)

    if variant == "batched":
        R = _rows_per_program(bs)
        kern = functools.partial(_bwd_kernel_batched, dropout_p=dropout_p,
                                 scale=scale, hw_prng=hw)
        qkv_spec = pl.BlockSpec((R, nh, T, hd), lambda g, _s: (g, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bs // R,),
                in_specs=[
                    qkv_spec, qkv_spec, qkv_spec,
                    pl.BlockSpec((R, 1, 1, T), lambda g, _s: (g, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    qkv_spec,
                ],
                out_specs=(qkv_spec, qkv_spec, qkv_spec),
            ),
            out_shape=(shp, shp, shp),
            interpret=_interpret(),
        )(seed, q, k, v, bias, do)

    if variant == "bh":
        kern = functools.partial(_bwd_kernel_bh, dropout_p=dropout_p,
                                 scale=scale, hw_prng=hw, nh=nh)
        qkv_spec = pl.BlockSpec((1, 1, T, hd), lambda b, h, _s: (b, h, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bs, nh),
                in_specs=[
                    qkv_spec, qkv_spec, qkv_spec,
                    pl.BlockSpec((1, 1, 1, T), lambda b, h, _s: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    qkv_spec,
                ],
                out_specs=(qkv_spec, qkv_spec, qkv_spec),
            ),
            out_shape=(shp, shp, shp),
            interpret=_interpret(),
        )(seed, q, k, v, bias, do)

    kern = functools.partial(_bwd_kernel, dropout_p=dropout_p, scale=scale,
                             hw_prng=hw)
    qkv_spec = pl.BlockSpec((1, nh, T, hd), lambda b, _s: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bs,),
            in_specs=[
                qkv_spec, qkv_spec, qkv_spec,
                pl.BlockSpec((1, 1, 1, T), lambda b, _s: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                qkv_spec,
            ],
            out_specs=(qkv_spec, qkv_spec, qkv_spec),
        ),
        out_shape=(shp, shp, shp),
        interpret=_interpret(),
    )(seed, q, k, v, bias, do)


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attention(q: Array, k: Array, v: Array, bias: Array, seed: Array,
                    dropout_p: float = 0.0) -> Array:
    """Fused attention: softmax(q @ k^T * hd^-0.5 + bias) [dropout] @ v.

    q, k, v: [bs, nh, T, hd] (bf16 or f32). bias: [bs, 1, 1, T] f32
    additive key bias (0 valid / -1e9 padding). seed: [1] int32 — dropout
    PRNG seed; ignored when dropout_p == 0. Scores and softmax run in
    f32 and never touch HBM.
    """
    return _fwd_call(q, k, v, bias, seed, dropout_p)


def _fa_fwd(q, k, v, bias, seed, dropout_p):
    return _fwd_call(q, k, v, bias, seed, dropout_p), (q, k, v, bias, seed)


def _fa_bwd(dropout_p, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv = _bwd_call(q, k, v, bias, seed, g.astype(q.dtype), dropout_p)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias), jnp.zeros_like(seed))


flash_attention.defvjp(_fa_fwd, _fa_bwd)
