"""Fused Pallas kernel for the CubeMLP axis-MLP.

The axis-MLP is two chained contractions over one axis of a
``[bs, L, K, D]`` tensor with a bias+activation in between
(ref: MLPProcess.py:9-21). Compiled naively, the hidden tensor
``[bs, *, K, D]`` round-trips through HBM between the two matmuls; this
kernel runs both contractions per batch tile entirely in VMEM:

    load x-tile  ->  h = act(x ×_axis w1 + b1)  ->  y = h ×_axis w2 + b2
    (one HBM read of x, one HBM write of y; h never leaves VMEM)

The contraction uses `jax.lax.dot_general` inside the kernel, so the MXU
does the work; the activation runs on the VPU in the matmul epilogue.

Used behind `--use_pallas` (MimrlConfig.use_pallas); the einsum path in
`mimrl_tpu.models.cubemlp.AxisMLP` stays the reference implementation and
the two are equality-tested in interpret mode (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mimrl_tpu.utils.activations import get_activation_fn

Array = jax.Array


def _kernel_activation(name: str):
    """Pallas-TPU-safe activation: exact (erf) gelu has no Mosaic
    lowering, so kernels use the tanh approximation (max abs deviation
    ~1e-3 over [-6, 6]); everything else matches the registry."""
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=True)
    return get_activation_fn(name)


def _pick_batch_tile(bs: int, l: int, k: int, d: int, h: int,
                     vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest power-of-two batch tile whose x+h+y footprint fits VMEM."""
    bytes_per_sample = 4 * k * d * (l + h + l)  # x + hidden + y (f32)
    tile = 1
    while tile * 2 <= bs and bs % (tile * 2) == 0 \
            and (tile * 2) * bytes_per_sample <= vmem_budget:
        tile *= 2
    return tile


def _kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, out_ref, *, axis: int,
            activate: str, use_bias: bool):
    """Fused 2-matmul axis MLP on one batch tile.

    Two formulations:
    - axis == 3 (channel mix, the FLOP-dominant case): the tile is
      viewed as a 2-D ``[TB*L*K, D]`` matrix and both contractions are
      plain MXU matmuls — the Mosaic-friendly layout (last dim on
      lanes, rows on sublanes).
    - axis in (1, 2): dot_general over the 4-D view (used by interpret
      mode / backends that lower it; the TPU module path routes these
      axes to the XLA einsum instead — see AxisMLP).
    """
    x = x_ref[:]  # [TB, L, K, D]
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    act = _kernel_activation(activate)

    if axis == 3:
        TB, L, K, D = x.shape
        x2 = x.reshape(TB * L * K, D)
        h = jnp.dot(x2, w1, preferred_element_type=jnp.float32)
        if use_bias:
            h = h + b1_ref[:][None, :]
        h = act(h)
        y = jnp.dot(h, w2, preferred_element_type=jnp.float32)
        if use_bias:
            y = y + b2_ref[:][None, :]
        out_ref[:] = y.reshape(TB, L, K, w2.shape[1])
        return

    # generic axis contraction (interpret mode / non-TPU backends)
    def mix(t, w):
        nd = t.ndim
        out = jax.lax.dot_general(
            t, w,
            dimension_numbers=(((axis,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [..., axis_out] with `axis` removed
        return jnp.moveaxis(out, nd - 1, axis)

    def bias(b, like):
        shape = [1] * like.ndim
        shape[axis] = b.shape[0]
        return b.reshape(shape)

    h = mix(x, w1)
    if use_bias:
        h = h + bias(b1_ref[:], h)
    h = act(h)
    y = mix(h, w2)
    if use_bias:
        y = y + bias(b2_ref[:], y)
    out_ref[:] = y


def _run_fused(
    x: Array,
    w1: Array,
    w2: Array,
    b1: Array | None,
    b2: Array | None,
    axis: int,
    activate: str,
    interpret: bool = False,
) -> Array:
    """Fused 2-matmul axis MLP. x: [bs, L, K, D]; axis in {1, 2, 3};
    w1: [d_in, d_hidden]; w2: [d_hidden, d_out]."""
    bs, L, K, D = x.shape
    d_hidden = w1.shape[1]
    d_out = w2.shape[1]
    out_shape = list(x.shape)
    out_shape[axis] = d_out

    use_bias = b1 is not None
    if not use_bias:
        b1 = jnp.zeros((d_hidden,), x.dtype)
        b2 = jnp.zeros((d_out,), x.dtype)

    h_max = max(d_hidden, out_shape[axis])
    tb = _pick_batch_tile(bs, L, K, D, h_max)
    grid = (bs // tb,)

    def idx_x(i):
        return (i, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((tb, L, K, D), idx_x),
        pl.BlockSpec(w1.shape, lambda i: (0,) * w1.ndim),
        pl.BlockSpec(w2.shape, lambda i: (0,) * w2.ndim),
        pl.BlockSpec(b1.shape, lambda i: (0,)),
        pl.BlockSpec(b2.shape, lambda i: (0,)),
    ]
    out_block = list(out_shape)
    out_block[0] = tb
    out_specs = pl.BlockSpec(tuple(out_block), idx_x)

    kernel = functools.partial(_kernel, axis=axis, activate=activate,
                               use_bias=use_bias)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct(tuple(out_shape), x.dtype),
        interpret=interpret,
    )(x, w1, w2, b1, b2)


# --------------------------------------------------------------------- #
# custom VJP: Pallas forward, einsum backward (pallas_call has no
# automatic reverse-mode; the backward contractions are plain MXU
# matmuls XLA schedules well — see Patterns: Custom VJP in the Pallas
# guide).
# --------------------------------------------------------------------- #

_AXIS_EQNS_FWD = {1: "blkd,lh->bhkd", 2: "blkd,kh->blhd", 3: "blkd,dh->blkh"}
_AXIS_EQNS_GRADW = {1: "blkd,bhkd->lh", 2: "blkd,blhd->kh", 3: "blkd,blkh->dh"}
_AXIS_SUM_DIMS = {1: (0, 2, 3), 2: (0, 1, 3), 3: (0, 1, 2)}


def _mix(t, w, axis):
    return jnp.einsum(_AXIS_EQNS_FWD[axis], t, w,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_custom(x, w1, w2, b1, b2, axis, activate, interpret):
    return _run_fused(x, w1, w2, b1, b2, axis, activate, interpret)


def _fused_fwd(x, w1, w2, b1, b2, axis, activate, interpret):
    y = _run_fused(x, w1, w2, b1, b2, axis, activate, interpret)
    return y, (x, w1, w2, b1)


def _fused_bwd(axis, activate, interpret, res, dy):
    del interpret
    x, w1, w2, b1 = res
    act = _kernel_activation(activate)

    def bias(b, like):
        shape = [1] * like.ndim
        shape[axis] = b.shape[0]
        return b.reshape(shape)

    h_pre = _mix(x, w1, axis)
    if b1 is not None:
        h_pre = h_pre + bias(b1, h_pre)
    h, act_vjp = jax.vjp(act, h_pre)

    dh = _mix(dy, w2.T, axis)
    dw2 = jnp.einsum(_AXIS_EQNS_GRADW[axis], h, dy,
                     preferred_element_type=jnp.float32)
    (dh_pre,) = act_vjp(dh)
    dw1 = jnp.einsum(_AXIS_EQNS_GRADW[axis], x, dh_pre,
                     preferred_element_type=jnp.float32)
    dx = _mix(dh_pre, w1.T, axis)
    db1 = jnp.sum(dh_pre, axis=_AXIS_SUM_DIMS[axis]) if b1 is not None else None
    db2 = jnp.sum(dy, axis=_AXIS_SUM_DIMS[axis]) if b1 is not None else None
    return dx, dw1, dw2, db1, db2


_fused_custom.defvjp(_fused_fwd, _fused_bwd)


def fused_axis_mlp(x, w1, w2, b1, b2, axis, activate, interpret=False):
    """Public wrapper (keyword-friendly; custom_vjp requires positional
    args for its nondiff_argnums)."""
    return _fused_custom(x, w1, w2, b1, b2, axis, activate, interpret)
