"""CubeMLP axis-mixing fusion encoder.

TPU-first re-design of the reference fusion stack (ref: MLPProcess.py).
The reference mixes the L (time), K (modality) and D (channel) axes
sequentially with 2-layer MLPs, implemented with `permute` +
last-dim Linear. On TPU, permutes of the minor axes force relayouts, so
each axis-mix is expressed as an einsum that contracts the target axis
*in place* — XLA maps these onto the MXU directly and fuses the bias,
activation, residual and LayerNorm into the matmul epilogue:

    L-mix: einsum('blkd,lh->bhkd')  (contract time axis)
    K-mix: einsum('blkd,kh->blhd')  (contract modality axis)
    D-mix: einsum('blkd,dh->blkh')  (contract channel axis)

Weights are stored as ``[d_in, d_hidden]`` / ``[d_hidden, d_out]``
matrices per axis, exactly the information content of the reference's
`nn.Linear` pairs (ref: MLPProcess.py:9-21), so parameter counts match.

An optional fused Pallas kernel (`mimrl_tpu.ops.pallas.cubemlp_kernel`)
implements the same block; see `use_pallas`.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mimrl_tpu.utils.activations import get_activation_fn

Array = jax.Array

_AXIS_EQNS = {
    # axis index in [bs, l, k, d] -> (contract eqn)
    1: "blkd,lh->bhkd",
    2: "blkd,kh->blhd",
    3: "blkd,dh->blkh",
}


class AxisMLP(nn.Module):
    """2-layer MLP over one axis of a [bs, l, k, d] tensor
    (ref: MLPProcess.py:9-21 applied through permutes at :64-122).

    With ``use_pallas`` the two contractions run in the fused Pallas
    kernel (mimrl_tpu.ops.pallas.cubemlp_kernel) — same params, same
    math, hidden tensor pinned in VMEM. Interpret mode is selected
    automatically off-TPU so tests stay hermetic."""

    axis: int  # 1 = L, 2 = K, 3 = D
    d_in: int
    d_hidden: int
    d_out: int
    activate: str
    use_bias: bool
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        eqn = _AXIS_EQNS[self.axis]
        act = get_activation_fn(self.activate)
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(), (self.d_in, self.d_hidden),
            jnp.float32,
        )
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(), (self.d_hidden, self.d_out),
            jnp.float32,
        )
        b1 = b2 = None
        if self.use_bias:
            b1 = self.param("b1", nn.initializers.zeros, (self.d_hidden,),
                            jnp.float32)
            b2 = self.param("b2", nn.initializers.zeros, (self.d_out,),
                            jnp.float32)

        if self.use_pallas:
            from mimrl_tpu.ops.pallas.cubemlp_kernel import fused_axis_mlp

            interpret = jax.devices()[0].platform == "cpu"
            # On TPU the Mosaic-compiled fast path covers the channel
            # (D) mix — the FLOP-dominant contraction; the tiny L/K
            # mixes stay on the XLA einsum (their Pallas layouts would
            # violate tiling constraints). Interpret mode covers all
            # axes for testing.
            if interpret or self.axis == 3:
                return fused_axis_mlp(x, w1, w2, b1, b2, self.axis,
                                      self.activate, interpret=interpret)

        h = jnp.einsum(eqn, x, w1, preferred_element_type=jnp.promote_types(
            x.dtype, jnp.float32))
        if self.use_bias:
            h = h + _axis_bias(b1, self.axis)
        h = act(h)
        out = jnp.einsum(eqn, h, w2, preferred_element_type=jnp.promote_types(
            h.dtype, jnp.float32))
        if self.use_bias:
            out = out + _axis_bias(b2, self.axis)
        return out


def _axis_bias(b: Array, axis: int) -> Array:
    shape = [1, 1, 1, 1]
    shape[axis] = b.shape[0]
    return b.reshape(shape)


class AxisResProject(nn.Module):
    """Bias-free linear residual projection along one axis
    (ref: MLPProcess.py:50-52)."""

    axis: int
    d_in: int
    d_out: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param(
            "w", nn.initializers.lecun_normal(), (self.d_in, self.d_out),
            jnp.float32,
        )
        return jnp.einsum(_AXIS_EQNS[self.axis], x, w,
                          preferred_element_type=jnp.promote_types(
                              x.dtype, jnp.float32))


class AxisLayerNorm(nn.Module):
    """LayerNorm normalizing over one axis of [bs, l, k, d]
    (the reference permutes the axis last and applies nn.LayerNorm,
    ref: MLPProcess.py:34-41)."""

    axis: int
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        mean = jnp.mean(x, axis=self.axis, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=self.axis, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * _axis_bias(scale, self.axis) + _axis_bias(bias, self.axis)


class MLP(nn.Module):
    """Last-dim 2-layer MLP, kept for API parity with the reference's
    standalone `MLP` (ref: MLPProcess.py:9-21)."""

    activate: str
    d_in: int
    d_hidden: int
    d_out: int
    use_bias: bool

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        act = get_activation_fn(self.activate)
        x = nn.Dense(self.d_hidden, use_bias=self.use_bias, name="fc1")(x)
        x = act(x)
        return nn.Dense(self.d_out, use_bias=self.use_bias, name="fc2")(x)


class MLPsBlock(nn.Module):
    """One CubeMLP block: sequential L, K, D mixing with residuals,
    per-axis dropout and LayerNorm in pre- (ln_first) or post- order
    (ref: MLPProcess.py:25-122)."""

    activate: str
    d_ins: Sequence[int]  # [l, k, d]
    d_hiddens: Sequence[int]
    d_outs: Sequence[int]
    dropouts: Sequence[float]
    use_bias: bool
    ln_first: bool = False
    res_project: bool = False
    use_pallas: bool = False

    def setup(self):
        if not self.res_project:
            for i in range(3):
                assert self.d_ins[i] == self.d_outs[i], (
                    "If not using projection for residual, d_in must equal "
                    "d_out (ref: MLPProcess.py:46-48)"
                )
        axes = (1, 2, 3)
        self.mlps = [
            AxisMLP(axes[i], self.d_ins[i], self.d_hiddens[i], self.d_outs[i],
                    self.activate, self.use_bias, self.use_pallas,
                    name=f"mlp_{'lkd'[i]}")
            for i in range(3)
        ]
        ln_dims = self.d_ins if self.ln_first else self.d_outs
        self.lns = [
            AxisLayerNorm(axes[i], ln_dims[i], name=f"ln_{'lkd'[i]}")
            for i in range(3)
        ]
        if self.res_project:
            self.res_projections = [
                AxisResProject(axes[i], self.d_ins[i], self.d_outs[i],
                               name=f"res_projection_{'lkd'[i]}")
                for i in range(3)
            ]
        self.drops = [
            nn.Dropout(rate=self.dropouts[i], name=f"dropout_{'lkd'[i]}")
            for i in range(3)
        ]

    def __call__(self, x: Array, mask: Array | None = None,
                 deterministic: bool = True) -> Array:
        if self.ln_first:
            return self._forward_ln_first(x, mask, deterministic)
        return self._forward_ln_last(x, mask, deterministic)

    def _residual(self, i: int, x: Array) -> Array:
        if self.res_project:
            return self.res_projections[i](x)
        return x

    def _forward_ln_first(self, x, mask, det):
        # (ref: MLPProcess.py:64-92)
        for i in range(3):
            residual = self._residual(i, x)
            h = self.lns[i](x)
            h = self.mlps[i](h)
            if i == 0 and mask is not None:
                h = jnp.where(mask[:, None, None, None], 0.0, h)
            h = self.drops[i](h, deterministic=det)
            x = h + residual
        return x

    def _forward_ln_last(self, x, mask, det):
        # (ref: MLPProcess.py:94-122)
        for i in range(3):
            residual = self._residual(i, x)
            h = self.mlps[i](x)
            if i == 0 and mask is not None:
                h = jnp.where(mask[:, None, None, None], 0.0, h)
            h = self.drops[i](h, deterministic=det)
            x = h + residual
            x = self.lns[i](x)
        return x


class MLPEncoder(nn.Module):
    """Stack of MLPsBlocks (ref: MLPProcess.py:126-137)."""

    activate: str
    d_in: Sequence[int]
    d_hiddens: Sequence[Sequence[int]]
    d_outs: Sequence[Sequence[int]]
    dropouts: Sequence[float]
    use_bias: bool
    ln_first: bool = False
    res_project: Sequence[bool] = (False, False, True)
    use_pallas: bool = False

    def setup(self):
        assert len(self.d_hiddens) == len(self.d_outs) == len(self.res_project)
        self.layers_stack = [
            MLPsBlock(
                activate=self.activate,
                d_ins=self.d_in if i == 0 else self.d_outs[i - 1],
                d_hiddens=self.d_hiddens[i],
                d_outs=self.d_outs[i],
                dropouts=self.dropouts,
                use_bias=self.use_bias,
                ln_first=self.ln_first,
                res_project=self.res_project[i],
                use_pallas=self.use_pallas,
                name=f"block_{i}",
            )
            for i in range(len(self.d_hiddens))
        ]

    def __call__(self, x: Array, mask: Array | None = None,
                 deterministic: bool = True) -> Array:
        for layer in self.layers_stack:
            x = layer(x, mask, deterministic)
        return x
