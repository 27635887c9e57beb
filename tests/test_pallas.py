"""Pallas fused CubeMLP kernel: interpret-mode equality against the
einsum reference path (same params, same math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.models.cubemlp import AxisMLP, MLPEncoder
from mimrl_tpu.ops.pallas.cubemlp_kernel import _pick_batch_tile, fused_axis_mlp


@pytest.mark.parametrize("axis", [1, 2, 3])
@pytest.mark.parametrize("use_bias", [True, False])
def test_fused_axis_mlp_matches_einsum(axis, use_bias):
    bs, L, K, D = 4, 10, 3, 16
    dims = {1: L, 2: K, 3: D}
    d_in = dims[axis]
    d_hidden, d_out = 12, d_in  # keep shape for easy comparison

    ref = AxisMLP(axis, d_in, d_hidden, d_out, "gelu", use_bias,
                  use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (bs, L, K, D))
    params = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(params, x)

    p = params["params"]
    y_pallas = fused_axis_mlp(
        x, p["w1"], p["w2"],
        p.get("b1"), p.get("b2"), axis, "gelu", interpret=True)
    # kernels use tanh-approximate gelu (exact erf has no Pallas TPU
    # lowering) -> small tolerance
    assert np.allclose(np.asarray(y_ref), np.asarray(y_pallas), atol=5e-3), (
        np.abs(np.asarray(y_ref) - np.asarray(y_pallas)).max())


def test_axis_mlp_module_pallas_flag():
    """The module path with use_pallas=True must equal use_pallas=False
    given identical params (CPU -> interpret mode auto-selected)."""
    bs, L, K, D = 4, 8, 3, 8
    ref = AxisMLP(1, L, 6, L, "relu", True, use_pallas=False)
    pal = AxisMLP(1, L, 6, L, "relu", True, use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (bs, L, K, D))
    params = ref.init(jax.random.PRNGKey(1), x)
    y1 = ref.apply(params, x)
    y2 = pal.apply(params, x)
    assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


@pytest.mark.slow
def test_full_encoder_pallas_equivalence():
    kw = dict(
        activate="gelu", d_in=[8, 3, 16],
        d_hiddens=[[8, 3, 16], [4, 2, 8]],
        d_outs=[[8, 3, 16], [4, 2, 8]],
        dropouts=[0.0, 0.0, 0.0], use_bias=True, ln_first=False,
        res_project=[True, True],
    )
    enc_ref = MLPEncoder(**kw, use_pallas=False)
    enc_pal = MLPEncoder(**kw, use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 3, 16))
    params = enc_ref.init(jax.random.PRNGKey(1), x)
    y1 = enc_ref.apply(params, x, deterministic=True)
    y2 = enc_pal.apply(params, x, deterministic=True)
    assert y1.shape == y2.shape == (4, 4, 2, 8)
    assert np.allclose(np.asarray(y1), np.asarray(y2), atol=2e-2), (
        np.abs(np.asarray(y1) - np.asarray(y2)).max())


def test_pick_batch_tile():
    assert _pick_batch_tile(128, 100, 3, 128, 100) >= 1
    assert 128 % _pick_batch_tile(128, 100, 3, 128, 100) == 0
    # huge per-sample footprint -> tile 1
    assert _pick_batch_tile(8, 4096, 3, 4096, 4096) == 1


def test_fused_kernel_differentiable():
    bs, L, K, D = 2, 6, 3, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (bs, L, K, D))
    w1 = jax.random.normal(jax.random.PRNGKey(1), (L, 5)) * 0.1
    w2 = jax.random.normal(jax.random.PRNGKey(2), (5, L)) * 0.1

    def f(w1, w2):
        return jnp.sum(fused_axis_mlp(x, w1, w2, None, None, 1, "gelu",
                                      interpret=True))

    g1, g2 = jax.grad(f, argnums=(0, 1))(w1, w2)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    # check against einsum path gradients (same approximate gelu)
    def f_ref(w1, w2):
        h = jax.nn.gelu(jnp.einsum("blkd,lh->bhkd", x, w1),
                        approximate=True)
        return jnp.sum(jnp.einsum("bhkd,hl->blkd", h, w2))

    r1, r2 = jax.grad(f_ref, argnums=(0, 1))(w1, w2)
    assert np.allclose(np.asarray(g1), np.asarray(r1), atol=1e-4)
    assert np.allclose(np.asarray(g2), np.asarray(r2), atol=1e-4)


def test_int8_matmul_kernel_matches_xla():
    """Pallas int8 GEMM (interpret mode): s8 x s8 -> s32 with fused
    per-row/per-col dequant epilogue must match the XLA dot_general
    reference path bit-for-bit in f32 (same accumulate order per tile)."""
    from mimrl_tpu.ops.pallas.int8_matmul import int8_matmul

    rng = np.random.default_rng(0)
    m, k, n = 64, 48, 96
    a = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    sa = jnp.asarray(rng.uniform(0.001, 0.02, size=(m, 1)), jnp.float32)
    sb = jnp.asarray(rng.uniform(0.001, 0.02, size=(1, n)), jnp.float32)

    out = int8_matmul(a, b, sa, sb, block_m=32, block_n=32,
                      out_dtype=jnp.float32, interpret=True)
    ref = (jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * sa * sb)
    assert out.dtype == jnp.float32
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_int8_matmul_kernel_bf16_output():
    """bf16 output path: epilogue rounds once to bf16 (<=0.5% relerr)."""
    from mimrl_tpu.ops.pallas.int8_matmul import int8_matmul

    rng = np.random.default_rng(1)
    m, k, n = 32, 32, 64
    a = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    sa = jnp.full((m, 1), 0.01, jnp.float32)
    sb = jnp.full((1, n), 0.02, jnp.float32)
    out = int8_matmul(a, b, sa, sb, block_m=32, block_n=32,
                      out_dtype=jnp.bfloat16, interpret=True)
    ref = (jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * sa * sb)
    rel = np.abs(np.asarray(out, np.float32) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1e-6)
    assert float(rel.max()) < 0.005


def test_quant_int8_pallas_routing(monkeypatch):
    """MIMRL_INT8_PALLAS=1 routes supported shapes through the Mosaic
    kernel; result must match the XLA dot_general path bit-for-bit
    (same int32 accumulate, same epilogue math)."""
    import functools as ft

    from mimrl_tpu.ops import quant
    from mimrl_tpu.ops.pallas import int8_matmul as kmod

    assert kmod.supports(64, 128, 256)
    assert not kmod.supports(64, 100, 256)   # K not 128-multiple
    assert not kmod.supports(63, 128, 256)   # M has no 32-multiple tile

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 128))
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 256)) * 0.1
    ref = quant._int8_matmul(x, w, jnp.float32)

    monkeypatch.setenv("MIMRL_INT8_PALLAS", "1")
    monkeypatch.setattr(kmod, "int8_matmul",
                        ft.partial(kmod.int8_matmul, interpret=True))
    out = quant._int8_matmul(x, w, jnp.float32)
    assert out.shape == ref.shape
    assert np.array_equal(np.asarray(out), np.asarray(ref))
