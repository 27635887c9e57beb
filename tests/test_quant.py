"""int8 quantized matmul (ops/quant.py): forward accuracy, straight-
through gradients, nn.Dense param-tree compatibility, and BERT
integration. No reference counterpart — TPU-native perf work toward the
>=10x north star (BASELINE.md)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.models.bert import BertConfig, BertModel
from mimrl_tpu.ops.quant import QuantDense, int8_dot, make_dense


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape) * scale


def test_int8_dot_forward_accuracy():
    x = _rand(0, (64, 128))
    w = _rand(1, (128, 96), 0.05)
    exact = x @ w
    q = int8_dot(x, w, "int8")
    err = jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact)
    assert float(err) < 0.02, float(err)


def test_int8_dot_forward_batched_rank3():
    x = _rand(0, (4, 10, 32))
    w = _rand(1, (32, 16))
    exact = jnp.einsum("btk,kn->btn", x, w)
    q = int8_dot(x, w, "int8")
    assert q.shape == exact.shape
    err = jnp.linalg.norm(q - exact) / jnp.linalg.norm(exact)
    assert float(err) < 0.02


def test_int8_dot_scale_invariance_per_row():
    """Per-row dynamic scales: a row 1000x larger than the others is
    quantized against its own amax, not the tensor's."""
    x = _rand(0, (8, 64)).at[0].mul(1000.0)
    w = _rand(1, (64, 32), 0.05)
    exact = x @ w
    q = int8_dot(x, w, "int8")
    rel = np.abs(np.asarray(q - exact)) / (np.abs(np.asarray(exact)) + 1e-3)
    # every row individually accurate (tensor-wide scales would destroy
    # rows 1..7)
    assert np.median(rel, axis=1).max() < 0.05


def test_int8_fwd_grads_match_exact_backward():
    """mode int8_fwd: backward is full-precision straight-through, so
    grads equal the plain-matmul grads exactly."""
    x = _rand(0, (16, 32))
    w = _rand(1, (32, 8), 0.1)

    g_q = jax.grad(lambda a, b: jnp.sum(int8_dot(a, b, "int8_fwd") ** 2),
                   argnums=(0, 1))(x, w)
    g_e = jax.grad(lambda a, b: jnp.sum((a @ b) ** 2), argnums=(0, 1))(x, w)
    # the cotangent differs (quantized fwd), so compare against the exact
    # chain with the SAME cotangent: grad of sum(y*g) for fixed g
    y_q = int8_dot(x, w, "int8_fwd")
    cot = 2.0 * y_q
    gx, gw = jax.vjp(lambda a, b: int8_dot(a, b, "int8_fwd"), x, w)[1](cot)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(cot @ w.T),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(x.T @ cot),
                               rtol=1e-5, atol=1e-5)
    # and end-to-end the quantized-model grads track the exact ones
    for a, b in zip(g_q, g_e):
        cos = np.sum(np.asarray(a) * np.asarray(b)) / (
            np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99


@pytest.mark.parametrize("mode", ["int8", "int8_all"])
def test_int8_bwd_grads_close_to_exact(mode):
    x = _rand(0, (32, 64))
    w = _rand(1, (64, 16), 0.1)
    cot = _rand(2, (32, 16))
    gx, gw = jax.vjp(lambda a, b: int8_dot(a, b, mode), x, w)[1](cot)
    ex_gx, ex_gw = cot @ w.T, x.T @ cot
    for got, exact in ((gx, ex_gx), (gw, ex_gw)):
        cos = np.sum(np.asarray(got) * np.asarray(exact)) / (
            np.linalg.norm(got) * np.linalg.norm(exact))
        assert cos > 0.999, (mode, float(cos))


def test_quantdense_param_tree_matches_nn_dense():
    """QuantDense params are name/shape/dtype-identical to nn.Dense:
    checkpoints and the name-based optimizer partition are unchanged
    when --quant is flipped between runs."""
    x = _rand(0, (4, 12))
    p_q = QuantDense(7).init(jax.random.PRNGKey(0), x)
    p_d = nn.Dense(7).init(jax.random.PRNGKey(0), x)
    flat_q = jax.tree_util.tree_leaves_with_path(p_q)
    flat_d = jax.tree_util.tree_leaves_with_path(p_d)
    assert [(jax.tree_util.keystr(k), v.shape, v.dtype) for k, v in flat_q] \
        == [(jax.tree_util.keystr(k), v.shape, v.dtype) for k, v in flat_d]
    # identical init values -> identical output modulo quantization noise
    y_q = QuantDense(7).apply(p_q, x)
    y_d = nn.Dense(7).apply(p_d, x)
    assert float(jnp.linalg.norm(y_q - y_d) / jnp.linalg.norm(y_d)) < 0.03


def test_make_dense_mode_none_is_nn_dense():
    layer = make_dense("none", 5, jnp.float32, "d")
    assert isinstance(layer, nn.Dense)
    layer = make_dense("int8", 5, jnp.float32, "d")
    assert isinstance(layer, QuantDense)


@pytest.mark.slow
def test_bert_quant_output_close_and_params_shared():
    """Quantized BERT accepts the unquantized param tree (drop-in) and
    its output stays close over a full (tiny) layer stack."""
    cfg = BertConfig.tiny()
    cfg_q = BertConfig(**{**cfg.__dict__, "quant": "int8"})
    ids = jnp.zeros((2, 16), jnp.int32).at[:, :8].set(5)
    types = jnp.zeros((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    params = BertModel(cfg).init(jax.random.PRNGKey(0), ids, types, mask)
    out = BertModel(cfg).apply(params, ids, types, mask)
    out_q = BertModel(cfg_q).apply(params, ids, types, mask)
    assert out_q.shape == out.shape
    err = float(jnp.linalg.norm(out_q - out) / jnp.linalg.norm(out))
    assert err < 0.05, err


@pytest.mark.slow
def test_bert_quant_grads_flow():
    cfg = BertConfig(**{**BertConfig.tiny().__dict__, "quant": "int8_all"})
    ids = jnp.zeros((2, 16), jnp.int32).at[:, :8].set(5)
    types = jnp.zeros((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    params = BertModel(cfg).init(jax.random.PRNGKey(0), ids, types, mask)

    def loss(p):
        return jnp.sum(BertModel(cfg).apply(p, ids, types, mask) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
