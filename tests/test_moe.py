"""MoE fusion encoder (models/fusion.py::MoEFusion): routing math,
shape contract, and expert-parallel sharding equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mimrl_tpu.models.fusion import MoEFusion, _MoEBlock
from mimrl_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, make_mesh, shard_params)


def _x(bs=4, T=6, K=3, d=16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(bs, T, K, d)), jnp.float32)


def test_moe_fusion_shape_preserving():
    x = _x()
    model = MoEFusion(d_model=16, time_len=6, num_layers=2, num_heads=2,
                      num_experts=4, top_k=2)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x, deterministic=True)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_moe_block_gates_topk():
    """Router gates: EXACTLY top_k experts active per token (one-hot from
    top_k indices, not a >=threshold compare), gates sum to 1 over the
    active set — including for exactly-uniform router probabilities
    (LayerNorm of an all-zero token gives zero logits), where a
    threshold rule would activate every expert."""
    x = _x(T=2, K=3, d=16).reshape(4, 6, 16)
    block = _MoEBlock(d_model=16, num_experts=4, top_k=2, dropout=0.0)
    params = block.init(jax.random.PRNGKey(0), x)

    def gates_of(probs, k=2, E=4):
        _, top_idx = jax.lax.top_k(probs, k)
        sel = jnp.sum(jax.nn.one_hot(top_idx, E, dtype=probs.dtype), axis=-2)
        g = probs * sel
        return g / (g.sum(-1, keepdims=True) + 1e-9)

    h = jax.nn.standardize(x, axis=-1)  # proxy: gate support is what matters
    logits = h @ params["params"]["router"]["kernel"]
    probs = jax.nn.softmax(logits, axis=-1)
    gates = gates_of(probs)
    active = np.asarray((gates > 0).sum(-1))
    assert (active == 2).all()
    np.testing.assert_allclose(np.asarray(gates.sum(-1)), 1.0, atol=1e-5)

    # uniform probabilities (all-zero/padded tokens): still exactly top_k
    uniform = jnp.full((4, 6, 4), 0.25)
    g_uni = gates_of(uniform)
    assert (np.asarray((g_uni > 0).sum(-1)) == 2).all()
    np.testing.assert_allclose(np.asarray(g_uni.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_moe_grads_finite_and_router_trained():
    x = _x()
    model = MoEFusion(d_model=16, time_len=6, num_layers=1, num_heads=2,
                      num_experts=4, top_k=2)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(model.apply(p, x, deterministic=True) ** 2)

    grads = jax.grad(loss)(params)["params"]
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the router must receive gradient through the gate weighting
    g_router = np.asarray(grads["moe_0"]["router"]["kernel"])
    assert np.abs(g_router).sum() > 0


def test_moe_expert_parallel_matches_replicated():
    """EP layout (experts sharded over `model`, activations constrained)
    must be numerically identical to single-device execution."""
    x = _x(bs=4, T=6, K=3, d=16)
    mesh = make_mesh(2, 4, 1)
    model_rep = MoEFusion(d_model=16, time_len=6, num_layers=2, num_heads=2,
                          num_experts=4, top_k=2)
    params = model_rep.init(jax.random.PRNGKey(0), x)
    expected = np.asarray(model_rep.apply(params, x, deterministic=True))

    model_ep = MoEFusion(
        d_model=16, time_len=6, num_layers=2, num_heads=2,
        num_experts=4, top_k=2,
        ep_sharding=NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS, None, None)))
    sharded = {"params": shard_params(mesh, params["params"])}
    got = np.asarray(jax.jit(
        lambda p, a: model_ep.apply(p, a, deterministic=True))(sharded, x))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_moe_expert_weights_get_ep_sharding():
    mesh = make_mesh(2, 4, 1)
    x = _x(d=16)
    model = MoEFusion(d_model=16, time_len=6, num_layers=1, num_heads=2,
                      num_experts=4, top_k=2)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    sharded = shard_params(mesh, params)
    w1 = sharded["moe_0"]["w1"]
    assert w1.sharding.spec[0] == MODEL_AXIS
    router = sharded["moe_0"]["router"]["kernel"]
    assert router.sharding.spec == P() or router.sharding.spec[0] is None


@pytest.mark.slow
def test_moe_through_mimrl_model():
    """--fusion moe end-to-end through MimrlModel forward + stage losses."""
    import __graft_entry__ as ge
    from mimrl_tpu.models.model import init_full

    bs, time_len, d_a, d_v = 4, 8, 6, 4
    cfg, model = ge._build(bs, time_len, d_a, d_v, d_common=16,
                           bert_layers=2, bert_hidden=32, bert_heads=2,
                           cube_l=4)
    model = model.clone(fusion="moe", fusion_layers=1, fusion_heads=2,
                        moe_experts=2, moe_topk=1)
    inputs = ge._inputs(bs, time_len, d_a, d_v)
    params = init_full(model, {"params": jax.random.PRNGKey(0)},
                       *inputs)["params"]
    out = model.apply({"params": params}, *inputs, deterministic=True,
                      return_features=True)
    assert out[0].shape[0] == bs
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
