"""Pipeline-parallel BERT (parallel/pipeline.py) and sequence-parallel
sharding tests on the 8-virtual-CPU-device mesh.

The correctness bar: the shard_map microbatch pipeline must be
numerically identical (fwd AND grad) to the plain sequential layer
stack — pipelining is a schedule, not an approximation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mimrl_tpu.models.bert import BertConfig, BertModel
from mimrl_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, PIPE_AXIS, make_mesh)
from mimrl_tpu.parallel.pipeline import bert_forward_pipelined


def _tiny_bert(n_layers=4):
    return BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=n_layers,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=16)


def _data(bs=8, T=12, vocab=64, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, vocab, (bs, T)), jnp.int32)
    types = jnp.zeros((bs, T), jnp.int32)
    mask = jnp.asarray(
        (np.arange(T)[None, :] < rng.integers(4, T + 1, (bs, 1))), jnp.int32)
    return ids, types, mask


def test_make_mesh_three_axes():
    mesh = make_mesh(2, 1, 4)
    assert mesh.shape[DATA_AXIS] == 2
    assert mesh.shape[PIPE_AXIS] == 4
    assert mesh.shape[MODEL_AXIS] == 1


@pytest.mark.parametrize("data,pipe,micro", [
    pytest.param(2, 4, 2, marks=pytest.mark.slow),
    pytest.param(1, 4, 4, marks=pytest.mark.slow), (2, 2, 4)])
def test_pipelined_bert_matches_sequential(data, pipe, micro):
    cfg = _tiny_bert(n_layers=4)
    model = BertModel(cfg)
    ids, types, mask = _data()
    params = model.init(jax.random.PRNGKey(0), ids, types, mask)["params"]
    expected = np.asarray(model.apply({"params": params}, ids, types, mask,
                                      deterministic=True))

    mesh = make_mesh(data, 1, pipe)
    got = np.asarray(jax.jit(
        lambda p: bert_forward_pipelined(
            p, cfg, mesh, ids, types, mask, n_microbatches=micro,
            deterministic=True))(params))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("data,pipe,micro,virtual,remat", [
    (2, 2, 4, 2, False),   # interleaved, M > S: wraparound buffering
    (2, 4, 4, 1, True),    # GPipe + chunk remat
    (4, 2, 2, 2, True),    # interleaved + remat, M == S
])
def test_interleaved_schedule_matches_sequential(data, pipe, micro, virtual,
                                                 remat):
    """The interleaved (Megatron-layer-assignment) schedule and chunk
    remat are schedules, not approximations: bit-level parity with the
    sequential stack."""
    cfg = _tiny_bert(n_layers=4)
    model = BertModel(cfg)
    ids, types, mask = _data()
    params = model.init(jax.random.PRNGKey(0), ids, types, mask)["params"]
    expected = np.asarray(model.apply({"params": params}, ids, types, mask,
                                      deterministic=True))
    mesh = make_mesh(data, 1, pipe)
    got = np.asarray(jax.jit(
        lambda p: bert_forward_pipelined(
            p, cfg, mesh, ids, types, mask, n_microbatches=micro,
            n_virtual=virtual, remat=remat, deterministic=True))(params))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_interleaved_grads_match_sequential():
    cfg = _tiny_bert(n_layers=4)
    model = BertModel(cfg)
    ids, types, mask = _data()
    params = model.init(jax.random.PRNGKey(0), ids, types, mask)["params"]
    cot = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 12, 16)), jnp.float32)

    def loss_seq(p):
        out = model.apply({"params": p}, ids, types, mask, deterministic=True)
        return jnp.sum(out * cot)

    # data=2 x pipe=2: bs=8 must divide microbatches*data (= 4*2)
    mesh = make_mesh(2, 1, 2)

    def loss_pipe(p):
        out = bert_forward_pipelined(
            p, cfg, mesh, ids, types, mask, n_microbatches=4, n_virtual=2,
            remat=True, deterministic=True)
        return jnp.sum(out * cot)

    g_seq = jax.jit(jax.grad(loss_seq))(params)
    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_pipe = dict(jax.tree_util.tree_leaves_with_path(g_pipe))
    assert flat_seq and len(flat_seq) == len(flat_pipe)
    for path, leaf in flat_seq:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_pipe[path]), atol=5e-4,
            rtol=5e-3, err_msg=jax.tree_util.keystr(path))


def test_interleaved_needs_enough_microbatches():
    cfg = _tiny_bert(n_layers=4)
    ids, types, mask = _data()
    model = BertModel(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, types, mask)["params"]
    mesh = make_mesh(2, 1, 2)
    with pytest.raises(ValueError, match="pipe_microbatches"):
        bert_forward_pipelined(params, cfg, mesh, ids, types, mask,
                               n_microbatches=1, n_virtual=2)


@pytest.mark.slow
def test_pipelined_bert_grads_match():
    cfg = _tiny_bert(n_layers=4)
    model = BertModel(cfg)
    ids, types, mask = _data()
    params = model.init(jax.random.PRNGKey(0), ids, types, mask)["params"]
    cot = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 12, 16)), jnp.float32)

    def loss_seq(p):
        out = model.apply({"params": p}, ids, types, mask, deterministic=True)
        return jnp.sum(out * cot)

    mesh = make_mesh(2, 1, 4)

    def loss_pipe(p):
        out = bert_forward_pipelined(p, cfg, mesh, ids, types, mask,
                                     n_microbatches=2, deterministic=True)
        return jnp.sum(out * cot)

    g_seq = jax.jit(jax.grad(loss_seq))(params)
    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_pipe = dict(jax.tree_util.tree_leaves_with_path(g_pipe))
    assert flat_seq and len(flat_seq) == len(flat_pipe)
    for path, leaf in flat_seq:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_pipe[path]), atol=5e-4,
            rtol=5e-3, err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_pipelined_bert_dropout_runs():
    """Non-deterministic mode must run (per-stage folded rngs) and give
    finite, input-dependent outputs."""
    cfg = _tiny_bert(n_layers=2)
    ids, types, mask = _data()
    model = BertModel(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, types, mask)["params"]
    mesh = make_mesh(2, 1, 2)
    out = bert_forward_pipelined(
        params, cfg, mesh, ids, types, mask, n_microbatches=2,
        deterministic=False, rng=jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_shape_validation():
    cfg = _tiny_bert(n_layers=3)
    ids, types, mask = _data()
    model = BertModel(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, types, mask)["params"]
    mesh = make_mesh(2, 1, 2)
    with pytest.raises(ValueError, match="not divisible by pipe"):
        bert_forward_pipelined(params, cfg, mesh, ids, types, mask,
                               n_microbatches=2)


def test_seq_shard_matches_unconstrained():
    """Megatron-style sequence sharding is a layout annotation only —
    outputs must match the unconstrained forward exactly."""
    import dataclasses

    cfg = _tiny_bert(n_layers=2)
    ids, types, mask = _data(bs=4, T=8)
    model = BertModel(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, types, mask)["params"]
    expected = np.asarray(model.apply({"params": params}, ids, types, mask,
                                      deterministic=True))

    mesh = make_mesh(2, 4, 1)
    sp_cfg = dataclasses.replace(
        cfg, seq_sharding=NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None)))
    sp_model = BertModel(sp_cfg)
    got = np.asarray(jax.jit(
        lambda p: sp_model.apply({"params": p}, ids, types, mask,
                                 deterministic=True))(params))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_pipeline_full_train_step():
    """Full two-stage train step with the pipelined BERT path wired
    through StepFactory (mesh_pipe=2): dp x pp composition."""
    import __graft_entry__ as ge
    from mimrl_tpu.models.model import init_full
    from mimrl_tpu.parallel.mesh import shard_batch
    from mimrl_tpu.train.optim import (
        make_main_optimizer, make_vmi_optimizer, merge_params,
        partition_params)
    from mimrl_tpu.train.steps import FeatureBank, StepFactory

    bs, time_len, d_a, d_v, d_common = 8, 8, 6, 4, 16
    cfg, model = ge._build(bs, time_len, d_a, d_v, d_common=d_common,
                           bert_layers=2, bert_hidden=32, bert_heads=2,
                           cube_l=4)
    cfg = cfg.replace(mesh_data=2, mesh_model=1, mesh_pipe=2,
                      pipe_microbatches=2)
    mesh = make_mesh(2, 1, 2)
    inputs = ge._inputs(bs, time_len, d_a, d_v)
    params = init_full(model, {"params": jax.random.PRNGKey(0)},
                       *inputs)["params"]
    p_main, p_bert, p_vmi = partition_params(params)
    opt_main = make_main_optimizer(cfg, p_main, p_bert)
    opt_vmi = make_vmi_optimizer(cfg)
    oms = opt_main.init(merge_params(p_main, p_bert))
    ovs = opt_vmi.init(p_vmi)
    steps = StepFactory(model, cfg, opt_main, opt_vmi, mesh=mesh)

    n_bank = 2 * bs
    bank = FeatureBank.create(n_bank, n_bank, d_common).replace(
        C=jax.random.normal(jax.random.PRNGKey(1), (n_bank, 1)),
        F=jax.random.normal(jax.random.PRNGKey(2), (n_bank, d_common)),
        T=jax.random.normal(jax.random.PRNGKey(3), (n_bank, d_common)),
        A=jax.random.normal(jax.random.PRNGKey(4), (n_bank, d_common)),
        V=jax.random.normal(jax.random.PRNGKey(5), (n_bank, d_common)),
    )
    new_bank = FeatureBank.create(n_bank, n_bank, d_common)
    batch = shard_batch(mesh, {
        "bert_sentences": inputs[0], "bert_sentence_types": inputs[1],
        "bert_sentence_att_mask": inputs[2], "audio": inputs[3],
        "video": inputs[4],
        "sample_mask": jnp.ones((bs,), jnp.float32),
    })
    labels = jnp.asarray(
        np.random.default_rng(1).normal(size=(bs,)), jnp.float32)
    rng = jax.random.PRNGKey(42)

    p_vmi, ovs, loss1, _ = steps.critic_step(
        p_main, p_bert, p_vmi, ovs, batch, labels, bank, rng)
    (p_main, p_bert, oms, loss2, mis, out, new_bank) = steps.train_step(
        p_main, p_bert, p_vmi, oms, batch, labels, bank, new_bank, 0, rng,
        use_mi=True)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert np.isfinite(np.asarray(out)).all()
