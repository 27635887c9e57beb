"""Multi-device tests on the 8-virtual-CPU-device mesh: sharded batches,
model-sharded params, full two-stage steps, and equivalence of sharded
vs single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    data_sharding,
    shard_batch,
    shard_params,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8 and mesh.shape[MODEL_AXIS] == 1
    mesh2 = make_mesh(4, 2)
    assert mesh2.shape[DATA_AXIS] == 4 and mesh2.shape[MODEL_AXIS] == 2


def test_shard_batch_places_batch_axis():
    mesh = make_mesh(8, 1)
    batch = {"x": np.ones((16, 4), np.float32),
             "odd": np.ones((3, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec(DATA_AXIS)
    # non-divisible leading dim -> replicated
    assert sharded["odd"].sharding.spec == jax.sharding.PartitionSpec()


def test_shard_params_model_axis():
    mesh = make_mesh(4, 2)
    params = {"big": jnp.ones((64, 64)), "small": jnp.ones((4, 4)),
              "vec": jnp.ones((64,))}
    sharded = shard_params(mesh, params)
    assert sharded["big"].sharding.spec == jax.sharding.PartitionSpec(
        None, MODEL_AXIS)
    assert sharded["small"].sharding.spec == jax.sharding.PartitionSpec()
    assert sharded["vec"].sharding.spec == jax.sharding.PartitionSpec()


def test_sharded_matmul_matches_replicated():
    mesh = make_mesh(8, 1)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32))
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 8))
    expected = np.asarray(x @ w)
    xs = jax.device_put(x, data_sharding(mesh))
    got = np.asarray(jax.jit(lambda a, b: a @ b)(xs, w))
    assert np.allclose(got, expected, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must pass on the CPU mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_mesh_step_equals_single_device_step():
    """Fast-lane mirror of the dryrun's numeric equality check: one
    critic_step + train_step on a dp x pp x tp mesh must match the
    single-device step from identical initial params to <=1e-5
    (replaces the reference's DataParallel, Solver.py:33-36)."""
    import jax
    import numpy as np

    import __graft_entry__ as ge
    from mimrl_tpu.parallel.mesh import make_mesh

    data_axis, pipe_axis, model_axis = 2, 2, 2
    n_micro = 2
    bs, time_len, d_a, d_v, d_common = 8, 8, 6, 4, 16
    cfg, model = ge._build(bs, time_len, d_a, d_v, d_common=d_common,
                           bert_layers=4, bert_hidden=64, bert_heads=2,
                           cube_l=4)
    cfg = cfg.replace(mesh_data=data_axis, mesh_model=model_axis,
                      mesh_pipe=pipe_axis, pipe_microbatches=n_micro)
    mesh = make_mesh(data_axis, model_axis, pipe_axis)
    inputs = ge._inputs(bs, time_len, d_a, d_v)
    labels = jax.numpy.asarray(
        np.random.default_rng(1).normal(size=(bs,)).astype(np.float32))
    delta = ge._mesh_equality_check(model, cfg, mesh, inputs, labels,
                                    4 * bs, d_common, data_axis)
    assert delta <= 1e-5


def test_mesh_step_adam_f64_and_dropout_certificates():
    """Round-5 production-semantics mirrors of the dryrun certificates:
    (a) the shipping Adam chain on the composed dp x pp x tp mesh in f64
    collapses to ~1e-9 deltas (proving the f32 Adam discrepancy is
    epsilon-amplified reduction noise, not a sharding bug); (b) with
    dropout ON over a pure dp mesh — the reference DataParallel's exact
    semantics (Solver.py:33-36) — sharded still equals single-device
    (GSPMD mask generation is key-deterministic)."""
    import jax
    import numpy as np

    import __graft_entry__ as ge
    from mimrl_tpu.parallel.mesh import make_mesh

    bs, time_len, d_a, d_v, d_common = 8, 8, 6, 4, 16
    cfg, model = ge._build(bs, time_len, d_a, d_v, d_common=d_common,
                           bert_layers=4, bert_hidden=64, bert_heads=2,
                           cube_l=4)
    inputs = ge._inputs(bs, time_len, d_a, d_v)
    labels = jax.numpy.asarray(
        np.random.default_rng(1).normal(size=(bs,)).astype(np.float32))

    mesh = make_mesh(2, 2, 2)
    cfg_c = cfg.replace(mesh_data=2, mesh_model=2, mesh_pipe=2,
                        pipe_microbatches=2)
    adam_delta = ge._mesh_equality_check(
        model, cfg_c, mesh, inputs, labels, 4 * bs, d_common, 2,
        optm="Adam", f64=True, tol=1e-6)
    assert adam_delta <= 1e-6

    dp_mesh = make_mesh(4, 1, 1)
    cfg_dp = cfg.replace(mesh_data=4, mesh_model=1, mesh_pipe=1)
    drop_delta = ge._mesh_equality_check(
        model, cfg_dp, dp_mesh, inputs, labels, 4 * bs, d_common, 4,
        keep_dropout=True)
    assert drop_delta <= 1e-5


@pytest.mark.slow
def test_sharded_critic_scores_are_global():
    """The [bs, bs] critic matmul must see the global batch when the
    features are data-sharded (the reference computed MI on device 0's
    shard only, ref: Customization.py:99)."""
    from mimrl_tpu.mi.critics import CriticModel

    mesh = make_mesh(8, 1)
    critic = CriticModel("separate", hidden_dim=16, embed_dim=8, layers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    params = critic.init(jax.random.PRNGKey(2), x, y)
    expected = np.asarray(critic.apply(params, x, y))
    xs = jax.device_put(x, data_sharding(mesh))
    ys = jax.device_put(y, data_sharding(mesh))
    got = np.asarray(jax.jit(critic.apply)(params, xs, ys))
    assert got.shape == (16, 16)
    assert np.allclose(got, expected, atol=1e-4)


def test_dcn_mesh_shapes_and_batch_sharding():
    """Multi-slice mesh: leading dcn axis; the batch shards over
    dcn x data jointly; params stay replicated across dcn."""
    from jax.sharding import PartitionSpec as P

    from mimrl_tpu.parallel.mesh import DCN_AXIS, batch_axes

    mesh = make_mesh(2, 2, 1, dcn=2)
    assert mesh.shape[DCN_AXIS] == 2 and mesh.shape[DATA_AXIS] == 2
    assert batch_axes(mesh) == (DCN_AXIS, DATA_AXIS)
    batch = {"x": np.ones((8, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == P((DCN_AXIS, DATA_AXIS))
    # params: replicated across dcn (slice-local copies)
    params = shard_params(mesh, {"big": jnp.ones((64, 64))})
    assert params["big"].sharding.spec == P(None, MODEL_AXIS)


@pytest.mark.slow
def test_dcn_sharded_train_step_matches_replicated():
    """A full train step on the (dcn=2, data=2, model=2) mesh produces
    the same loss as the unsharded step — dcn is a layout, not math."""
    import __graft_entry__ as ge
    from mimrl_tpu.models.model import init_full
    from mimrl_tpu.train.optim import (
        make_main_optimizer, make_vmi_optimizer, merge_params,
        partition_params)
    from mimrl_tpu.train.steps import FeatureBank, StepFactory

    bs, time_len, d_a, d_v, d_common = 8, 8, 6, 4, 16
    cfg, model = ge._build(bs, time_len, d_a, d_v, d_common=d_common,
                           bert_layers=2, bert_hidden=32, bert_heads=2,
                           cube_l=4)
    inputs = ge._inputs(bs, time_len, d_a, d_v)
    params = init_full(model, {"params": jax.random.PRNGKey(0)},
                       *inputs)["params"]
    p_main, p_bert, p_vmi = partition_params(params)
    opt_main = make_main_optimizer(cfg, p_main, p_bert)
    opt_vmi = make_vmi_optimizer(cfg)
    n_bank = 2 * bs
    bank = FeatureBank.create(n_bank, n_bank, d_common).replace(
        F=jax.random.normal(jax.random.PRNGKey(2), (n_bank, d_common)),
        T=jax.random.normal(jax.random.PRNGKey(3), (n_bank, d_common)),
        A=jax.random.normal(jax.random.PRNGKey(4), (n_bank, d_common)),
        V=jax.random.normal(jax.random.PRNGKey(5), (n_bank, d_common)),
        C=jax.random.normal(jax.random.PRNGKey(1), (n_bank, 1)))
    batch = {
        "bert_sentences": inputs[0], "bert_sentence_types": inputs[1],
        "bert_sentence_att_mask": inputs[2], "audio": inputs[3],
        "video": inputs[4], "sample_mask": jnp.ones((bs,), jnp.float32),
    }
    labels = jnp.asarray(
        np.random.default_rng(1).normal(size=(bs,)), jnp.float32)
    rng = jax.random.PRNGKey(42)

    # train_step donates its param/opt buffers; replay from host copies
    host = jax.device_get((p_main, p_bert, p_vmi))
    losses = {}
    for name, mesh in (("repl", None), ("dcn", make_mesh(2, 2, 1, dcn=2))):
        pm, pb, pv = jax.tree.map(jnp.asarray, host)
        oms = opt_main.init(merge_params(pm, pb))
        steps = StepFactory(model, cfg, opt_main, opt_vmi, mesh=mesh)
        nb = FeatureBank.create(n_bank, n_bank, d_common)
        b = batch if mesh is None else shard_batch(mesh, batch)
        if mesh is not None:
            pm, pb, pv = (shard_params(mesh, p) for p in (pm, pb, pv))
        (_, _, _, loss, _, out, _) = steps.train_step(
            pm, pb, pv, oms, b, labels, bank, nb, 0, rng, use_mi=True)
        losses[name] = float(loss)
        assert np.isfinite(np.asarray(out)).all()
    assert np.isclose(losses["repl"], losses["dcn"], rtol=1e-4), losses
