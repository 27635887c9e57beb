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


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must pass on the CPU mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


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
