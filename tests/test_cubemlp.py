"""CubeMLP golden shape tests (mirrors the reference smoke test
MLPProcess.py:165-169) + numerical equivalence of the einsum axis-mix
against an explicit transpose+dense reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.models.cubemlp import AxisMLP, MLPEncoder, MLPsBlock


def test_encoder_shrinking_shapes():
    # (ref: MLPProcess.py:165-169): [2,100,3,128] -> [2,10,1,32]
    enc = MLPEncoder(
        activate="gelu",
        d_in=[100, 3, 128],
        d_hiddens=[[100, 3, 128], [100, 3, 128], [50, 2, 64], [50, 2, 64]],
        d_outs=[[100, 3, 128], [50, 2, 64], [50, 2, 64], [10, 1, 32]],
        dropouts=[0.3, 0.5, 0.6],
        use_bias=False,
        ln_first=True,
        res_project=[True, True, True, True],
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 3, 128))
    params = enc.init(jax.random.PRNGKey(1), x)
    y = enc.apply(params, x, deterministic=True)
    assert y.shape == (2, 10, 1, 32)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("ln_first", [True, False])
@pytest.mark.parametrize("res_project", [True, False])
def test_block_identity_dims(ln_first, res_project):
    blk = MLPsBlock(
        activate="gelu", d_ins=[8, 3, 16], d_hiddens=[13, 15, 16],
        d_outs=[8, 3, 16], dropouts=[0.0, 0.0, 0.0], use_bias=True,
        ln_first=ln_first, res_project=res_project,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 3, 16))
    params = blk.init(jax.random.PRNGKey(1), x)
    y = blk.apply(params, x, deterministic=True)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_block_rejects_dim_change_without_projection():
    blk = MLPsBlock(
        activate="gelu", d_ins=[8, 3, 16], d_hiddens=[13, 15, 16],
        d_outs=[4, 3, 16], dropouts=[0.0, 0.0, 0.0], use_bias=True,
        ln_first=False, res_project=False,
    )
    x = jnp.zeros((2, 8, 3, 16))
    with pytest.raises(AssertionError):
        blk.init(jax.random.PRNGKey(0), x)


@pytest.mark.parametrize("axis", [1, 2, 3])
def test_axis_mlp_matches_transpose_reference(axis):
    """The einsum axis-mix must equal the reference's
    permute->Dense->permute formulation (ref: MLPProcess.py:64-122)."""
    d_ins = [7, 3, 9]
    d_hid, d_out = 11, 5
    dims = {1: d_ins[0], 2: d_ins[1], 3: d_ins[2]}
    mlp = AxisMLP(axis, dims[axis], d_hid, d_out, "gelu", True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, *d_ins))
    params = mlp.init(jax.random.PRNGKey(1), x)
    y = mlp.apply(params, x)

    # reference formulation: move `axis` last, dense twice, move back
    w1 = np.asarray(params["params"]["w1"])
    w2 = np.asarray(params["params"]["w2"])
    b1 = np.asarray(params["params"]["b1"])
    b2 = np.asarray(params["params"]["b2"])
    xt = np.moveaxis(np.asarray(x), axis, -1)
    from scipy.special import erf

    def gelu(z):
        return 0.5 * z * (1 + erf(z / np.sqrt(2)))

    h = gelu(xt @ w1 + b1)
    yt = h @ w2 + b2
    y_ref = np.moveaxis(yt, -1, axis)
    assert np.allclose(np.asarray(y), y_ref, atol=1e-4), (
        np.abs(np.asarray(y) - y_ref).max()
    )


def test_dropout_active_in_training_mode():
    blk = MLPsBlock(
        activate="gelu", d_ins=[8, 3, 16], d_hiddens=[8, 3, 16],
        d_outs=[8, 3, 16], dropouts=[0.9, 0.9, 0.9], use_bias=False,
        ln_first=False, res_project=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 3, 16))
    params = blk.init(jax.random.PRNGKey(1), x)
    y1 = blk.apply(params, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = blk.apply(params, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
