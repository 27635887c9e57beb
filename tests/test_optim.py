"""Optimizer partitioning, LR schedules, freeze masks, SAM."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.train.optim import (
    LRScheduler,
    bert_freeze_mask,
    make_main_optimizer,
    make_vmi_optimizer,
    merge_params,
    partition_params,
    set_learning_rate,
)
from mimrl_tpu.train.sam import sam_ascent, sam_step


def _toy_params():
    return {
        "bertmodel": {
            "embeddings": {"w": jnp.ones((2, 2))},
            "layer_0": {"w": jnp.ones((2, 2))},
            "layer_9": {"w": jnp.ones((2, 2))},
        },
        "W_t": {"kernel": jnp.ones((2, 2))},
        "vmi_estimator_f_t": {"w": jnp.ones((2, 2))},
        "vcmi_estimator_ac_t": {"w": jnp.ones((2, 2))},
    }


def test_partition():
    main, bert, vmi = partition_params(_toy_params())
    assert set(bert) == {"bertmodel"}
    assert set(vmi) == {"vmi_estimator_f_t", "vcmi_estimator_ac_t"}
    assert set(main) == {"W_t"}


def test_bert_freeze_part():
    # 'part' freezes encoder layers <= 8 only (ref: Customization.py:9-12)
    _, bert, _ = partition_params(_toy_params())
    mask = bert_freeze_mask(bert, "part")
    assert mask["bertmodel"]["layer_0"]["w"] == 0.0
    assert mask["bertmodel"]["layer_9"]["w"] == 1.0
    assert mask["bertmodel"]["embeddings"]["w"] == 1.0
    mask_all = bert_freeze_mask(bert, "all")
    assert mask_all["bertmodel"]["layer_9"]["w"] == 0.0
    assert mask_all["bertmodel"]["embeddings"]["w"] == 0.0


def test_main_optimizer_bert_lr_scaling_and_freeze():
    cfg = MimrlConfig(learning_rate=0.1, bert_lr_rate=0.01,
                      bert_freeze="part", gradient_clip=0.0, optm="SGD")
    params = _toy_params()
    main, bert, _ = partition_params(params)
    opt = make_main_optimizer(cfg, main, bert)
    merged = merge_params(main, bert)
    state = opt.init(merged)
    grads = jax.tree_util.tree_map(jnp.ones_like, merged)
    updates, state = opt.update(grads, state, merged)
    # main group: -lr * grad
    assert np.allclose(np.asarray(updates["W_t"]["kernel"]), -0.1)
    # bert unfrozen layer: -lr * bert_lr_rate
    assert np.allclose(np.asarray(updates["bertmodel"]["layer_9"]["w"]),
                       -0.1 * 0.01)
    # frozen layer: zero update
    assert np.allclose(np.asarray(updates["bertmodel"]["layer_0"]["w"]), 0.0)


def test_gradient_clip_by_value():
    cfg = MimrlConfig(learning_rate=1.0, gradient_clip=0.5, optm="SGD")
    opt = make_vmi_optimizer(cfg)
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    grads = {"w": jnp.asarray([10.0, -10.0, 0.1])}
    updates, _ = opt.update(grads, state, params)
    # clip to +-0.5, then SGD momentum x (-lr)
    assert np.allclose(np.asarray(updates["w"]), [-0.5, 0.5, -0.1])


def test_set_learning_rate():
    cfg = MimrlConfig(learning_rate=0.1, optm="SGD", gradient_clip=0)
    opt = make_vmi_optimizer(cfg)
    params = {"w": jnp.zeros(2)}
    state = opt.init(params)
    state = set_learning_rate(state, 0.001)
    updates, _ = opt.update({"w": jnp.ones(2)}, state, params)
    assert np.allclose(np.asarray(updates["w"]), -0.001)


def test_sam_rejected_by_solver_path():
    cfg = MimrlConfig(optm="SAM")
    with pytest.raises(NotImplementedError):
        make_vmi_optimizer(cfg).init({"w": jnp.zeros(2)})


def test_sam_standalone_works():
    params = {"w": jnp.asarray([1.0, 2.0])}

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"]))

    opt = optax.sgd(0.1)
    state = opt.init(params)
    new_params, state, loss = sam_step(loss_fn, params, opt, state, rho=0.05)
    assert float(loss) == 5.0
    assert float(loss_fn(new_params)) < 5.0
    e = sam_ascent(jax.grad(loss_fn)(params), rho=0.05)
    norm = np.sqrt(sum(np.sum(np.square(np.asarray(x)))
                       for x in jax.tree_util.tree_leaves(e)))
    assert np.isclose(norm, 0.05, atol=1e-6)


def test_lr_schedules():
    # step (ref: Solver.py:153-156)
    s = LRScheduler(MimrlConfig(lr_decrease="step", lr_decrease_iter="2",
                                lr_decrease_rate=0.1))
    assert [round(s.step(), 4) for _ in range(4)] == [1.0, 0.1, 0.1, 0.01]
    # multi_step
    s = LRScheduler(MimrlConfig(lr_decrease="multi_step",
                                lr_decrease_iter="2-3", lr_decrease_rate=0.1))
    assert [round(s.step(), 4) for _ in range(4)] == [1.0, 0.1, 0.01, 0.01]
    # exp
    s = LRScheduler(MimrlConfig(lr_decrease="exp", lr_decrease_rate=0.5))
    assert [round(s.step(), 4) for _ in range(3)] == [0.5, 0.25, 0.125]
    # plateau (min mode for regression)
    s = LRScheduler(MimrlConfig(lr_decrease="plateau", lr_decrease_iter="1",
                                lr_decrease_rate=0.1, task="regression"))
    assert s.step(1.0) == 1.0   # first epoch sets best
    assert s.step(1.5) == 1.0   # bad 1
    assert s.step(1.5) == 0.1   # bad 2 > patience 1 -> decay
    assert s.step(0.5) == 0.1   # improvement resets


@pytest.mark.parametrize("optm", ["Adam", "SGD"])
def test_moment_dtype_bfloat16(optm):
    """--moment_dtype bfloat16 stores the first moment / momentum
    accumulator in bf16 (second moment stays f32) and still optimizes:
    a quadratic descends under repeated updates."""
    params = _toy_params()
    p_main, p_bert, p_vmi = partition_params(params)
    cfg = MimrlConfig(optm=optm, moment_dtype="bfloat16",
                      learning_rate=0.1, gradient_clip=0.0)
    opt = make_main_optimizer(cfg, p_main, p_bert)
    merged = merge_params(p_main, p_bert)
    state = opt.init(merged)

    leaves = jax.tree_util.tree_leaves(
        state, is_leaf=lambda x: isinstance(x, jnp.ndarray))
    dtypes = {jnp.dtype(l.dtype) for l in leaves
              if hasattr(l, "dtype") and l.ndim == 2}
    assert jnp.dtype(jnp.bfloat16) in dtypes
    if optm == "Adam":  # nu must stay f32
        assert jnp.dtype(jnp.float32) in dtypes

    def loss_fn(p):
        return sum(jnp.sum(l ** 2)
                   for l in jax.tree_util.tree_leaves(p)) / 2.0

    p = merged
    first = float(loss_fn(p))
    for _ in range(25):
        g = jax.grad(loss_fn)(p)
        upd, state = opt.update(g, state, p)
        p = optax.apply_updates(p, upd)
    assert float(loss_fn(p)) < first * 0.5


@pytest.mark.parametrize("clip,wd,moment_dtype", [
    (1.5, 0.0, "float32"),
    (0.0, 0.01, "float32"),
    (1.5, 0.01, "bfloat16"),
])
def test_fused_optim_matches_optax_chain(clip, wd, moment_dtype):
    """--fused_optim: the single-pass fused Adam must reproduce the
    optax chain's updates AND state (same structure for checkpoint
    round-trips) over several steps, for both optimizers."""
    kw = dict(learning_rate=0.05, bert_lr_rate=0.01, bert_freeze="part",
              gradient_clip=clip, weight_decay=wd, optm="Adam",
              moment_dtype=moment_dtype, mi_lr_rate=0.5)
    cfg_ref = MimrlConfig(fused_optim=False, **kw)
    cfg_fused = MimrlConfig(fused_optim=True, **kw)
    params = _toy_params()
    main, bert, vmi = partition_params(params)
    merged = merge_params(main, bert)

    for make, tree in ((lambda c: make_main_optimizer(c, main, bert),
                        merged),
                       (make_vmi_optimizer, vmi)):
        opt_r = make(cfg_ref)
        opt_f = make(cfg_fused)
        s_r = opt_r.init(tree)
        s_f = opt_f.init(tree)
        assert (jax.tree_util.tree_structure(s_r)
                == jax.tree_util.tree_structure(s_f))
        rng = np.random.default_rng(0)
        for step in range(3):
            grads = jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape, scale=2.0), p.dtype), tree)
            u_r, s_r = opt_r.update(grads, s_r, tree)
            u_f, s_f = opt_f.update(grads, s_f, tree)
            for (path, a), b in zip(
                    jax.tree_util.tree_flatten_with_path(u_r)[0],
                    jax.tree_util.tree_leaves(u_f)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-8,
                    err_msg=f"step {step} {jax.tree_util.keystr(path)}")
            for (path, a), b in zip(
                    jax.tree_util.tree_flatten_with_path(s_r)[0],
                    jax.tree_util.tree_leaves(s_f)):
                assert np.asarray(a).dtype == np.asarray(b).dtype, (
                    jax.tree_util.keystr(path))
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    rtol=2e-6, atol=1e-8,
                    err_msg=f"state step {step} {jax.tree_util.keystr(path)}")
