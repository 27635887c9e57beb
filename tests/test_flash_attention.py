"""Flash-attention kernel vs the XLA attention path (interpret mode).

The kernel (ops/pallas/flash_attention.py) must reproduce the XLA
lowering of BertSelfAttention's attention core exactly in deterministic
mode (fwd AND grads), and in dropout mode must (a) keep with probability
1-p, (b) be reproducible per seed, and (c) regenerate the SAME mask in
the backward kernel (checked via the v=I trick: with v=I the output IS
the dropped prob matrix, and d/dv sum(out) must equal its column sums).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.ops.pallas.flash_attention import flash_attention

BS, NH, T, HD = 3, 2, 16, 8


def _inputs(dtype=jnp.float32, t=T, hd=HD):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (BS, NH, t, hd), dtype)
    k = jax.random.normal(ks[1], (BS, NH, t, hd), dtype)
    v = jax.random.normal(ks[2], (BS, NH, t, hd), dtype)
    mask = (jax.random.uniform(ks[3], (BS, t)) > 0.25).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)  # at least one valid key
    bias = (1.0 - mask[:, None, None, :]) * jnp.float32(-1e9)
    return q, k, v, bias


def _xla_ref(q, k, v, bias):
    hd = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.float32(hd)) + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


SEED = jnp.array([11], jnp.int32)

# kernel strategy variants (round 5, ops/pallas/flash_attention.py):
# each must reproduce the XLA math; dropout streams are per-variant
VARIANTS = [("row", {}), ("batched", {"MIMRL_FA_ROWS": "3"}),
            ("batched", {"MIMRL_FA_ROWS": "1"}), ("bh", {})]


@pytest.fixture(params=VARIANTS, ids=lambda v: f"{v[0]}-{v[1]}")
def fa_variant(request, monkeypatch):
    name, extra = request.param
    monkeypatch.setenv("MIMRL_FA_VARIANT", name)
    for k, v in extra.items():
        monkeypatch.setenv(k, v)
    return name


def test_deterministic_matches_xla(fa_variant):
    q, k, v, bias = _inputs()
    out = flash_attention(q, k, v, bias, SEED, 0.0)
    ref = _xla_ref(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_deterministic_grads_match_xla(fa_variant):
    q, k, v, bias = _inputs()

    def loss_fa(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, SEED, 0.0) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_ref(q, k, v, bias) ** 2)

    g1 = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dropout_keep_rate_and_repro(fa_variant):
    q, k, v, bias = _inputs(t=32, hd=16)
    p = 0.5
    o1 = flash_attention(q, k, v, bias, SEED, p)
    o2 = flash_attention(q, k, v, bias, SEED, p)
    o3 = flash_attention(q, k, v, bias, jnp.array([12], jnp.int32), p)
    assert bool(jnp.all(o1 == o2))
    assert bool(jnp.any(o1 != o3))

    # keep rate: with v = I (T == hd), the output IS the dropped prob
    # matrix; its zero fraction ~ p (up to softmax zeros from masking)
    t = 16
    q2, k2, _, _ = _inputs(t=t, hd=t)
    bias0 = jnp.zeros((BS, 1, 1, t), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(t, dtype=q2.dtype), (BS, NH, t, t))
    pd = flash_attention(q2, k2, eye, bias0, SEED, p)
    drop_frac = float(jnp.mean((pd == 0.0).astype(jnp.float32)))
    assert 0.4 < drop_frac < 0.6

    # row sums of kept probs scale to ~1 in expectation
    sums = jnp.sum(pd, axis=-1)
    assert 0.8 < float(jnp.mean(sums)) < 1.2


def test_dropout_backward_uses_same_mask(fa_variant):
    """d/dv sum(Pd @ v) == column sums of Pd — only if the backward
    regenerates exactly the forward's mask."""
    t = 16
    q, k, _, _ = _inputs(t=t, hd=t)
    bias0 = jnp.zeros((BS, 1, 1, t), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(t, dtype=q.dtype), (BS, NH, t, t))
    p = 0.3
    pd = flash_attention(q, k, eye, bias0, SEED, p)  # [BS, NH, t, t] = Pd

    def f(v):
        return jnp.sum(flash_attention(q, k, v, bias0, SEED, p))

    gv = jax.grad(f)(eye)  # [k, d] rows: sum_q Pd[q, k], same for all d
    want = jnp.sum(pd, axis=2)[..., None] * jnp.ones((1, 1, 1, t))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_bert_flash_config_matches_xla_deterministic():
    """BertModel(flash_attn='on') == BertModel(flash_attn='off') in
    deterministic mode (interpret-mode kernel on CPU)."""
    import dataclasses

    from mimrl_tpu.models.bert import BertConfig, BertModel

    cfg = BertConfig.tiny()
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0,
                             cfg.vocab_size)
    types = jnp.zeros_like(ids)
    mask = jnp.ones_like(ids).astype(jnp.float32)
    m_off = BertModel(dataclasses.replace(cfg, flash_attn="off"))
    m_on = BertModel(dataclasses.replace(cfg, flash_attn="on"))
    params = m_off.init(jax.random.PRNGKey(1), ids, types, mask,
                        deterministic=True)
    o_off = m_off.apply(params, ids, types, mask, deterministic=True)
    o_on = m_on.apply(params, ids, types, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(o_on), np.asarray(o_off),
                               rtol=2e-5, atol=2e-5)


def test_bert_flash_train_mode_runs():
    """Training mode (dropout active) compiles and differs across rng."""
    import dataclasses

    from mimrl_tpu.models.bert import BertConfig, BertModel

    cfg = dataclasses.replace(BertConfig.tiny(), flash_attn="on")
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0,
                             cfg.vocab_size)
    types = jnp.zeros_like(ids)
    mask = jnp.ones_like(ids).astype(jnp.float32)
    m = BertModel(cfg)
    params = m.init(jax.random.PRNGKey(1), ids, types, mask,
                    deterministic=True)
    o1 = m.apply(params, ids, types, mask, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    o2 = m.apply(params, ids, types, mask, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(3)})
    assert o1.shape == o2.shape
    assert bool(jnp.any(o1 != o2))
    assert bool(jnp.all(jnp.isfinite(o1)))
