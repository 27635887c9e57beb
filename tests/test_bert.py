"""BERT implementation parity vs HuggingFace's torch BertModel built from
config (no pretrained download needed): identical weights must produce
identical last_hidden_state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimrl_tpu.models.bert import (
    BertConfig,
    BertModel,
    convert_hf_torch_state_dict,
)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig
    from transformers import BertModel as HFBert

    cfg = BertConfig(vocab_size=97, hidden_size=24, num_hidden_layers=3,
                     num_attention_heads=3, intermediate_size=48,
                     max_position_embeddings=32,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = HFBert(HFConfig(
        vocab_size=97, hidden_size=24, num_hidden_layers=3,
        num_attention_heads=3, intermediate_size=48,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0))
    hf.eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = convert_hf_torch_state_dict(sd, cfg)
    return cfg, hf, variables


def test_converted_weights_match_hf_outputs(hf_pair):
    import torch

    cfg, hf, variables = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0
    types = np.zeros((2, 10), np.int64)

    model = BertModel(cfg)
    ours = np.asarray(model.apply(
        variables, jnp.asarray(ids, jnp.int32), jnp.asarray(types, jnp.int32),
        jnp.asarray(mask, jnp.int32), deterministic=True))

    with torch.no_grad():
        theirs = hf(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask),
                    token_type_ids=torch.tensor(types))[0].numpy()

    # valid positions must match closely; padded positions are free to
    # differ (HF also computes them, same masking convention though)
    assert np.allclose(ours[0], theirs[0], atol=2e-4), (
        np.abs(ours[0] - theirs[0]).max())
    assert np.allclose(ours[1, :6], theirs[1, :6], atol=2e-4)


def test_bf16_close_to_f32(hf_pair):
    cfg, _, variables = hf_pair
    import dataclasses

    cfg16 = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 97, (2, 8)), jnp.int32)
    types = jnp.zeros((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)

    y32 = np.asarray(BertModel(cfg).apply(variables, ids, types, mask))
    y16 = np.asarray(BertModel(cfg16).apply(variables, ids, types, mask))
    assert y16.dtype == np.float32  # output cast back
    rel = np.abs(y32 - y16).mean() / (np.abs(y32).mean() + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.parametrize("knobs", [
    dict(attn_fold_transpose=True),
    dict(ffn_gelu_remat=True),
    dict(attn_remat=True),
    dict(layer_remat="dots"),
    dict(layer_remat="full"),
    dict(attn_fold_transpose=True, layer_remat="dots",
         ffn_gelu_remat=True),
])
def test_perf_knobs_preserve_forward_and_grads(knobs):
    """The layout/remat perf knobs (BENCH_ATTN_FOLD / BENCH_*_REMAT in
    __graft_entry__._build) must be pure performance knobs: identical
    forward values and parameter gradients vs the default path."""
    base = BertConfig(vocab_size=53, hidden_size=16, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=32)
    tuned = base.replace(**knobs) if hasattr(base, "replace") else None
    if tuned is None:
        import dataclasses
        tuned = dataclasses.replace(base, **knobs)

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 53, (2, 12)), jnp.int32)
    types = jnp.zeros((2, 12), jnp.int32)
    mask_np = np.ones((2, 12), np.int32)
    mask_np[1, 8:] = 0
    mask = jnp.asarray(mask_np)

    variables = BertModel(base).init(
        {"params": jax.random.PRNGKey(0)}, ids, types, mask,
        deterministic=True)

    def loss(cfg):
        def f(params):
            out = BertModel(cfg).apply({"params": params}, ids, types,
                                       mask, deterministic=True)
            return jnp.sum(out ** 2)
        return f

    f_base, f_tuned = loss(base), loss(tuned)
    v_base, g_base = jax.value_and_grad(f_base)(variables["params"])
    v_tuned, g_tuned = jax.value_and_grad(f_tuned)(variables["params"])
    assert np.allclose(float(v_base), float(v_tuned), rtol=1e-6)
    flat_b = jax.tree_util.tree_leaves_with_path(g_base)
    flat_t = dict(jax.tree_util.tree_leaves_with_path(g_tuned))
    for path, leaf in flat_b:
        other = flat_t[path]
        assert np.allclose(np.asarray(leaf), np.asarray(other),
                           atol=1e-5), (path,
                                        np.abs(leaf - other).max())
