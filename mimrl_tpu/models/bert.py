"""BERT text extractor (flax).

The reference loads HuggingFace `bert-base-uncased`
(ref: Model.py:243-244). This is a from-scratch flax implementation of
the same architecture (identical parameter shapes / layout semantics), so
the framework runs hermetically with random init and can load pretrained
weights the user supplies:

- `load_bert_weights(path)` accepts a `.npz` of flattened params or a
  HuggingFace PyTorch `pytorch_model.bin` (converted through
  `convert_hf_torch_state_dict`).

Only `last_hidden_state` is consumed downstream (ref: Model.py:391 takes
``[0]``), so pooler weights are optional.

TPU notes: attention is batched MXU matmuls over static
``[bs, time_len]`` shapes; additive masking uses a large negative instead
of -inf so bf16 stays finite.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    # matmul compute dtype; params stay float32, LayerNorm/softmax run in
    # float32 (the standard TPU mixed-precision recipe)
    dtype: Any = jnp.float32
    # int8 quantized dense GEMMs (ops/quant.py): 'none' | 'int8_fwd'
    # (forward only) | 'int8' (+ int8 weight grads) | 'int8_all'
    # (+ int8 activation grads). The four dense matmuls per layer are
    # 98% of layer FLOPs and run at 2x bf16 rate on the MXU in int8.
    quant: str = "none"
    # fused Pallas attention kernel (ops/pallas/flash_attention.py):
    # 'on' | 'off' | 'auto' (= ON on TPU since round 5 — measured
    # +3.2% train-step at T=100 and +31.5% at T=150 with the batched
    # kernel variant; the earlier "break-even" A/Bs never engaged the
    # kernel, see _resolve_flash). 'auto' stays off on CPU (interpret
    # emulation) and under sequence sharding — GSPMD cannot partition
    # through a pallas_call.
    flash_attn: str = "auto"
    # keep q/k/v in [bs, T, nh, hd] layout and fold the head transposes
    # into the attention dot_generals instead of materializing
    # [bs, nh, T, hd] copies (the transposes cost ~4 ms/step at canonical
    # shapes — profiler category 'data formatting')
    attn_fold_transpose: bool = False
    # recompute gelu in the backward instead of saving BOTH the pre- and
    # post-activation [bs, T, 4H] tensors as residuals
    ffn_gelu_remat: bool = False
    # rematerialize the attention core (QK^T/softmax/dropout) in the
    # backward instead of saving the [bs, nh, T, T] prob tensors
    attn_remat: bool = False
    # whole-layer rematerialization policy: 'none' | 'dots' (save only
    # matmul outputs; recompute LayerNorm/softmax/gelu/dropout masks in
    # the backward — drops the u32 mask + f32 prob residual traffic) |
    # 'full' (save nothing per layer)
    layer_remat: str = "none"
    # Megatron-style sequence parallelism: a NamedSharding for the
    # [bs, T, H] inter-layer activations (time axis sharded over the
    # tensor-parallel mesh axis, e.g. P('data', 'model', None)). GSPMD
    # re-gathers the time axis for attention and scatters it back for the
    # per-token LayerNorm/dropout/FFN region, so those run on 1/TP of the
    # sequence per device. None = no constraint (single-axis layouts).
    seq_sharding: Any = None

    @classmethod
    def tiny(cls) -> "BertConfig":
        """Small config for tests."""
        return cls(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=2, intermediate_size=64,
                   max_position_embeddings=64)


class BertEmbeddings(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic=True):
        c = self.config
        T = input_ids.shape[1]
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(T)[None, :]
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       dtype=c.dtype, name="position_embeddings")(pos_ids)
        tok = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=c.dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = word + pos + tok
        if c.seq_sharding is not None:
            # pin the gather output to the inter-layer activation layout
            # up front: without this GSPMD picks a conflicting
            # intermediate sharding for the embedding lookup and then
            # "involuntarily fully rematerializes" (replicate +
            # repartition) to reach the seq-parallel layout
            x = jax.lax.with_sharding_constraint(x, c.seq_sharding)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         dtype=jnp.promote_types(c.dtype, jnp.float32),
                         name="layer_norm")(x).astype(c.dtype)
        return nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)


def _resolve_flash(c: "BertConfig") -> bool:
    """'auto' resolves to ON on TPU since round 5: the round-2/4
    "break-even" A/Bs compared base against ITSELF (BENCH_FLASH_ATTN=1
    leaked the raw env string into this config, where only "on"
    engages — see __graft_entry__). Measured with the kernel actually
    on (batched variant, tools/fa_tune.py + tools/knob_sweep.py):
    train_step 89.5->86.7 ms at MOSI T=100 (+3.2%), 178.7->135.9 ms at
    AVEC T=150 (+31.5%). Resolves to off on CPU (interpret mode is
    emulation; tests keep XLA semantics) and under sequence sharding
    (GSPMD cannot shard through a custom call)."""
    if c.flash_attn not in ("auto", "on", "off"):
        raise ValueError(
            f"BertConfig.flash_attn={c.flash_attn!r} (want auto|on|off) — "
            "an unknown value would silently disable the kernel")
    if c.flash_attn == "off" or c.seq_sharding is not None:
        return False
    if c.flash_attn == "on":
        return True
    return jax.default_backend() == "tpu"


class BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        c = self.config
        H, nh = c.hidden_size, c.num_attention_heads
        hd = H // nh
        bs, T, _ = x.shape

        from mimrl_tpu.ops.quant import make_dense

        # fused QKV projection: one [H, 3H] MXU matmul instead of three
        qkv = make_dense(c.quant, 3 * H, c.dtype, "qkv")(x)
        q3, k3, v3 = jnp.split(qkv, 3, axis=-1)  # [bs, T, H]
        p_rate = float(c.attention_probs_dropout_prob)
        dropping = (not deterministic) and p_rate > 0.0

        if _resolve_flash(c):
            q, k, v = (y.reshape(bs, T, nh, hd).transpose(0, 2, 1, 3)
                       for y in (q3, k3, v3))
            from mimrl_tpu.ops.pallas.flash_attention import flash_attention

            if dropping:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2**31 - 1,
                    dtype=jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            ctx = flash_attention(q, k, v, attn_bias, seed,
                                  p_rate if dropping else 0.0)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(bs, T, H)
        else:
            key = self.make_rng("dropout") if dropping else None
            fold = c.attn_fold_transpose

            def core(q, k, v):
                if fold:  # q/k/v [bs, T, nh, hd]: heads stay in place
                    scores = jnp.einsum(
                        "bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.promote_types(
                            c.dtype, jnp.float32))
                else:     # q/k/v [bs, nh, T, hd]
                    scores = jnp.einsum(
                        "bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.promote_types(
                            c.dtype, jnp.float32))
                scores = scores / jnp.sqrt(
                    scores.dtype.type(hd)) + attn_bias
                probs = jax.nn.softmax(scores, axis=-1)  # float32
                if key is not None:
                    keep = jax.random.bernoulli(key, 1.0 - p_rate,
                                                probs.shape)
                    probs = jnp.where(keep, probs / (1.0 - p_rate), 0.0)
                if fold:
                    return jnp.einsum(
                        "bhqk,bkhd->bqhd", probs.astype(c.dtype), v,
                        preferred_element_type=jnp.promote_types(
                            c.dtype, jnp.float32))
                return jnp.einsum(
                    "bhqk,bhkd->bhqd", probs.astype(c.dtype), v,
                    preferred_element_type=jnp.promote_types(
                        c.dtype, jnp.float32))

            if c.attn_remat:
                core = jax.checkpoint(core)
            if fold:
                q, k, v = (y.reshape(bs, T, nh, hd) for y in (q3, k3, v3))
                ctx = core(q, k, v).reshape(bs, T, H)
            else:
                q, k, v = (y.reshape(bs, T, nh, hd).transpose(0, 2, 1, 3)
                           for y in (q3, k3, v3))
                ctx = core(q, k, v).transpose(0, 2, 1, 3).reshape(bs, T, H)
        ctx = ctx.astype(c.dtype)
        out = make_dense(c.quant, H, c.dtype, "output_dense")(ctx)
        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            dtype=jnp.promote_types(c.dtype, jnp.float32),
                            name="output_layer_norm")(
            out + x).astype(c.dtype)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        from mimrl_tpu.ops.quant import make_dense

        c = self.config
        x = BertSelfAttention(c, name="attention")(x, attn_bias, deterministic)
        h = make_dense(c.quant, c.intermediate_size, c.dtype,
                       "intermediate_dense")(x)
        if c.ffn_gelu_remat:
            # save only the pre-activation [bs, T, 4H]; the XLA default
            # saves BOTH pre- and post-gelu tensors as residuals
            h = jax.checkpoint(lambda t: jax.nn.gelu(t, approximate=False))(h)
        else:
            h = jax.nn.gelu(h, approximate=False)
        h = make_dense(c.quant, c.hidden_size, c.dtype, "output_dense")(h)
        h = nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps,
                            dtype=jnp.promote_types(c.dtype, jnp.float32),
                            name="output_layer_norm")(
            h + x).astype(c.dtype)


class BertModel(nn.Module):
    """Returns last_hidden_state [bs, T, hidden]."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, attention_mask,
                 deterministic=True):
        c = self.config
        x = BertEmbeddings(c, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        # additive bias: 0 for valid, large negative for padding
        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
        attn_bias = attn_bias * jnp.float32(-1e9)
        if c.layer_remat == "none":
            layer_cls = BertLayer
        else:
            policy = {
                "dots": jax.checkpoint_policies.dots_saveable,
                "full": jax.checkpoint_policies.nothing_saveable,
            }[c.layer_remat]
            # arg 0 is the module instance; 3 = `deterministic`
            layer_cls = nn.remat(BertLayer, policy=policy,
                                 static_argnums=(3,))
        for i in range(c.num_hidden_layers):
            if c.seq_sharding is not None:
                x = jax.lax.with_sharding_constraint(x, c.seq_sharding)
            x = layer_cls(c, name=f"layer_{i}")(x, attn_bias, deterministic)
        # downstream projection/W_t and summary means run in float32
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

_HF_MAP = {
    # hf torch name fragment -> flax path fragments
    "embeddings.word_embeddings.weight": ("embeddings", "word_embeddings", "embedding"),
    "embeddings.position_embeddings.weight": ("embeddings", "position_embeddings", "embedding"),
    "embeddings.token_type_embeddings.weight": ("embeddings", "token_type_embeddings", "embedding"),
    "embeddings.LayerNorm.weight": ("embeddings", "layer_norm", "scale"),
    "embeddings.LayerNorm.bias": ("embeddings", "layer_norm", "bias"),
}


def _layer_map(i: int) -> Dict[str, tuple]:
    p = f"encoder.layer.{i}."
    f = (f"layer_{i}",)
    return {
        p + "attention.output.dense.weight": f + ("attention", "output_dense", "kernel"),
        p + "attention.output.dense.bias": f + ("attention", "output_dense", "bias"),
        p + "attention.output.LayerNorm.weight": f + ("attention", "output_layer_norm", "scale"),
        p + "attention.output.LayerNorm.bias": f + ("attention", "output_layer_norm", "bias"),
        p + "intermediate.dense.weight": f + ("intermediate_dense", "kernel"),
        p + "intermediate.dense.bias": f + ("intermediate_dense", "bias"),
        p + "output.dense.weight": f + ("output_dense", "kernel"),
        p + "output.dense.bias": f + ("output_dense", "bias"),
        p + "output.LayerNorm.weight": f + ("output_layer_norm", "scale"),
        p + "output.LayerNorm.bias": f + ("output_layer_norm", "bias"),
    }


def convert_hf_torch_state_dict(state_dict: Dict[str, Any],
                                config: BertConfig) -> Dict:
    """Convert a HuggingFace BertModel torch state_dict (numpy-able
    tensors) to this module's flax params tree. Linear weights are
    transposed (torch stores [out, in], flax Dense stores [in, out])."""
    mapping = dict(_HF_MAP)
    for i in range(config.num_hidden_layers):
        mapping.update(_layer_map(i))

    def fetch(torch_name):
        for cand in (torch_name, "bert." + torch_name):
            if cand in state_dict:
                return np.asarray(state_dict[cand])
        raise KeyError(f"missing weight: {torch_name}")

    params: Dict = {}
    for torch_name, flax_path in mapping.items():
        tensor = fetch(torch_name)
        if flax_path[-1] == "kernel":
            tensor = tensor.T
        node = params
        for k in flax_path[:-1]:
            node = node.setdefault(k, {})
        node[flax_path[-1]] = jnp.asarray(tensor)

    # fused QKV: concat torch's separate q/k/v projections
    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}.attention.self."
        kernel = np.concatenate(
            [fetch(p + f"{n}.weight").T for n in ("query", "key", "value")],
            axis=1)
        bias = np.concatenate(
            [fetch(p + f"{n}.bias") for n in ("query", "key", "value")])
        node = params[f"layer_{i}"].setdefault("attention", {})
        node["qkv"] = {"kernel": jnp.asarray(kernel),
                       "bias": jnp.asarray(bias)}
    return {"params": params}


def load_bert_weights(path: str, config: BertConfig) -> Dict:
    """Load BERT params from `.npz` (flattened 'a/b/c' keys) or a torch
    checkpoint file."""
    if path.endswith(".npz"):
        flat = np.load(path)
        params: Dict = {}
        for key in flat.files:
            node = params
            parts = key.split("/")
            for k in parts[:-1]:
                node = node.setdefault(k, {})
            node[parts[-1]] = jnp.asarray(flat[key])
        return {"params": params}
    # torch checkpoint
    import torch  # CPU torch is available in the environment

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_hf_torch_state_dict(sd, config)
