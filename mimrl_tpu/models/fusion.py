"""Alternative fusion encoders.

The reference states its fusion encoder is replaceable ("you could
simply replace the fusion encoders such as TFN or TensorFormer",
ref: README.md:13) but only ships CubeMLP. This module provides the
TPU-native alternatives:

- `TransformerFusion`: pre-LN transformer over the (time x modality)
  token grid — [bs, T, K, d] -> T*K tokens with learned time+modality
  embeddings -> N self-attention blocks -> reshaped back to
  [bs, T, K, d], so the composition/classifier stage and the MI
  estimator bank are unchanged.
- `TFNFusion`: Tensor Fusion Network-style outer-product fusion
  (Zadeh et al. 2017) in factorized low-rank form (full K-way outer
  products are O(d^3); the low-rank form is MXU-friendly rank-R
  projections). Emits [bs, T, K, d] by broadcasting the fused vector so
  the downstream contract is identical.
- `MoEFusion`: mixture-of-experts FFN blocks over the token grid with
  top-k routing. Expert weights carry a leading [E, ...] axis that
  shards over the mesh `model` axis (expert parallelism): pass
  `ep_sharding` (a NamedSharding for the [E, bs, S, h] expert
  activations) and GSPMD partitions expert compute across devices.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class _FusionBlock(nn.Module):
    d_model: int
    num_heads: int
    dropout: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = nn.LayerNorm(name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout,
            deterministic=deterministic, name="attn")(h, h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.d_model * 4, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, name="fc2")(h)
        return x + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class TransformerFusion(nn.Module):
    """Pre-LN transformer over the T*K token grid; shape-preserving."""

    d_model: int
    time_len: int
    n_modalities: int = 3
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None,
                 deterministic: bool = True) -> Array:
        bs, T, K, d = x.shape
        tokens = x.reshape(bs, T * K, d)
        # factored position embeddings: time + modality
        pos_t = self.param("pos_time", nn.initializers.normal(0.02),
                           (self.time_len, 1, d))
        pos_k = self.param("pos_modality", nn.initializers.normal(0.02),
                           (1, self.n_modalities, d))
        tokens = tokens + (pos_t[:T] + pos_k).reshape(1, T * K, d)
        for i in range(self.num_layers):
            tokens = _FusionBlock(self.d_model, self.num_heads, self.dropout,
                                  name=f"block_{i}")(tokens, deterministic)
        tokens = nn.LayerNorm(name="ln_out")(tokens)
        return tokens.reshape(bs, T, K, d)


class TFNFusion(nn.Module):
    """Low-rank Tensor Fusion: per-timestep factorized K-way outer
    product. rank-R approximation keeps it at R MXU matmuls per
    modality instead of a d^K tensor."""

    d_model: int
    rank: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None,
                 deterministic: bool = True) -> Array:
        bs, T, K, d = x.shape
        # append the constant-1 channel of classic TFN via bias=True
        factors = []
        for k in range(K):
            f = nn.Dense(self.rank * self.d_model, use_bias=True,
                         name=f"factor_{k}")(x[:, :, k, :])
            factors.append(f.reshape(bs, T, self.rank, self.d_model))
        fused = factors[0]
        for f in factors[1:]:
            fused = fused * f  # elementwise product = low-rank outer fusion
        fused = jnp.sum(fused, axis=2)  # [bs, T, d_model]
        fused = nn.Dropout(self.dropout)(fused, deterministic=deterministic)
        fused = nn.LayerNorm(name="ln_out")(fused)
        # broadcast back over the modality axis to keep the downstream
        # [bs, T, K, d] contract (compose + MI bank unchanged)
        return jnp.broadcast_to(fused[:, :, None, :], (bs, T, K,
                                                       self.d_model))


class _MoEBlock(nn.Module):
    """Pre-LN MoE FFN block: router -> top-k gated expert MLPs.

    Dense-dispatch formulation (every expert sees every token, outputs
    weighted by the gate, zero for unrouted pairs): no gather/scatter or
    dynamic shapes, so XLA tiles everything onto the MXU, and the [E,...]
    expert axis of both weights and activations shards cleanly over the
    mesh for expert parallelism. At fusion-encoder scale the dense
    formulation's extra FLOPs are cheaper than dynamic dispatch on TPU.
    """

    d_model: int
    num_experts: int
    top_k: int
    dropout: float
    ep_sharding: Any = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        E, d = self.num_experts, self.d_model
        hidden = d * 2
        h = nn.LayerNorm(name="ln")(x)  # [bs, S, d]

        # router (float32 softmax for stability). Gating masks from the
        # top_k *indices* (one-hot), not a >=threshold compare: ties and
        # the exactly-uniform logits of padded/zero tokens would activate
        # more than top_k experts under a threshold rule.
        logits = nn.Dense(E, use_bias=False, name="router")(h)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        _, top_idx = jax.lax.top_k(probs, self.top_k)
        sel = jnp.sum(jax.nn.one_hot(top_idx, E, dtype=probs.dtype), axis=-2)
        gates = probs * sel
        gates = gates / (jnp.sum(gates, axis=-1, keepdims=True) + 1e-9)

        w1 = self.param("w1", nn.initializers.lecun_normal(), (E, d, hidden))
        b1 = self.param("b1", nn.initializers.zeros, (E, hidden))
        w2 = self.param("w2", nn.initializers.lecun_normal(), (E, hidden, d))
        b2 = self.param("b2", nn.initializers.zeros, (E, d))

        he = jnp.einsum("bsd,edh->ebsh", h, w1) + b1[:, None, None, :]
        if self.ep_sharding is not None:
            he = jax.lax.with_sharding_constraint(he, self.ep_sharding)
        he = jax.nn.gelu(he, approximate=True)
        oe = jnp.einsum("ebsh,ehd->ebsd", he, w2) + b2[:, None, None, :]
        out = jnp.einsum("ebsd,bse->bsd", oe, gates.astype(oe.dtype))
        return x + nn.Dropout(self.dropout)(out, deterministic=deterministic)


class MoEFusion(nn.Module):
    """Shape-preserving MoE fusion over the T*K token grid (beyond the
    reference: expert-parallel capacity scaling for the fusion stage)."""

    d_model: int
    time_len: int
    n_modalities: int = 3
    num_layers: int = 2
    num_heads: int = 4  # attention heads for the mixing block
    num_experts: int = 4
    top_k: int = 2
    dropout: float = 0.1
    ep_sharding: Any = None

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None,
                 deterministic: bool = True) -> Array:
        bs, T, K, d = x.shape
        tokens = x.reshape(bs, T * K, d)
        pos_t = self.param("pos_time", nn.initializers.normal(0.02),
                           (self.time_len, 1, d))
        pos_k = self.param("pos_modality", nn.initializers.normal(0.02),
                           (1, self.n_modalities, d))
        tokens = tokens + (pos_t[:T] + pos_k).reshape(1, T * K, d)
        for i in range(self.num_layers):
            # token mixing (attention), then MoE channel expansion
            h = nn.LayerNorm(name=f"attn_ln_{i}")(tokens)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dropout_rate=self.dropout,
                deterministic=deterministic, name=f"attn_{i}")(h, h)
            tokens = tokens + nn.Dropout(self.dropout)(
                h, deterministic=deterministic)
            tokens = _MoEBlock(
                self.d_model, self.num_experts, self.top_k, self.dropout,
                ep_sharding=self.ep_sharding, name=f"moe_{i}")(
                tokens, deterministic)
        tokens = nn.LayerNorm(name="ln_out")(tokens)
        return tokens.reshape(bs, T, K, d)
