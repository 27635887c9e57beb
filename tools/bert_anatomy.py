"""Attribute BERT layer-stack cost to op classes, on-chip.

The step ablation (tools/ablate_step.py) shows the canonical train_step
is ~90% BERT tower (fwd 30.8 ms / bwd 43 ms at bs=128, T=100), while the
pure-GEMM lower bound for the same shapes is far less — so the headroom
is in the NON-GEMM ops. This tool times a skeleton BERT encoder stack
(same GEMM sequence and shapes as models/bert.py, dummy weights) with
each op class toggled, in ONE process:

  gemm_only     — the 4 dense matmuls/layer + attention batch matmuls,
                  no LN / softmax / gelu / dropout (identity epilogues)
  +softmax_f32  — attention softmax in f32 (the production choice)
  +softmax_bf16 — same but scores/softmax kept bf16
  +gelu_erf     — exact-erf gelu on the FFN (production)
  +gelu_tanh    — tanh-approx gelu
  +layernorm    — the two f32 LayerNorms per layer
  +dropout      — the three dropouts per layer (rbg key)
  full          — everything on (== production math)

Each variant is timed fwd and fwd+bwd; successive diffs attribute the
cost. Usage: /opt/venv/bin/python tools/bert_anatomy.py
Env: BENCH_BS, BENCH_TIME_LEN, BENCH_LAYERS, BENCH_STEPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    bs = int(os.environ.get("BENCH_BS", 128))
    T = int(os.environ.get("BENCH_TIME_LEN", 100))
    L = int(os.environ.get("BENCH_LAYERS", 12))
    iters = int(os.environ.get("BENCH_STEPS", 20))
    H, nh, F = 768, 12, 3072
    hd = H // nh
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape) * 0.02, dt)

    params = [{
        "qkv": mk(H, 3 * H), "qkv_b": mk(3 * H),
        "attn_out": mk(H, H), "attn_out_b": mk(H),
        "ffn_up": mk(H, F), "ffn_up_b": mk(F),
        "ffn_down": mk(F, H), "ffn_down_b": mk(H),
        "ln1_s": jnp.ones((H,), jnp.float32),
        "ln1_b": jnp.zeros((H,), jnp.float32),
        "ln2_s": jnp.ones((H,), jnp.float32),
        "ln2_b": jnp.zeros((H,), jnp.float32),
    } for _ in range(L)]
    x0 = mk(bs, T, H)
    key = jax.random.key(0, impl="rbg")

    def layer(x, p, k, *, softmax, gelu, ln, dropout):
        def maybe_drop(h, kk, rate=0.1):
            if not dropout:
                return h
            keep = jax.random.bernoulli(kk, 1.0 - rate, h.shape)
            return jnp.where(keep, h / (1.0 - rate), jnp.zeros_like(h))

        def maybe_ln(h, s, b):
            if not ln:
                return h
            h32 = h.astype(jnp.float32)
            mu = jnp.mean(h32, axis=-1, keepdims=True)
            var = jnp.var(h32, axis=-1, keepdims=True)
            return ((h32 - mu) * jax.lax.rsqrt(var + 1e-12) * s + b
                    ).astype(dt)

        k1, k2, k3 = jax.random.split(k, 3)
        qkv = jnp.dot(x, p["qkv"], preferred_element_type=jnp.float32
                      ).astype(dt) + p["qkv_b"]
        q, kk_, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bs, T, nh, hd).transpose(0, 2, 1, 3)
        kk_ = kk_.reshape(bs, T, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bs, T, nh, hd).transpose(0, 2, 1, 3)
        if softmax == "f32":
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, kk_,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(scores / np.sqrt(hd), axis=-1)
            probs = maybe_drop(probs, k1).astype(dt)
        elif softmax == "bf16":
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, kk_)
            probs = jax.nn.softmax(scores / np.sqrt(hd), axis=-1)
            probs = maybe_drop(probs, k1)
        else:  # off: skip softmax entirely, keep the two batch matmuls
            probs = jnp.einsum("bhqd,bhkd->bhqk", q, kk_).astype(dt)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(dt)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bs, T, H)
        a = jnp.dot(ctx, p["attn_out"], preferred_element_type=jnp.float32
                    ).astype(dt) + p["attn_out_b"]
        a = maybe_drop(a, k2)
        x = maybe_ln(a + x, p["ln1_s"], p["ln1_b"])
        h = jnp.dot(x, p["ffn_up"], preferred_element_type=jnp.float32
                    ).astype(dt) + p["ffn_up_b"]
        if gelu == "erf":
            h = jax.nn.gelu(h, approximate=False)
        elif gelu == "tanh":
            h = jax.nn.gelu(h, approximate=True)
        h = jnp.dot(h, p["ffn_down"], preferred_element_type=jnp.float32
                    ).astype(dt) + p["ffn_down_b"]
        h = maybe_drop(h, k3)
        return maybe_ln(h + x, p["ln2_s"], p["ln2_b"])

    def stack_loss(params, x, **kw):
        for i, p in enumerate(params):
            x = layer(x, p, jax.random.fold_in(key, i), **kw)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    def timeit(scalar_fn):
        """Time `iters` data-dependent repetitions of scalar_fn(params, x)
        inside ONE jitted fori_loop. Dispatch-loop timing is useless here:
        the axon runtime elides repeated identical dispatches (a 12-layer
        GEMM stack "measured" 0.12 ms). Chaining the scalar output into x
        forces every iteration to execute."""

        def chained(params, x):
            def body(_, carry):
                x = carry
                s = scalar_fn(params, x)
                patch = (s * 1e-20).astype(x.dtype).reshape((1, 1, 1))
                return jax.lax.dynamic_update_slice(x, patch, (0, 0, 0))

            return jax.lax.fori_loop(0, iters, body, x)

        g = jax.jit(chained)
        jax.block_until_ready(g(params, x0))
        t0 = time.perf_counter()
        jax.block_until_ready(g(params, x0))
        return (time.perf_counter() - t0) / iters * 1e3

    def keep(g):
        return sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g))

    variants = {
        "gemm_only": dict(softmax="off", gelu="off", ln=False, dropout=False),
        "softmax_f32": dict(softmax="f32", gelu="off", ln=False, dropout=False),
        "softmax_bf16": dict(softmax="bf16", gelu="off", ln=False, dropout=False),
        "gelu_erf": dict(softmax="off", gelu="erf", ln=False, dropout=False),
        "gelu_tanh": dict(softmax="off", gelu="tanh", ln=False, dropout=False),
        "layernorm": dict(softmax="off", gelu="off", ln=True, dropout=False),
        "dropout": dict(softmax="off", gelu="off", ln=False, dropout=True),
        "full_erf": dict(softmax="f32", gelu="erf", ln=True, dropout=True),
        "full_tanh": dict(softmax="f32", gelu="tanh", ln=True, dropout=True),
        "full_nodrop": dict(softmax="f32", gelu="erf", ln=True, dropout=False),
    }
    only = os.environ.get("VARIANTS")
    if only:
        variants = {k: variants[k] for k in only.split(",")}

    for name, kw in variants.items():
        fwd = timeit(lambda p, x, kw=kw: stack_loss(p, x, **kw))
        both = timeit(lambda p, x, kw=kw: keep(jax.grad(
            lambda pp: stack_loss(pp, x, **kw))(p)))
        print(json.dumps({"variant": name, "fwd_ms": round(fwd, 2),
                          "fwd+bwd_ms": round(both, 2),
                          "bwd_ms": round(both - fwd, 2)}), flush=True)


if __name__ == "__main__":
    main()
