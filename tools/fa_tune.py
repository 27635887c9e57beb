"""Tune the Pallas flash-attention kernel at a given (bs, nh, T, hd).

Round-4 found the kernel break-even with XLA's unfused attention at
AVEC shapes (T=150, docs/KNOB_SWEEP_avec.json) — untuned: one program
per batch row with a PYTHON LOOP over the 12 heads, i.e. 12 serial
[150, 64] x [64, 150] dots per program, each lane-padded 150->256.
This benchmarks the kernel STRATEGY variants (MIMRL_FA_VARIANT /
MIMRL_FA_ROWS, ops/pallas/flash_attention.py) against each other and
against the XLA lowering of the same math (the `fold` einsum path of
models/bert.py::BertSelfAttention):

  xla            einsum scores -> softmax -> dropout -> einsum (XLA fusion)
  row            per-batch-row program, Python head loop   (round-2 kernel)
  batched_r{R}   R rows/program, ONE (R, nh)-batch dot_general
  bh             grid (bs, nh), one program per (row, head)

Timing: device-side lax.scan of ITERS dependent applications (carry
feeds the next iteration's q so nothing hoists), forward-only and
fwd+bwd (jax.grad through the custom VJP), dropout ON (training
configuration) and OFF (eval). Reports ms per application and the
implied share of a 12-layer BERT step.

Usage:  python tools/fa_tune.py [--T 150] [--iters 30] \
            [--out docs/FA_TUNE_avec.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_xla_attn(nh, hd, p_rate):
    import jax
    import jax.numpy as jnp

    scale = 1.0 / (hd ** 0.5)

    def attn(q, k, v, bias, key):
        # mirrors models/bert.py BertSelfAttention fold path (bf16 in,
        # f32 scores/softmax), hardware-RNG dropout like --rng_impl rbg
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * scale + bias
        probs = jax.nn.softmax(scores, axis=-1)
        if p_rate > 0.0:
            keep = jax.random.bernoulli(key, 1.0 - p_rate, probs.shape)
            probs = jnp.where(keep, probs / (1.0 - p_rate), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    return attn


def time_variant(name, env, use_kernel, shapes, p_rate, iters, mode):
    """Returns ms/application or None (compile failure)."""
    for k, v in env.items():
        os.environ[k] = v
    import jax
    import jax.numpy as jnp

    bs, nh, T, hd = shapes
    key = jax.random.PRNGKey(0)
    qk, kk, vk = jax.random.split(key, 3)
    q = jax.random.normal(qk, (bs, nh, T, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (bs, nh, T, hd), jnp.bfloat16)
    v = jax.random.normal(vk, (bs, nh, T, hd), jnp.bfloat16)
    bias = jnp.zeros((bs, 1, 1, T), jnp.float32)
    seed = jnp.array([7], jnp.int32)

    if use_kernel:
        from mimrl_tpu.ops.pallas import flash_attention as fa_mod
        # env is read at trace time; jit below re-traces per variant
        # because each call builds a fresh closure

        def apply(qx):
            return fa_mod.flash_attention(qx, k, v, bias, seed, p_rate)
    else:
        xla = build_xla_attn(nh, hd, p_rate)
        # rbg like the production solver (--rng_impl rbg): threefry
        # dropout-mask generation would inflate the XLA cell by the
        # very cost the solver already removed
        dkey = jax.random.key(3, impl="rbg")

        def apply(qx):
            return xla(qx, k, v, bias, dkey)

    if mode == "fwd":
        def body(qc, _):
            o = apply(qc)
            return (qc + o.astype(jnp.float32) * 1e-3).astype(qc.dtype), ()
    else:
        def loss(qx):
            return jnp.sum(apply(qx).astype(jnp.float32) ** 2) * 1e-6

        gfn = jax.grad(loss)

        def body(qc, _):
            g = gfn(qc)
            return (qc + g.astype(jnp.float32) * 1e-3).astype(qc.dtype), ()

    @jax.jit
    def run(q0):
        qn, _ = jax.lax.scan(body, q0, None, length=iters)
        return qn

    try:
        out = run(q)  # compile + 1st run
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(q)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        if not bool(jnp.all(jnp.isfinite(out.astype(jnp.float32)))):
            return None, "nonfinite"
        return ms, None
    except Exception as e:  # Mosaic/VMEM failures are data, not crashes
        return None, f"{type(e).__name__}: {str(e)[:200]}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--nh", type=int, default=12)
    ap.add_argument("--T", type=int, default=150)
    ap.add_argument("--hd", type=int, default=64)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rows", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--train_only", action="store_true",
                    help="only the fwd+bwd dropout-on (training) cells")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    shapes = (args.bs, args.nh, args.T, args.hd)
    variants = [("xla", {}, False)]
    variants += [("row", {"MIMRL_FA_VARIANT": "row"}, True)]
    variants += [(f"batched_r{r}",
                  {"MIMRL_FA_VARIANT": "batched", "MIMRL_FA_ROWS": str(r)},
                  True) for r in args.rows]
    variants += [("bh", {"MIMRL_FA_VARIANT": "bh"}, True)]

    results = {"shapes": {"bs": args.bs, "nh": args.nh, "T": args.T,
                          "hd": args.hd}, "iters": args.iters,
               "dropout": args.dropout, "cells": {}}
    for mode in ("fwd", "fwdbwd"):
        for p_label, p in (("drop", args.dropout), ("nodrop", 0.0)):
            if args.train_only and not (mode == "fwdbwd"
                                        and p_label == "drop"):
                continue
            for name, env, use_k in variants:
                cell = f"{name}/{mode}/{p_label}"
                ms, err = time_variant(name, env, use_k, shapes, p,
                                       args.iters, mode)
                results["cells"][cell] = (
                    {"ms": round(ms, 4)} if ms is not None
                    else {"error": err})
                print(f"[fa_tune] {cell}: "
                      f"{ms if ms is None else round(ms, 4)} ms"
                      f"{'' if not err else ' ERR ' + err}", flush=True)

    # ranked summary for the training cell (fwd+bwd, dropout on)
    train = {k.split("/")[0]: v["ms"] for k, v in results["cells"].items()
             if k.endswith("fwdbwd/drop") and "ms" in v}
    ranked = sorted(train.items(), key=lambda kv: kv[1])
    results["ranked_train"] = ranked
    if ranked:
        base = train.get("xla")
        best = ranked[0]
        results["summary"] = {
            "best": best[0], "best_ms": best[1], "xla_ms": base,
            "speedup_vs_xla": (round(base / best[1], 3)
                               if base else None),
            "bert12_layer_delta_ms": (round((base - best[1]) * 12, 2)
                                      if base else None),
        }
        print(json.dumps(results["summary"]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
