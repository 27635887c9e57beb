"""GEMM-path microbenchmark: is there an int8 MXU rate win on this chip?

Times the canonical BERT FFN GEMM shape [bs*T, 768] x [768, 3072]
(env-overridable) through four paths and prints one JSON line each:

  bf16_xla    — bf16 x bf16 -> f32 via jnp.dot (the production path)
  int8_xla    — s8 x s8 -> s32 via lax.dot_general (what ops/quant.py
                uses today; measured ~1.0-1.1x bf16 on the v5e)
  int8_pallas — the hand-tiled Mosaic kernel with fused dequant epilogue
                (ops/pallas/int8_matmul.py)
  int8_quant_e2e — int8_pallas INCLUDING the dynamic per-row/-col
                quantize of both operands (the honest training cost)

Usage: /opt/venv/bin/python tools/microbench_gemm.py
Env: GEMM_M, GEMM_K, GEMM_N, GEMM_ITERS, GEMM_BM, GEMM_BN.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters):
    """Time `iters` data-dependent repetitions INSIDE one jitted program.

    Dispatch-loop timing (call fn in a Python loop, block at the end)
    measured impossible rates through the axon tunnel (>2000 TFLOP/s on a
    v5e), so the runtime is eliding or caching repeated identical
    dispatches. A lax.fori_loop whose carry feeds the next iteration
    cannot be elided and times the kernel itself.
    """

    def chained(*xs):
        def body(_, carry):
            out = fn(*carry)
            # write one output scalar into operand 0 so iteration i+1
            # genuinely depends on iteration i (not algebraically
            # foldable, unlike +0/*0 tricks)
            t = jax.tree_util.tree_leaves(out)[0].ravel()[0]
            patch = t.astype(carry[0].dtype).reshape((1,) * carry[0].ndim)
            x0 = jax.lax.dynamic_update_slice(
                carry[0], patch, (0,) * carry[0].ndim)
            return (x0, *carry[1:])

        xs = jax.lax.fori_loop(0, iters, body, xs)
        return xs[0]

    g = jax.jit(chained)
    jax.block_until_ready(g(*args))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(g(*args))
    return (time.perf_counter() - t0) / iters


def main():
    m = int(os.environ.get("GEMM_M", 12800))
    k = int(os.environ.get("GEMM_K", 768))
    n = int(os.environ.get("GEMM_N", 3072))
    iters = int(os.environ.get("GEMM_ITERS", 50))
    bm = int(os.environ.get("GEMM_BM", 512))
    bn = int(os.environ.get("GEMM_BN", 512))
    flops = 2 * m * k * n

    rng = np.random.default_rng(0)
    a16 = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    sa = jnp.full((m, 1), 0.01, jnp.float32)
    sb = jnp.full((1, n), 0.02, jnp.float32)

    results = {}

    f_bf16 = jax.jit(lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32))
    dt = timeit(f_bf16, a16, b16, iters=iters)
    results["bf16_xla"] = {"ms": dt * 1e3, "tflops": flops / dt / 1e12}

    f_s8 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    dt = timeit(f_s8, a8, b8, iters=iters)
    results["int8_xla"] = {"ms": dt * 1e3, "tops": flops / dt / 1e12}

    from mimrl_tpu.ops.pallas.int8_matmul import int8_matmul
    interp = jax.default_backend() == "cpu"
    f_pl = lambda a, b, sa, sb: int8_matmul(
        a, b, sa, sb, block_m=bm, block_n=bn, interpret=interp)
    # correctness first
    got = np.asarray(f_pl(a8[:1024], b8, sa[:1024], sb), np.float32)
    want = (np.asarray(a8[:1024], np.float32) @ np.asarray(b8, np.float32)
            ) * 0.01 * 0.02
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-3))
    results["int8_pallas_relerr"] = float(err)
    if interp:
        print(json.dumps({"backend": "cpu-interpret", **results}))
        return
    dt = timeit(f_pl, a8, b8, sa, sb, iters=iters)
    results["int8_pallas"] = {"ms": dt * 1e3, "tops": flops / dt / 1e12}

    def quant_e2e(x, w):
        ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        sx = jnp.maximum(ax, 1e-8).astype(jnp.float32) / 127.0
        qx = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        aw = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        sw = jnp.maximum(aw, 1e-8).astype(jnp.float32) / 127.0
        qw = jnp.clip(jnp.round(w.astype(jnp.float32) / sw),
                      -127, 127).astype(jnp.int8)
        return int8_matmul(qx, qw, sx, sw, block_m=bm, block_n=bn)
    f_e2e = jax.jit(quant_e2e)
    dt = timeit(f_e2e, a16, b16, iters=iters)
    results["int8_quant_e2e"] = {"ms": dt * 1e3, "tops": flops / dt / 1e12}

    print(json.dumps({"backend": jax.default_backend(),
                      "shape": [m, k, n], **results}))


if __name__ == "__main__":
    main()
