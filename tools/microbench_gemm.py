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
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters):
    """Time `iters` chained python-level dispatches of jit(fn).

    Two measurement traps on this platform, both hit in round 2/3:
    - a lax.fori_loop whose body output feeds only PART of the next
      carry lets XLA's loop simplifier hoist the loop-invariant rows of
      the GEMM out of the body (measured "13000 TFLOP/s" on a chip with
      a 197 nominal peak). Python-level dispatches compile fn standalone,
      so no cross-iteration rewrite is possible.
    - the final wait must be a device->host FETCH of a few elements:
      fetching cannot complete before the chain has executed, and a tiny
      slice keeps tunnel bandwidth out of the measurement.
    Iteration i+1's operand 0 is rebuilt from iteration i's output
    (cheap [m,k] slice/cast), so every dispatch is data-dependent on the
    previous one — nothing can be skipped, reordered, or deduplicated.
    """
    a0 = args[0]
    m, k = a0.shape

    def refeed(out):
        """Rebuild operand 0 from the FULL output: every element of the
        next iterate depends on the previous output, so the loop
        simplifier cannot hoist any part of the GEMM (a partial
        dependency let it hoist the loop-invariant rows — measured
        "13000 TFLOP/s"). Slice first so the normalize touches [m, k]
        not [m, n]; rsqrt-normalize keeps iterates finite."""
        o = jax.tree_util.tree_leaves(out)[0]
        o2 = o.reshape(o.shape[0], -1) if o.ndim != 2 else o
        if o2.shape[1] < k:
            o2 = jnp.tile(o2, (1, -(-k // o2.shape[1])))
        if o2.shape[0] < m:
            o2 = jnp.tile(o2, (-(-m // o2.shape[0]), 1))
        o2 = o2[:m, :k].astype(jnp.float32)
        o2 = o2 * jax.lax.rsqrt(jnp.mean(jnp.square(o2)) + 1.0)
        if a0.dtype == jnp.int8:
            o2 = jnp.clip(jnp.round(o2 * 64.0), -127, 127)
        return o2.astype(a0.dtype)

    def chained(a, *rest):
        a = jax.lax.fori_loop(
            0, iters, lambda _, a: refeed(fn(a, *rest)), a)
        # tiny slice: the timing fetch below cannot complete before the
        # whole chain has executed, and a 4-element transfer keeps
        # tunnel bandwidth out of the measurement
        return jnp.ravel(a)[:4]

    g = jax.jit(chained)
    np.asarray(g(*args))  # compile + warm + sync
    t0 = time.perf_counter()
    np.asarray(g(*args))
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
