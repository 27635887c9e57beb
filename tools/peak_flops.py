"""Measure the chip's ACHIEVABLE bf16 (and int8) GEMM ceiling.

Round-2 docs claimed a "measured 120 TFLOP/s GEMM ceiling" against a
nominal v5e bf16 peak of ~197 TFLOP/s without explaining the gap. This
probe times square bf16 GEMMs at increasing sizes (and the canonical
BERT shapes) with the chained-iteration scheme from microbench_gemm
(dispatch-loop timing over the axon tunnel is unreliable), so the
number is the kernel's own rate, not tunnel overhead.

Usage: python tools/peak_flops.py
Prints one JSON line: per-size TFLOP/s + the max as `peak_tflops`.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.microbench_gemm import timeit  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    iters = int(os.environ.get("PEAK_ITERS", 30))
    rng = np.random.default_rng(0)
    results = {}

    sizes = [1024, 2048, 4096, 8192]
    # canonical BERT GEMM shapes at bench batch (bs*T=12800):
    shapes = [(s, s, s) for s in sizes] + [
        (12800, 768, 768),    # QKV/out-proj (per head-group)
        (12800, 768, 3072),   # FFN up
        (12800, 3072, 768),   # FFN down
    ]
    best = 0.0
    for (m, k, n) in shapes:
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
        f = jax.jit(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32))
        dt = timeit(f, a, b, iters=iters)
        tf = 2 * m * k * n / dt / 1e12
        results[f"bf16_{m}x{k}x{n}"] = round(tf, 1)
        best = max(best, tf)

    # bf16 accumulation variant (lower-precision accumulate can be faster)
    m = k = n = 4096
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.dot(a, b))
    dt = timeit(f, a, b, iters=iters)
    results["bf16_acc_bf16_4096"] = round(2 * m * k * n / dt / 1e12, 1)
    best = max(best, 2 * m * k * n / dt / 1e12)

    print(json.dumps({
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "peak_tflops": round(best, 1),
        **results,
    }))


if __name__ == "__main__":
    main()
