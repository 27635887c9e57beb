"""Sweep the BERT layout/remat + optimizer perf knobs on the real chip.

Times the stage-2 `train_step` (the critical path: ~85% of the two-stage
batch cost) for each knob variant in ONE process, so every variant pays
only its own compile. All variants are value- and grad-preserving
(tests/test_bert.py, tests/test_optim.py) — this script decides which
become defaults.

Usage: python tools/knob_sweep.py            # full sweep
       KNOBS=base,fused_optim python tools/knob_sweep.py
Prints one JSON line per variant plus a ranked summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name -> env overrides applied on top of the bench defaults
    "base": {},
    "fused_optim": {"BENCH_FUSED_OPTIM": "1"},
    "moment_bf16": {"BENCH_MOMENT_DTYPE": "bfloat16"},
    "attn_fold": {"BENCH_ATTN_FOLD": "1"},
    "gelu_remat": {"BENCH_GELU_REMAT": "1"},
    "attn_remat": {"BENCH_ATTN_REMAT": "1"},
    "layer_remat_dots": {"BENCH_LAYER_REMAT": "dots"},
    "flash_attn": {"BENCH_FLASH_ATTN": "1"},
    # base resolves flash 'auto' -> ON on TPU since round 5; this cell
    # keeps the XLA attention path measurable
    "no_flash": {"BENCH_FLASH_ATTN": "0"},
    # combos worth checking if singles win
    "fold+gelu": {"BENCH_ATTN_FOLD": "1", "BENCH_GELU_REMAT": "1"},
    "fold+gelu+fused_optim": {
        "BENCH_ATTN_FOLD": "1", "BENCH_GELU_REMAT": "1",
        "BENCH_FUSED_OPTIM": "1"},
}

KNOB_KEYS = ("BENCH_FUSED_OPTIM", "BENCH_MOMENT_DTYPE", "BENCH_ATTN_FOLD",
             "BENCH_GELU_REMAT", "BENCH_ATTN_REMAT", "BENCH_LAYER_REMAT",
             "BENCH_FLASH_ATTN")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build, _inputs
    from mimrl_tpu.models.model import init_full
    from mimrl_tpu.train.optim import (
        make_main_optimizer, make_vmi_optimizer, merge_params,
        partition_params)
    from mimrl_tpu.train.steps import FeatureBank, StepFactory

    # operating-point presets shared with bench.py (BENCH_SHAPES)
    shapes = os.environ.get("BENCH_SHAPES", "mosi")
    preset = {
        "mosi": dict(bs=128, time_len=100, d_a=5, d_v=20, n_bank=1280),
        "mosei": dict(bs=128, time_len=100, d_a=74, d_v=35, n_bank=16326),
        "avec": dict(bs=128, time_len=150, d_a=39, d_v=49, n_bank=4000),
    }[shapes]
    bs = int(os.environ.get("BENCH_BS", preset["bs"]))
    time_len = int(os.environ.get("BENCH_TIME_LEN", preset["time_len"]))
    n_steps = int(os.environ.get("BENCH_STEPS", 20))
    d_a, d_v, d_common = preset["d_a"], preset["d_v"], 128

    names = os.environ.get("KNOBS")
    names = names.split(",") if names else list(VARIANTS)

    inputs = _inputs(bs, time_len, d_a, d_v)
    batch = {
        "bert_sentences": inputs[0], "bert_sentence_types": inputs[1],
        "bert_sentence_att_mask": inputs[2], "audio": inputs[3],
        "video": inputs[4],
        "sample_mask": jnp.ones((bs,), jnp.float32),
    }
    labels = jnp.asarray(
        np.random.default_rng(0).normal(size=(bs,)), jnp.float32)
    n_bank = int(os.environ.get("BENCH_BANK", preset["n_bank"]))
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    bank = FeatureBank.create(n_bank, n_bank, d_common).replace(
        C=jax.random.normal(ks[0], (n_bank, 1)),
        F=jax.random.normal(ks[1], (n_bank, d_common)),
        T=jax.random.normal(ks[2], (n_bank, d_common)),
        A=jax.random.normal(ks[3], (n_bank, d_common)),
        V=jax.random.normal(ks[4], (n_bank, d_common)),
    )
    rng = jax.random.key(2, impl=os.environ.get("BENCH_RNG_IMPL", "rbg"))

    params0 = None
    rows = []
    for name in names:
        overrides = VARIANTS[name]
        for k in KNOB_KEYS:
            os.environ.pop(k, None)
        os.environ.update(overrides)

        cfg, model = _build(bs, time_len, d_a, d_v, d_common=d_common,
                            bert_layers=12, bert_hidden=768, bert_heads=12,
                            cube_l=50, compute_dtype="bfloat16")
        if params0 is None:
            params0 = init_full(model, {"params": jax.random.PRNGKey(0)},
                                *inputs)["params"]
        # knobs are layout/remat/optimizer-only: param trees identical.
        # Fresh HBM copies per variant — the jitted steps donate their
        # param/optimizer buffers, which would delete params0's arrays.
        params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params0)
        p_main, p_bert, p_vmi = partition_params(params)
        opt_main = make_main_optimizer(cfg, p_main, p_bert)
        opt_vmi = make_vmi_optimizer(cfg)
        oms = opt_main.init(merge_params(p_main, p_bert))
        steps = StepFactory(model, cfg, opt_main, opt_vmi)

        new_bank = FeatureBank.create(n_bank, n_bank, d_common)

        def one(p_main, p_bert, oms, new_bank, r):
            return steps.train_step(p_main, p_bert, p_vmi, oms, batch,
                                    labels, bank, new_bank, 0, r,
                                    use_mi=True)

        t_c0 = time.perf_counter()
        out = one(p_main, p_bert, oms, new_bank, jax.random.fold_in(rng, 0))
        jax.block_until_ready(out[3])
        compile_s = time.perf_counter() - t_c0
        p_main, p_bert, oms, new_bank = out[0], out[1], out[2], out[6]

        t0 = time.perf_counter()
        for i in range(n_steps):
            out = one(p_main, p_bert, oms, new_bank,
                      jax.random.fold_in(rng, i + 1))
            p_main, p_bert, oms, new_bank = out[0], out[1], out[2], out[6]
        jax.block_until_ready(out[3])
        ms = (time.perf_counter() - t0) / n_steps * 1e3
        row = {"variant": name, "train_step_ms": round(ms, 2),
               "samples_per_sec_stage2": round(bs / ms * 1e3, 1),
               "compile_s": round(compile_s, 1), "loss": float(out[3])}
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: r["train_step_ms"])
    print(json.dumps({"ranked": [(r["variant"], r["train_step_ms"])
                                 for r in rows]}))


if __name__ == "__main__":
    main()
