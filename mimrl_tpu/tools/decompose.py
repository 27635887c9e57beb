"""Step-cost decomposition on the real chip.

Times the compiled programs the bench/solver actually run (train_step,
critic_update, eval_step, features_step) and isolated pieces (model
fwd train-mode, task-only fwd+bwd, BERT tower fwd / fwd+bwd, optimizer
alone) so perf work targets the live bottleneck instead of stale
numbers.

Usage:  python -m mimrl_tpu.tools.decompose [--steps 20]
Env:    BENCH_BS / BENCH_TIME_LEN / BENCH_BERT_LAYERS / BENCH_DTYPE /
        BENCH_RNG_IMPL as in bench.py.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _timeit(fn, *args, n=20, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    n = args.steps

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build, _inputs
    from mimrl_tpu.models.model import init_full
    from mimrl_tpu.train.losses import compute_task_loss
    from mimrl_tpu.train.optim import (make_main_optimizer,
                                       make_vmi_optimizer, merge_params,
                                       partition_params)
    from mimrl_tpu.train.steps import FeatureBank, StepFactory

    rng_impl = os.environ.get("BENCH_RNG_IMPL", "rbg")
    bs = int(os.environ.get("BENCH_BS", 128))
    time_len = int(os.environ.get("BENCH_TIME_LEN", 100))
    bert_layers = int(os.environ.get("BENCH_BERT_LAYERS", 12))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    quant = os.environ.get("BENCH_QUANT", "none")
    d_a, d_v, d_common = 5, 20, 128

    cfg, model = _build(bs, time_len, d_a, d_v, d_common=d_common,
                        bert_layers=bert_layers, bert_hidden=768,
                        bert_heads=12, cube_l=50, compute_dtype=dtype,
                        quant=quant)
    inputs = _inputs(bs, time_len, d_a, d_v)
    params = init_full(model, {"params": jax.random.PRNGKey(0)},
                       *inputs)["params"]
    p_main, p_bert, p_vmi = partition_params(params)
    opt_main = make_main_optimizer(cfg, p_main, p_bert)
    opt_vmi = make_vmi_optimizer(cfg)
    oms = opt_main.init(merge_params(p_main, p_bert))
    ovs = opt_vmi.init(p_vmi)
    steps = StepFactory(model, cfg, opt_main, opt_vmi)

    n_bank = 1280
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    bank = FeatureBank.create(n_bank, n_bank, d_common).replace(
        C=jax.random.normal(ks[0], (n_bank, 1)),
        F=jax.random.normal(ks[1], (n_bank, d_common)),
        T=jax.random.normal(ks[2], (n_bank, d_common)),
        A=jax.random.normal(ks[3], (n_bank, d_common)),
        V=jax.random.normal(ks[4], (n_bank, d_common)),
    )
    new_bank = FeatureBank.create(n_bank, n_bank, d_common)
    batch = {
        "bert_sentences": inputs[0], "bert_sentence_types": inputs[1],
        "bert_sentence_att_mask": inputs[2], "audio": inputs[3],
        "video": inputs[4],
        "sample_mask": jnp.ones((bs,), jnp.float32),
    }
    labels = jnp.asarray(
        np.random.default_rng(0).normal(size=(bs,)), jnp.float32)
    rng = jax.random.key(2, impl=rng_impl)

    res = {}

    # snapshot the BERT subtree BEFORE train_step donates its buffers
    bparams = jax.tree_util.tree_map(lambda x: x.copy(),
                                     params["bertmodel"])

    # full train_step (donates params/opt/new_bank -> re-feed outputs)
    out = steps.train_step(p_main, p_bert, p_vmi, oms, batch, labels,
                           bank, new_bank, 0, rng, use_mi=True)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = steps.train_step(out[0], out[1], p_vmi, out[2], batch,
                               labels, bank, out[6], 0, rng, use_mi=True)
    jax.block_until_ready(out)
    res["train_step"] = (time.perf_counter() - t0) / n * 1e3
    p_main, p_bert, oms, new_bank = out[0], out[1], out[2], out[6]

    # stage-1 cached critic update (donates p_vmi/ovs)
    feats = steps.features_step(p_main, p_bert, p_vmi, batch, rng)
    outc = steps.critic_update(p_main, p_bert, p_vmi, ovs, feats, labels,
                               bank, rng)
    jax.block_until_ready(outc)
    t0 = time.perf_counter()
    for _ in range(n):
        outc = steps.critic_update(p_main, p_bert, outc[0], outc[1],
                                   feats, labels, bank, rng)
    jax.block_until_ready(outc)
    res["critic_update"] = (time.perf_counter() - t0) / n * 1e3
    p_vmi, ovs = outc[0], outc[1]

    res["features_step"] = _timeit(
        steps.features_step, p_main, p_bert, p_vmi, batch, rng, n=n)
    res["eval_step"] = _timeit(
        steps.eval_step, p_main, p_bert, p_vmi, batch, labels, bank, rng,
        n=n, use_mi=True)

    # model forward alone, train mode (dropout on)
    merged_all = merge_params(p_main, p_bert, p_vmi)

    @jax.jit
    def fwd_train(params, rng):
        return model.apply(
            {"params": params}, batch["bert_sentences"],
            batch["bert_sentence_types"], batch["bert_sentence_att_mask"],
            batch["audio"], batch["video"], deterministic=False,
            rngs={"dropout": rng})

    res["model_fwd_train"] = _timeit(fwd_train, merged_all, rng, n=n)

    # task-only fwd+bwd (no MI losses, no optimizer)
    @jax.jit
    def task_fwd_bwd(pm, pb, rng):
        def lf(tr):
            merged = merge_params(tr[0], tr[1], p_vmi)
            out = model.apply(
                {"params": merged}, batch["bert_sentences"],
                batch["bert_sentence_types"],
                batch["bert_sentence_att_mask"], batch["audio"],
                batch["video"], deterministic=False,
                rngs={"dropout": rng})
            return compute_task_loss(cfg.loss, cfg.num_class, out[0],
                                     labels, batch["sample_mask"])
        return jax.grad(lf)((pm, pb))

    res["task_fwd_bwd_noopt"] = _timeit(task_fwd_bwd, p_main, p_bert, rng,
                                        n=n)

    # BERT tower alone: fwd and fwd+bwd (train-mode dropout)
    from mimrl_tpu.models.bert import BertModel
    bert = BertModel(config=model.bert_config)

    @jax.jit
    def bert_fwd(p, rng):
        return bert.apply(
            {"params": p}, batch["bert_sentences"],
            batch["bert_sentence_types"], batch["bert_sentence_att_mask"],
            deterministic=False, rngs={"dropout": rng})

    @jax.jit
    def bert_fwd_bwd(p, rng):
        def lf(pp):
            seq = bert.apply(
                {"params": pp}, batch["bert_sentences"],
                batch["bert_sentence_types"],
                batch["bert_sentence_att_mask"], deterministic=False,
                rngs={"dropout": rng})
            return jnp.sum(seq.astype(jnp.float32))
        return jax.grad(lf)(p)

    try:
        res["bert_fwd"] = _timeit(bert_fwd, bparams, rng, n=n)
        res["bert_fwd_bwd"] = _timeit(bert_fwd_bwd, bparams, rng, n=n)
    except Exception as e:
        res["bert_error"] = str(e)[:300]

    # optimizer alone (main+bert group, real state, grad = params-like)
    gz = jax.tree_util.tree_map(lambda x: (x * 1e-6).astype(x.dtype),
                                merge_params(p_main, p_bert))

    @jax.jit
    def opt_only(g, st, merged):
        upd, st2 = opt_main.update(g, st, merged)
        return optax.apply_updates(merged, upd), st2

    res["optimizer_only"] = _timeit(opt_only, gz, oms,
                                    merge_params(p_main, p_bert), n=n)

    for k, v in res.items():
        print(f"{k:22s} {v:8.2f} ms" if isinstance(v, float)
              else f"{k:22s} {v}")
    if "train_step" in res and "critic_update" in res:
        per_batch = res["train_step"] + cfg.stage1_n * res["critic_update"]
        print(f"{'implied samples/s':22s} {bs / per_batch * 1e3:8.1f}  "
              f"(train_step + {cfg.stage1_n}x critic_update)")


if __name__ == "__main__":
    main()
