"""Attribute the stage-2 train_step cost: fwd vs bwd slices, on-chip.

Times jitted ablation variants of the canonical task-loss program (MI
estimators excluded — measured at ~0.3 ms inside the step,
docs/PERFORMANCE.md) so the backward's 54 ms can be attributed:

  fwd          — forward + task loss, no grad (dropout on)
  bwd_all      — value_and_grad wrt main + bert params (the real step)
  bwd_main     — grad wrt non-BERT params only (BERT towers constant):
                 bwd_all - bwd_main ~= BERT backward
  bwd_noemb    — grad wrt everything EXCEPT the three embedding tables:
                 bwd_all - bwd_noemb ~= embedding-gradient scatter cost
  opt          — optimizer update alone (clip + Adam + apply)

Usage: /opt/venv/bin/python tools/ablate_step.py
Env: BENCH_BS, BENCH_TIME_LEN, BENCH_STEPS, and the bench BERT knobs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build, _inputs
    from mimrl_tpu.models.model import init_full
    from mimrl_tpu.train.losses import compute_task_loss
    from mimrl_tpu.train.optim import (make_main_optimizer, merge_params,
                                       partition_params)
    from mimrl_tpu.train.steps import _model_inputs

    bs = int(os.environ.get("BENCH_BS", 128))
    time_len = int(os.environ.get("BENCH_TIME_LEN", 100))
    iters = int(os.environ.get("BENCH_STEPS", 20))
    d_a, d_v, d_common = 5, 20, 128

    cfg, model = _build(bs, time_len, d_a, d_v, d_common=d_common,
                        bert_layers=12, bert_hidden=768, bert_heads=12,
                        cube_l=50, compute_dtype="bfloat16")
    inputs = _inputs(bs, time_len, d_a, d_v)
    params = init_full(model, {"params": jax.random.PRNGKey(0)},
                       *inputs)["params"]
    p_main, p_bert, p_vmi = partition_params(params)
    batch = {
        "bert_sentences": inputs[0], "bert_sentence_types": inputs[1],
        "bert_sentence_att_mask": inputs[2], "audio": inputs[3],
        "video": inputs[4],
    }
    labels = jnp.asarray(
        np.random.default_rng(0).normal(size=(bs,)), jnp.float32)
    rng = jax.random.key(2, impl="rbg")

    def task_loss(p_main, p_bert):
        merged = merge_params(p_main, p_bert, p_vmi)
        out, *_ = model.apply({"params": merged}, *_model_inputs(batch),
                              deterministic=False, return_features=True,
                              rngs={"dropout": rng})
        return compute_task_loss(cfg.loss, cfg.num_class, out, labels, None)

    results = {}

    f_fwd = jax.jit(task_loss)
    results["fwd_ms"] = round(timeit(f_fwd, p_main, p_bert, iters=iters), 2)

    # NB: the grads must stay live in the jitted output or XLA dead-code
    # eliminates the whole backward (fwd+bwd would time == fwd). Reduce
    # each grad leaf to a scalar so the output transfer stays tiny.
    def keep(grads):
        return sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))

    f_all = jax.jit(lambda pm, pb: keep(jax.value_and_grad(
        task_loss, (0, 1))(pm, pb)[1]))
    results["fwd+bwd_all_ms"] = round(
        timeit(f_all, p_main, p_bert, iters=iters), 2)

    f_main = jax.jit(lambda pm, pb: keep(jax.value_and_grad(
        task_loss, 0)(pm, pb)[1]))
    results["fwd+bwd_main_only_ms"] = round(
        timeit(f_main, p_main, p_bert, iters=iters), 2)

    # everything except the three embedding tables
    emb = p_bert["bertmodel"]["embeddings"]

    def loss_noemb(pm, pb_rest, emb_const):
        pb = dict(pb_rest)
        bm = dict(pb["bertmodel"])
        bm["embeddings"] = emb_const
        pb["bertmodel"] = bm
        return task_loss(pm, pb)

    pb_rest = dict(p_bert)
    bm_rest = dict(pb_rest["bertmodel"])
    del bm_rest["embeddings"]
    pb_rest["bertmodel"] = bm_rest
    # grads flow into pb_rest's subtree only; emb tables are constants.
    # NOTE: pb_rest lacks 'embeddings', loss_noemb re-adds it.
    f_noemb = jax.jit(lambda pm, pbr, e: keep(jax.value_and_grad(
        loss_noemb, (0, 1))(pm, pbr, e)[1]))
    results["fwd+bwd_noemb_ms"] = round(
        timeit(f_noemb, p_main, pb_rest, emb, iters=iters), 2)

    f_bert_only = jax.jit(lambda pm, pb: keep(jax.value_and_grad(
        task_loss, 1)(pm, pb)[1]))
    results["fwd+bwd_bert_only_ms"] = round(
        timeit(f_bert_only, p_main, p_bert, iters=iters), 2)

    # the isolated BERT tower (fwd and fwd+bwd), same shapes: everything
    # outside these two numbers is the A/V towers + CubeMLP + losses
    from mimrl_tpu.models.bert import BertModel
    bert_tower = BertModel(model.bert_config)

    def bert_loss(pb):
        h = bert_tower.apply(
            {"params": pb["bertmodel"]}, inputs[0], inputs[1], inputs[2],
            deterministic=False, rngs={"dropout": rng})
        return jnp.sum(jnp.mean(h, axis=1) ** 2)

    f_bfwd = jax.jit(bert_loss)
    results["bert_fwd_ms"] = round(timeit(f_bfwd, p_bert, iters=iters), 2)
    f_ball = jax.jit(lambda pb: keep(jax.value_and_grad(bert_loss)(pb)))
    results["bert_fwd+bwd_ms"] = round(
        timeit(f_ball, p_bert, iters=iters), 2)

    opt = make_main_optimizer(cfg, p_main, p_bert)
    merged = merge_params(p_main, p_bert)
    opt_state = opt.init(merged)
    g = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 1e-4, merged)

    def opt_step(g, s, p):
        upd, s2 = opt.update(g, s, p)
        return optax.apply_updates(p, upd)

    f_opt = jax.jit(opt_step)
    results["opt_ms"] = round(timeit(f_opt, g, opt_state, merged,
                                     iters=iters), 2)

    results["derived"] = {
        "bwd_total_ms": round(results["fwd+bwd_all_ms"] - results["fwd_ms"], 2),
        "bert_bwd_ms": round(results["fwd+bwd_all_ms"]
                             - results["fwd+bwd_main_only_ms"], 2),
        "nonbert_bwd_ms": round(results["fwd+bwd_all_ms"]
                                - results["fwd+bwd_bert_only_ms"], 2),
        "emb_scatter_ms": round(results["fwd+bwd_all_ms"]
                                - results["fwd+bwd_noemb_ms"], 2),
        "isolated_bert_bwd_ms": round(results["bert_fwd+bwd_ms"]
                                      - results["bert_fwd_ms"], 2),
    }
    print(json.dumps({"backend": jax.default_backend(),
                      "bs": bs, "time_len": time_len, **results}))
