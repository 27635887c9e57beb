"""Pipeline parallelism for the BERT text tower (GPipe schedule).

The reference has no pipeline parallelism at all (its only distribution
is single-process DataParallel, ref: Solver.py:33-36); this module is a
TPU-native capability addition: the 12-layer BERT stack is split into
`pipe` contiguous stages laid out on a dedicated mesh axis, microbatches
stream through the stages, and activations hop stage-to-stage over ICI
with `lax.ppermute`. Everything is one `shard_map`-ed XLA program, fully
differentiable (the transpose of the forward pipeline is the reverse
pipeline XLA derives automatically), and composes with data parallelism:
the batch stays sharded on the `data` axis inside the pipeline.

Schedule: plain GPipe. With S stages and M microbatches the program runs
M + S - 1 ticks; stage s processes microbatch (t - s) at tick t. The
bubble fraction is (S-1)/(M+S-1) — callers pick M >= 4*S to keep it
small. Stage weights are *sharded* over the pipe axis (each device holds
layers [s*L/S, (s+1)*L/S)), which is the point of pipeline parallelism:
an 8-stage mesh holds 1/8 of the BERT weights per device.

Layout contract with the rest of the framework:
- parameters stay in the standard flax tree (`layer_0..layer_{L-1}`);
  stacking to [S, L/S, ...] happens inside the jitted step, so the
  optimizer, checkpoints, freeze masks, and HF weight import are
  untouched.
- `bert_forward_pipelined` is a drop-in replacement for
  `BertModel.__call__` (same [bs, T, H] float32 output); the model
  consumes it via `MimrlModel.__call__(..., text_hidden=...)`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mimrl_tpu.models.bert import BertConfig, BertEmbeddings, BertLayer
from mimrl_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS

Array = jax.Array


def stack_layer_params(bert_params, n_layers: int, n_stages: int):
    """[per-layer trees] -> one tree with leaves [S, L/S, ...]."""
    per_layer = [bert_params[f"layer_{i}"] for i in range(n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    return jax.tree.map(
        lambda x: x.reshape(n_stages, n_layers // n_stages, *x.shape[1:]),
        stacked)


def bert_forward_pipelined(
    bert_params,
    config: BertConfig,
    mesh: Mesh,
    input_ids: Array,
    token_type_ids: Array,
    attention_mask: Array,
    *,
    n_microbatches: int,
    deterministic: bool = True,
    rng: Optional[Array] = None,
) -> Array:
    """Pipelined BERT forward: returns last_hidden_state [bs, T, H] f32.

    Requires `config.num_hidden_layers % mesh.shape['pipe'] == 0` and the
    per-data-shard batch divisible by `n_microbatches`.
    """
    S = mesh.shape[PIPE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    L = config.num_hidden_layers
    M = n_microbatches
    bs, T = input_ids.shape
    H = config.hidden_size
    if L % S != 0:
        raise ValueError(f"bert_layers={L} not divisible by pipe={S}")
    if bs % (M * n_data) != 0:
        raise ValueError(
            f"batch_size={bs} must be divisible by "
            f"pipe_microbatches*mesh_data={M}*{n_data}")

    if rng is None:
        rng = jax.random.PRNGKey(0)
    emb = BertEmbeddings(config).apply(
        {"params": bert_params["embeddings"]}, input_ids, token_type_ids,
        deterministic=deterministic,
        rngs=None if deterministic else {"dropout": jax.random.fold_in(rng, 0)})
    bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
    bias = bias * jnp.float32(-1e9)

    # microbatch split: [bs, ...] -> [M, bs/M, ...]; the batch axis stays
    # sharded over `data` inside the shard_map (in_specs below)
    emb_m = emb.reshape(M, bs // M, T, H)
    bias_m = bias.reshape(M, bs // M, 1, 1, T)
    stacked = stack_layer_params(bert_params, L, S)
    layer = BertLayer(config)

    def stage_fn(stage_params, x, b, key):
        # applies this stage's L/S contiguous layers
        for j in range(L // S):
            p_j = jax.tree.map(lambda a: a[j], stage_params)
            x = layer.apply(
                {"params": p_j}, x, b, deterministic,
                rngs=None if deterministic
                else {"dropout": jax.random.fold_in(key, j)})
        return x

    def pipe_body(stage_params, inputs, biases, key):
        # stage_params leaves [1, L/S, ...] (this device's stage);
        # inputs [M, mb_local, T, H]; biases [M, mb_local, 1, 1, T]
        stage_params = jax.tree.map(lambda a: a[0], stage_params)
        idx = jax.lax.axis_index(PIPE_AXIS)
        key = jax.random.fold_in(
            jax.random.fold_in(key, idx), jax.lax.axis_index(DATA_AXIS))
        state = jnp.zeros_like(inputs[0])
        outputs = jnp.zeros_like(inputs)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            state, outputs = carry
            micro = jnp.clip(t - idx, 0, M - 1)
            x = jnp.where(idx == 0, inputs[micro], state)
            y = stage_fn(stage_params, x, biases[micro],
                         jax.random.fold_in(key, t))
            # the last stage emits microbatch t-(S-1) at tick t
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            emit = (idx == S - 1) & (t >= S - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(emit, y, outputs[out_idx]), out_idx, 0)
            state = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(M + S - 1))
        # only the last stage holds real outputs; psum replicates them
        # across the pipe axis (zeros elsewhere keep the sum exact)
        outputs = jax.lax.psum(
            jnp.where(idx == S - 1, outputs, jnp.zeros_like(outputs)),
            PIPE_AXIS)
        return outputs

    out = jax.shard_map(
        pipe_body,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS), P()),
        out_specs=P(None, DATA_AXIS),
        check_vma=False,
    )(stacked, emb_m, bias_m, rng)
    return out.reshape(bs, T, H).astype(jnp.float32)
