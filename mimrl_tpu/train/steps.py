"""The two-stage training loop as jitted steps.

TPU re-design of the reference's epoch body (ref: Solver.py:194-248):
the whole per-batch pipeline — forward, 6 on-device kNN product samples,
11 critic/classifier losses, gradients, optimizer update, feature-bank
write — is ONE compiled XLA program per stage. There are exactly three
compiled programs (critic_step, train_step, eval_step) and they are
reused every epoch (static shapes), so the host does nothing but feed
batches and read scalars.

Parity map:
- `critic_step`  = stage 1 inner loop body (Solver.py:204-216): updates
  only the vmi/vcmi parameter group.
- `train_step`   = stage 2 body (Solver.py:220-242): updates main+bert,
  with `task_loss + sum(coef2 * mi_loss)` (Customization.py:104-113).
- epoch-0 semantics (empty banks): stage 1 is skipped entirely and stage
  2 runs with `use_mi=False`, yielding task_loss only with zeroed MI
  telemetry (ref: Solver.py:201-203, Customization.py:97-98, :105-106).
- feature banks are epoch-stale: stage 2 writes NEW banks consumed next
  epoch (ref: Solver.py:219-244).

The gradient partition exploits XLA DCE: stage 1 differentiates only wrt
vmi params with the features as constants, so the whole BERT/CubeMLP
backward is dead code and never compiled — the reference pays for that
backward and throws it away.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.mi.knn import prod_knn_sample
from mimrl_tpu.models.model import CMI_KEYS, MimrlModel
from mimrl_tpu.train.losses import compute_task_loss
from mimrl_tpu.train.optim import merge_params

Array = jax.Array


class FeatureBank(struct.PyTreeNode):
    """Epoch-wide feature store: fixed [N_bank, d] arrays + valid mask
    (the reference grows python lists and cats them, Solver.py:219-244;
    here rows are written in place with dynamic_update_slice)."""

    C: Array  # [N, 1] labels
    F: Array  # [N, d_common]
    T: Array
    A: Array
    V: Array
    valid: Array  # [N] float32

    @classmethod
    def create(cls, n_bank: int, n_valid: int, d_common: int,
               dtype=jnp.float32) -> "FeatureBank":
        z = functools.partial(jnp.zeros, dtype=dtype)
        valid = (jnp.arange(n_bank) < n_valid).astype(jnp.float32)
        return cls(C=z((n_bank, 1)), F=z((n_bank, d_common)),
                   T=z((n_bank, d_common)), A=z((n_bank, d_common)),
                   V=z((n_bank, d_common)), valid=valid)

    def write(self, offset: Array, labels: Array, F: Array, T: Array,
              A: Array, V: Array) -> "FeatureBank":
        upd = functools.partial(jax.lax.dynamic_update_slice_in_dim, axis=0)
        return self.replace(
            C=upd(self.C, labels.reshape(-1, 1).astype(self.C.dtype), offset),
            F=upd(self.F, F.astype(self.F.dtype), offset),
            T=upd(self.T, T.astype(self.T.dtype), offset),
            A=upd(self.A, A.astype(self.A.dtype), offset),
            V=upd(self.V, V.astype(self.V.dtype), offset),
        )


def sample_all_knn(rng: Array, bank: FeatureBank, batch_size: int,
                   k_neighbor: int, radius: float) -> Dict[str, Tuple]:
    """The six conditional-product sample triples of one loss evaluation
    (ref: Model.py:323-339). Argument layout per estimator:
    I(x;y|z) samples are (x_bank, y_bank, z_bank)."""
    triples = {
        "ac_t": (bank.A, bank.C, bank.T),
        "ta_c": (bank.T, bank.A, bank.C),
        "vc_t": (bank.V, bank.C, bank.T),
        "tv_c": (bank.T, bank.V, bank.C),
        "tc_a": (bank.T, bank.C, bank.A),
        "tc_v": (bank.T, bank.C, bank.V),
    }
    keys = jax.random.split(rng, len(CMI_KEYS))
    return {
        name: prod_knn_sample(keys[i], *triples[name], batch_size=batch_size,
                              k_neighbor=k_neighbor, radius=radius,
                              valid=bank.valid > 0.5)
        for i, name in enumerate(CMI_KEYS)
    }


def _all_finite(tree) -> Array:
    """Scalar bool: every leaf of `tree` is finite."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))


def _select_tree(pred: Array, on_true, on_false):
    """Elementwise tree select: pred ? on_true : on_false."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def _guarded_update(enabled: bool, loss, grads, new_params, old_params,
                    new_opt_state, old_opt_state):
    """Apply the --skip_nonfinite_updates containment: when enabled and
    the loss or any gradient is NaN/Inf, keep the old params/opt state.
    The loss is checked as well as the grads because XLA lowers abs/max
    backwards to NaN-swallowing comparisons — NaN targets yield a NaN
    loss with finite *garbage* gradients that a grads-only check misses.
    Returns (params, opt_state, ok)."""
    if not enabled:
        return new_params, new_opt_state, jnp.bool_(True)
    ok = jnp.isfinite(loss) & _all_finite(grads)
    return (_select_tree(ok, new_params, old_params),
            _select_tree(ok, new_opt_state, old_opt_state), ok)


def _model_inputs(batch: Dict):
    if "bert_sentences" in batch:
        return (
            batch["bert_sentences"], batch["bert_sentence_types"],
            batch["bert_sentence_att_mask"], batch["audio"], batch["video"],
        )
    # dense text mode ("text" [bs, T, d_t]): the BERT args are unused
    # placeholders (the model routes through text_features instead)
    bs, T = batch["text"].shape[:2]
    z = jnp.zeros((bs, T), jnp.int32)
    return (z, z, jnp.ones((bs, T), jnp.int32), batch["audio"],
            batch["video"])


def init_training_state(model: MimrlModel, opt_main, opt_vmi, init_rng,
                        ortho_rng, batch: Dict, text_features=None):
    """The ENTIRE training-state init as ONE compiled program.

    Flax init, the orthogonal w_hh re-init (ref: Customization.py:18-21),
    the (main, bert, vmi) partition, and BOTH optax state inits execute
    inside a single jit. Running them eagerly instead compiles ~100
    one-off programs (one per QR / zeros_like shape), which is
    pathological on backends with remote compilation — measured ~9 min
    of Solver init on the tunneled TPU for seconds of actual work.

    Callers build `opt_main`/`opt_vmi` beforehand from the param
    STRUCTURE via ``jax.eval_shape`` (zero device work): the optimizer
    factories only read tree names/shapes.

    Returns (params_main, params_bert, params_vmi, opt_main_state,
    opt_vmi_state).
    """
    from mimrl_tpu.models.model import (_init_all_method,
                                        apply_orthogonal_whh)
    from mimrl_tpu.train.optim import partition_params

    bert_s, bert_t, bert_m, a, v = _model_inputs(batch)

    @jax.jit
    def _do(init_rng, ortho_rng, bert_s, bert_t, bert_m, a, v, tf):
        variables = model.init(
            {"params": init_rng}, bert_s, bert_t, bert_m, a, v,
            text_features=tf, method=_init_all_method)
        params = apply_orthogonal_whh(variables["params"], ortho_rng)
        pm, pb, pv = partition_params(params)
        return (pm, pb, pv, opt_main.init(merge_params(pm, pb)),
                opt_vmi.init(pv))

    return _do(init_rng, ortho_rng, bert_s, bert_t, bert_m, a, v,
               text_features)


class StepFactory:
    """Builds the three jitted step functions for a model + config."""

    def __init__(self, model: MimrlModel, cfg: MimrlConfig, opt_main,
                 opt_vmi, mesh=None):
        self.model = model
        self.cfg = cfg
        self.opt_main = opt_main
        self.opt_vmi = opt_vmi
        c1 = jnp.asarray(cfg.loss_mi_coefficient1, jnp.float32)
        c2 = jnp.asarray(cfg.loss_mi_coefficient2, jnp.float32)
        # user loss hook (--custom_loss, train/custom.py): resolved once
        # here, traced into the jitted steps below
        from mimrl_tpu.train.custom import load_custom_loss
        custom_loss = load_custom_loss(cfg.custom_loss, cfg)

        model_apply = model.apply
        # pipeline parallelism: run the BERT layer stack as a shard_map
        # microbatch pipeline over the mesh's `pipe` axis and feed the
        # result through the model's text_hidden bypass
        pipe_on = cfg.mesh_pipe > 1 and mesh is not None

        def forward(params, batch, rng, deterministic):
            kwargs = {}
            if "text" in batch:
                # dense pre-extracted text features: no BERT tower
                kwargs["text_features"] = batch["text"]
            elif pipe_on:
                from mimrl_tpu.parallel.pipeline import bert_forward_pipelined

                kwargs["text_hidden"] = bert_forward_pipelined(
                    params["bertmodel"], model.bert_config, mesh,
                    batch["bert_sentences"], batch["bert_sentence_types"],
                    batch["bert_sentence_att_mask"],
                    n_microbatches=cfg.pipe_microbatches,
                    n_virtual=cfg.pipe_virtual, remat=cfg.pipe_remat,
                    deterministic=deterministic,
                    rng=None if deterministic else jax.random.fold_in(rng, 7))
            return model_apply(
                {"params": params}, *_model_inputs(batch),
                deterministic=deterministic, return_features=True,
                rngs=None if deterministic else {"dropout": rng},
                **kwargs,
            )

        def stage_loss(params, labels, feats, knn, stage: int):
            method = (MimrlModel.compute_vmi_loss_stage1 if stage == 1
                      else MimrlModel.compute_vmi_loss_stage2)
            return model_apply({"params": params}, labels, *feats, knn,
                               method=method)

        # ---------------- stage 1: critic update ---------------- #
        def critic_step(params_main, params_bert, params_vmi, opt_state,
                        batch, labels, bank, rng):
            k_drop, k_knn = jax.random.split(rng)
            merged = merge_params(params_main, params_bert, params_vmi)
            out, F_F, T_F, A_F, V_F = forward(merged, batch, k_drop,
                                              deterministic=False)
            feats = jax.lax.stop_gradient((F_F, T_F, A_F, V_F))
            knn = sample_all_knn(k_knn, bank, cfg.batch_size,
                                 cfg.k_neighbor, cfg.radius)

            def loss_fn(p_vmi):
                merged_v = merge_params(params_main, params_bert, p_vmi)
                mis, losses = stage_loss(merged_v, labels, feats, knn, 1)
                total = sum(l * c for l, c in zip(losses, c1))
                return total, mis

            (loss, mis), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_vmi)
            updates, new_opt_state = opt_vmi.update(grads, opt_state,
                                                    params_vmi)
            new_params = optax.apply_updates(params_vmi, updates)
            new_params, new_opt_state, _ = _guarded_update(
                cfg.skip_nonfinite_updates, loss, grads, new_params,
                params_vmi, new_opt_state, opt_state)
            return new_params, new_opt_state, loss, jnp.stack(mis)

        # ---------------- stage 2: main update ---------------- #
        def train_step(params_main, params_bert, params_vmi, opt_state,
                       batch, labels, bank, new_bank, offset, rng,
                       use_mi: bool):
            k_drop, k_knn = jax.random.split(rng)
            knn = (sample_all_knn(k_knn, bank, cfg.batch_size,
                                  cfg.k_neighbor, cfg.radius)
                   if use_mi else None)
            mask = batch.get("sample_mask")

            def loss_fn(p_trainable):
                p_main, p_bert = p_trainable
                merged = merge_params(p_main, p_bert, params_vmi)
                out, F_F, T_F, A_F, V_F = forward(merged, batch, k_drop,
                                                  deterministic=False)
                task_loss = compute_task_loss(
                    cfg.loss, cfg.num_class, out, labels, mask)
                if use_mi:
                    mis, mi_losses = stage_loss(
                        merged, labels, (F_F, T_F, A_F, V_F), knn, 2)
                    total = task_loss + sum(
                        l * c for l, c in zip(mi_losses, c2))
                    mis = jnp.stack(mis)
                else:
                    total = task_loss
                    mis = jnp.zeros((8,), jnp.float32)
                if custom_loss is not None:
                    total = total + custom_loss(out, labels,
                                                (F_F, T_F, A_F, V_F))
                return total, (out, F_F, T_F, A_F, V_F, mis, task_loss)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                (params_main, params_bert))
            out, F_F, T_F, A_F, V_F, mis, task_loss = aux
            g_main, g_bert = grads
            merged_old = merge_params(params_main, params_bert)
            updates, new_opt_state = opt_main.update(
                merge_params(g_main, g_bert), opt_state, merged_old)
            merged_new = optax.apply_updates(merged_old, updates)
            merged_new, new_opt_state, ok = _guarded_update(
                cfg.skip_nonfinite_updates, loss, grads, merged_new,
                merged_old, new_opt_state, opt_state)
            opt_state = new_opt_state
            params_main = {k: merged_new[k] for k in params_main}
            params_bert = {k: merged_new[k] for k in params_bert}

            # the bank write is guarded too: NaN features written into
            # the bank would poison every future kNN sample — exactly
            # the contamination the flag exists to contain
            written = new_bank.write(offset, labels, F_F, T_F, A_F, V_F)
            if cfg.skip_nonfinite_updates:
                feats_ok = ok & _all_finite((F_F, T_F, A_F, V_F, labels))
                new_bank = _select_tree(feats_ok, written, new_bank)
            else:
                new_bank = written
            return (params_main, params_bert, opt_state, loss, mis, out,
                    new_bank)

        # ---------------- eval ---------------- #
        def eval_step(params_main, params_bert, params_vmi, batch, labels,
                      bank, rng, use_mi: bool):
            merged = merge_params(params_main, params_bert, params_vmi)
            out, F_F, T_F, A_F, V_F = forward(merged, batch, rng,
                                              deterministic=True)
            mask = batch.get("sample_mask")
            task_loss = compute_task_loss(cfg.loss, cfg.num_class, out,
                                          labels, mask)
            if use_mi:
                knn = sample_all_knn(rng, bank, cfg.batch_size,
                                     cfg.k_neighbor, cfg.radius)
                mis, mi_losses = stage_loss(
                    merged, labels, (F_F, T_F, A_F, V_F), knn, 2)
                loss = task_loss + sum(l * c for l, c in zip(mi_losses, c2))
                mis = jnp.stack(mis)
            else:
                loss = task_loss
                mis = jnp.zeros((8,), jnp.float32)
            if custom_loss is not None:
                loss = loss + custom_loss(out, labels, (F_F, T_F, A_F, V_F))
            return loss, mis, out, (F_F, T_F, A_F, V_F)

        # ---------------- epoch-level scans (--epoch_scan) ---------------- #
        # The whole stage is ONE XLA program: the host stacks the epoch's
        # batches ([NB, bs, ...]) and dispatches once; lax.scan carries
        # params/optimizer state/bank across batches on-device. Removes
        # per-batch dispatch + transfer latency entirely.

        def critic_epoch(params_main, params_bert, params_vmi, opt_state,
                         batches, labels_stack, bank, rng, n_passes: int):
            """Stage 1 for the whole epoch: one forward per batch (scanned),
            then n_passes scanned critic updates over the cached features."""
            nb = labels_stack.shape[0]
            k_feat, k_upd = jax.random.split(rng)
            merged = merge_params(params_main, params_bert, params_vmi)

            def feat_body(_, inp):
                batch, k = inp
                out, F_F, T_F, A_F, V_F = forward(merged, batch, k,
                                                  deterministic=False)
                return None, (F_F, T_F, A_F, V_F)

            feat_keys = jax.random.split(k_feat, nb)
            _, feats_stack = jax.lax.scan(feat_body, None, (batches, feat_keys))
            feats_stack = jax.lax.stop_gradient(feats_stack)

            def upd_body(carry, inp):
                p_vmi, opt_state = carry
                feats, labels, k = inp
                knn = sample_all_knn(k, bank, cfg.batch_size, cfg.k_neighbor,
                                     cfg.radius)

                def loss_fn(p):
                    merged_v = merge_params(params_main, params_bert, p)
                    mis, losses = stage_loss(merged_v, labels, feats, knn, 1)
                    return sum(l * c for l, c in zip(losses, c1))

                loss, grads = jax.value_and_grad(loss_fn)(p_vmi)
                updates, new_opt_state = opt_vmi.update(grads, opt_state,
                                                        p_vmi)
                new_p = optax.apply_updates(p_vmi, updates)
                new_p, new_opt_state, _ = _guarded_update(
                    cfg.skip_nonfinite_updates, loss, grads, new_p, p_vmi,
                    new_opt_state, opt_state)
                return (new_p, new_opt_state), loss

            # n_passes sweeps over the cached features (--fast_stage1
            # semantics: features fixed within the stage). Outer scan over
            # passes, inner scan over batches — same visit order and keys
            # as materializing [n_passes*NB, ...] but without tiling the
            # whole epoch's feature stack n_passes x in HBM.
            upd_keys = jax.random.split(k_upd, nb * n_passes)
            upd_keys = upd_keys.reshape((n_passes, nb) + upd_keys.shape[1:])

            def pass_body(carry, keys_pass):
                carry, losses = jax.lax.scan(
                    upd_body, carry, (feats_stack, labels_stack, keys_pass))
                return carry, jnp.sum(losses)

            (params_vmi, opt_state), pass_losses = jax.lax.scan(
                pass_body, (params_vmi, opt_state), upd_keys)
            return params_vmi, opt_state, jnp.sum(pass_losses)

        def critic_epoch_fresh(params_main, params_bert, params_vmi,
                               opt_state, batches, labels_stack, bank, rng,
                               n_passes: int):
            """Reference-EXACT stage 1 under scan: a FRESH forward (new
            dropout draw) for every critic pass of every batch — the
            schedule the reference's stage-1 loop executes (it re-runs
            the whole train loader through model.train() stage1_n
            times, ref: Solver.py:201-214). Identical math and RNG
            structure to scanning `critic_step` over passes x batches;
            only the per-batch python dispatches are fused away. Used
            by --epoch_scan when neither --fast_stage1 nor
            --stage1_cached opted into feature reuse."""
            nb = labels_stack.shape[0]

            def upd_body(carry, inp):
                p_vmi, opt_st = carry
                batch, labels, k = inp
                k_drop, k_knn = jax.random.split(k)
                merged = merge_params(params_main, params_bert, p_vmi)
                out, F_F, T_F, A_F, V_F = forward(merged, batch, k_drop,
                                                  deterministic=False)
                feats = jax.lax.stop_gradient((F_F, T_F, A_F, V_F))
                knn = sample_all_knn(k_knn, bank, cfg.batch_size,
                                     cfg.k_neighbor, cfg.radius)

                def loss_fn(p):
                    merged_v = merge_params(params_main, params_bert, p)
                    mis, losses = stage_loss(merged_v, labels, feats, knn, 1)
                    return sum(l * c for l, c in zip(losses, c1))

                loss, grads = jax.value_and_grad(loss_fn)(p_vmi)
                updates, new_opt_st = opt_vmi.update(grads, opt_st, p_vmi)
                new_p = optax.apply_updates(p_vmi, updates)
                new_p, new_opt_st, _ = _guarded_update(
                    cfg.skip_nonfinite_updates, loss, grads, new_p, p_vmi,
                    new_opt_st, opt_st)
                return (new_p, new_opt_st), loss

            keys = jax.random.split(rng, nb * n_passes)
            keys = keys.reshape((n_passes, nb) + keys.shape[1:])

            def pass_body(carry, keys_pass):
                carry, losses = jax.lax.scan(
                    upd_body, carry, (batches, labels_stack, keys_pass))
                return carry, jnp.sum(losses)

            (params_vmi, opt_state), pass_losses = jax.lax.scan(
                pass_body, (params_vmi, opt_state), keys)
            return params_vmi, opt_state, jnp.sum(pass_losses)

        def critic_epoch_cached(params_main, params_bert, params_vmi,
                                opt_state, bank, rng, n_passes: int,
                                nb: int):
            """Stage 1 with NO forward pass at all (--stage1_cached):
            critic-training features are read straight from the epoch-stale
            feature bank — the same bank rows the previous epoch's stage-2
            forwards wrote (train_step's bank write) and that already
            supply the kNN contrast samples. One step deeper on the
            fast-stage1 ladder: fast_stage1 reuses the current epoch's
            forward across the n_passes; this mode reuses the previous
            epoch's stage-2 forward (one dropout draw, one epoch stale).
            Valid whenever stage 1 runs at all: epoch 0 skips stage 1 but
            still fills the bank, so from epoch 1 on the bank is populated.
            Labels come from bank.C (co-written with the features), so the
            sweep is fully decoupled from the current epoch's loader order
            (the loader may reshuffle between epochs; bank rows are in the
            PREVIOUS epoch's order). Guarded by the synthetic convergence
            suite (tests/test_solver_variants.py)."""
            bs = cfg.batch_size
            # mirror critic_epoch's key structure so that with identical
            # bank contents the two paths produce identical updates
            _, k_upd = jax.random.split(rng)

            def upd_body(carry, inp):
                p_vmi, opt_state = carry
                offset, k = inp
                sl = lambda M: jax.lax.dynamic_slice_in_dim(M, offset, bs,
                                                            axis=0)
                feats = (sl(bank.F), sl(bank.T), sl(bank.A), sl(bank.V))
                labels = sl(bank.C)[:, 0].astype(jnp.float32)
                knn = sample_all_knn(k, bank, bs, cfg.k_neighbor,
                                     cfg.radius)

                def loss_fn(p):
                    merged_v = merge_params(params_main, params_bert, p)
                    mis, losses = stage_loss(merged_v, labels, feats, knn, 1)
                    return sum(l * c for l, c in zip(losses, c1))

                loss, grads = jax.value_and_grad(loss_fn)(p_vmi)
                updates, new_opt_state = opt_vmi.update(grads, opt_state,
                                                        p_vmi)
                new_p = optax.apply_updates(p_vmi, updates)
                new_p, new_opt_state, _ = _guarded_update(
                    cfg.skip_nonfinite_updates, loss, grads, new_p, p_vmi,
                    new_opt_state, opt_state)
                return (new_p, new_opt_state), loss

            upd_keys = jax.random.split(k_upd, nb * n_passes)
            upd_keys = upd_keys.reshape((n_passes, nb) + upd_keys.shape[1:])
            offsets = jnp.arange(nb) * bs

            def pass_body(carry, keys_pass):
                carry, losses = jax.lax.scan(
                    upd_body, carry, (offsets, keys_pass))
                return carry, jnp.sum(losses)

            (params_vmi, opt_state), pass_losses = jax.lax.scan(
                pass_body, (params_vmi, opt_state), upd_keys)
            return params_vmi, opt_state, jnp.sum(pass_losses)

        def train_epoch(params_main, params_bert, params_vmi, opt_state,
                        batches, labels_stack, bank, new_bank, rng,
                        use_mi: bool):
            """Stage 2 for the whole epoch as one scanned program."""
            nb = labels_stack.shape[0]
            keys = jax.random.split(rng, nb)
            offsets = jnp.arange(nb) * cfg.batch_size

            def body(carry, inp):
                p_main, p_bert, opt_state, new_bank = carry
                batch, labels, offset, k = inp
                (p_main, p_bert, opt_state, loss, mis, out, new_bank) = (
                    train_step(p_main, p_bert, params_vmi, opt_state,
                               batch, labels, bank, new_bank, offset, k,
                               use_mi))
                return (p_main, p_bert, opt_state, new_bank), (loss, mis, out)

            (params_main, params_bert, opt_state, new_bank), ys = jax.lax.scan(
                body, (params_main, params_bert, opt_state, new_bank),
                (batches, labels_stack, offsets, keys))
            losses, mis, outs = ys
            return (params_main, params_bert, opt_state, losses, mis, outs,
                    new_bank)

        def eval_epoch(params_main, params_bert, params_vmi, batches,
                       labels_stack, bank, rng, use_mi: bool):
            nb = labels_stack.shape[0]
            keys = jax.random.split(rng, nb)

            def body(_, inp):
                batch, labels, k = inp
                loss, mis, out, feats = eval_step(
                    params_main, params_bert, params_vmi, batch, labels,
                    bank, k, use_mi)
                return None, (loss, mis, out, feats)

            _, ys = jax.lax.scan(body, None, (batches, labels_stack, keys))
            return ys  # (losses [NB], mis [NB,8], outs [NB,bs,C], feats)

        # ------- fast stage 1: forward once, update critics many times ------- #
        def features_step(params_main, params_bert, params_vmi, batch, rng):
            merged = merge_params(params_main, params_bert, params_vmi)
            out, F_F, T_F, A_F, V_F = forward(merged, batch, rng,
                                              deterministic=False)
            return jax.lax.stop_gradient((F_F, T_F, A_F, V_F))

        def critic_update(params_main, params_bert, params_vmi, opt_state,
                          feats, labels, bank, rng):
            """Stage-1 update from precomputed features (--fast_stage1)."""
            knn = sample_all_knn(rng, bank, cfg.batch_size, cfg.k_neighbor,
                                 cfg.radius)

            def loss_fn(p_vmi):
                merged_v = merge_params(params_main, params_bert, p_vmi)
                mis, losses = stage_loss(merged_v, labels, feats, knn, 1)
                total = sum(l * c for l, c in zip(losses, c1))
                return total, mis

            (loss, mis), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_vmi)
            updates, new_opt_state = opt_vmi.update(grads, opt_state,
                                                    params_vmi)
            new_params = optax.apply_updates(params_vmi, updates)
            new_params, new_opt_state, _ = _guarded_update(
                cfg.skip_nonfinite_updates, loss, grads, new_params,
                params_vmi, new_opt_state, opt_state)
            return new_params, new_opt_state, loss, jnp.stack(mis)

        # ---------------- gradient debug (--check_gradient) ---------------- #
        def grad_debug_step(params_main, params_bert, params_vmi, batch,
                            labels, bank, rng, stage: int):
            """Per-module |grad| sums for the stage loss
            (ref: --check_gradient -> print_gradient, Utils.py:11-19)."""
            k_drop, k_knn = jax.random.split(rng)
            knn = sample_all_knn(k_knn, bank, cfg.batch_size,
                                 cfg.k_neighbor, cfg.radius)
            mask = batch.get("sample_mask")

            def loss_fn(all_params):
                out, F_F, T_F, A_F, V_F = forward(all_params, batch, k_drop,
                                                  deterministic=False)
                if stage == 1:
                    _, losses = stage_loss(all_params, labels,
                                           (F_F, T_F, A_F, V_F), knn, 1)
                    return sum(l * c for l, c in zip(losses, c1))
                task_loss = compute_task_loss(cfg.loss, cfg.num_class, out,
                                              labels, mask)
                _, mi_losses = stage_loss(all_params, labels,
                                          (F_F, T_F, A_F, V_F), knn, 2)
                return task_loss + sum(l * c for l, c in zip(mi_losses, c2))

            merged = merge_params(params_main, params_bert, params_vmi)
            grads = jax.grad(loss_fn)(merged)
            # Per-PARAMETER granularity, matching the reference's
            # print_gradient loop over named_parameters() with 'bert'
            # skipped (ref: Utils.py:11-19): flattened leaf name ->
            # (param sum, grad sum).
            out = {}
            for path, g in jax.tree_util.tree_leaves_with_path(grads):
                name = jax.tree_util.keystr(path)
                if "bert" in name:
                    continue
                p = merged
                for k in path:
                    p = p[k.key] if hasattr(k, "key") else p[k.idx]
                out[name] = (jnp.sum(p), jnp.sum(g))
            return out

        # ------- epoch groups (--epoch_group G): G epochs, ONE dispatch ------- #
        # The strongest dispatch-fusion rung: lax.scan over WHOLE epochs.
        # Each scan step runs stage 1 + stage 2 + valid eval + test eval
        # and updates two device-resident best-model snapshots in-graph
        # (selection metric computed on-device; the emitted better-bits
        # let the host replay the exact decisions for its bookkeeping).
        # Train batches are gathered on-device from the dataset-order
        # tensors by per-epoch index plans (device-side shuffle), so a
        # group's host traffic is a few KB of plans + scalars out.
        # Requires: metric-independent LR schedule (factors precomputed
        # per epoch), static eval stacks, device-shuffle-capable train
        # loader. The solver falls back to per-epoch dispatch otherwise.

        def _sel_metric(sel: str, outs, labels, mask):
            """On-device selection scalar over one eval split.
            outs [NB, bs, C] / labels [NB, bs] / mask [NB, bs] f32.
            sel: the reference's model-selection rule
            (ref: Solver.py:425-436 / eval/metrics.current_result_better):
            regression -> MAE down; classification -> acc up;
            AVEC2019 -> CCC up (eval/metrics.ccc_score, ref Utils.py:37-49)."""
            m = mask.reshape(-1)
            if sel == "mae":
                p = outs.reshape(-1)
                t = labels.reshape(-1)
                return jnp.sum(jnp.abs(p - t) * m) / jnp.maximum(
                    jnp.sum(m), 1.0)
            if sel == "ccc":
                # masked concordance correlation: the host ccc_score over
                # the mask-filtered predictions, expressed as masked sums
                p = outs.reshape(-1)
                t = labels.reshape(-1)
                n = jnp.maximum(jnp.sum(m), 1.0)
                mx = jnp.sum(p * m) / n
                my = jnp.sum(t * m) / n
                cov = jnp.sum((p - mx) * (t - my) * m) / n
                vx = jnp.sum(jnp.square(p - mx) * m) / n
                vy = jnp.sum(jnp.square(t - my) * m) / n
                return 2 * cov / (vx + vy + jnp.square(mx - my))
            if sel == "acc":
                if outs.shape[-1] == 1:
                    pred = (outs.reshape(-1) > 0).astype(jnp.int32)
                else:
                    pred = jnp.argmax(
                        outs.reshape(-1, outs.shape[-1]), axis=-1)
                t = labels.reshape(-1).astype(jnp.int32)
                return jnp.sum((pred == t).astype(jnp.float32) * m) / (
                    jnp.maximum(jnp.sum(m), 1.0))
            raise NotImplementedError(sel)

        def _sel_better(sel: str, new, best):
            return new < best if sel == "mae" else new > best

        def epoch_group(params_main, params_bert, params_vmi, oms, ovs,
                        bank, best_v, best_t,
                        train_flats, idx_plans, mask_plans, labels_plans,
                        valid_batches, valid_labels,
                        test_batches, test_labels,
                        rngs, lrs_main, lrs_vmi, epoch_ids,
                        text_plans, plateau_state,
                        n_passes: int, stage1_mode: str, sel: str,
                        n_bank: int, n_valid: int,
                        plateau_cfg=None, save_feats: bool = False,
                        batch_sharding=None):
            """Run G = idx_plans.shape[0] full epochs in one program.

            best_v / best_t: device-resident best-model snapshots
            (dicts with pm/pb/pv/oms/ovs/bank/epoch/metric), threaded
            through the scan and conditionally replaced after each
            epoch's evals — the in-graph equivalent of the host's
            _device_snapshot + current_result_better bookkeeping
            (ref: Solver.py:59-93).

            Optional extensions (round 5):
            - text_plans: per-epoch tokenized text ({"train"/"valid"/
              "test": (ids, types, amask) each [G, NB, bs, T]}) for
              AVEC's random-word augmentation (ref Customization.py:66-76)
              — the host pre-draws every epoch's words with the loaders'
              own RNG streams and ships the token plans; modality
              tensors stay device-resident.
            - plateau_state + plateau_cfg=(rate, patience, mode): the
              ReduceLROnPlateau schedule runs IN-SCAN on this epoch's
              valid loss (ref Solver.py:52-57,163-170): each epoch uses
              the factor carried from the previous epoch's update, so
              grouped dispatch no longer needs metric-independent LR.
              lrs_main/lrs_vmi then carry the BASE lrs per epoch.
            - save_feats: best snapshots also capture the eval feature
              tuples (F,T,A,V per split) so --save_best_features can
              stream them from the device at group end.
            - batch_sharding: NamedSharding pinning the gathered train
              batches' layout (data-parallel meshes): [NB, bs, ...]
              with bs split over the mesh's batch axes."""
            d_common = bank.F.shape[1]
            bank_dtype = bank.F.dtype

            def body(carry, inp):
                (p_main, p_bert, p_vmi, oms, ovs, bank, bv, bt,
                 pstate) = carry
                (idx_plan, mask_plan, labels_stack, ks, lr_m, lr_v,
                 epoch_id, text_plan) = inp
                base_lr_m = lr_m
                if plateau_cfg is not None:
                    # lr_m/lr_v are the BASE lrs; the factor lives in
                    # the carried plateau state (updated after evals)
                    lr_m = lr_m * pstate["factor"]
                    lr_v = lr_v * pstate["factor"]
                oms.hyperparams["learning_rate"] = lr_m
                ovs.hyperparams["learning_rate"] = lr_v

                batches = jax.tree_util.tree_map(
                    lambda a: jnp.take(a, idx_plan, axis=0), train_flats)
                batches["sample_mask"] = mask_plan
                if text_plan is not None and "train" in text_plan:
                    ids, types, amask = text_plan["train"]
                    batches["bert_sentences"] = ids
                    batches["bert_sentence_types"] = types
                    batches["bert_sentence_att_mask"] = amask
                if batch_sharding is not None:
                    batches = jax.tree_util.tree_map(
                        lambda a: jax.lax.with_sharding_constraint(
                            a, batch_sharding), batches)

                # stage 1 (group epochs always have a filled bank)
                if stage1_mode == "cached":
                    p_vmi, ovs, loss_mi = critic_epoch_cached(
                        p_main, p_bert, p_vmi, ovs, bank, ks[0],
                        n_passes=n_passes, nb=idx_plan.shape[0])
                elif stage1_mode == "fast":
                    p_vmi, ovs, loss_mi = critic_epoch(
                        p_main, p_bert, p_vmi, ovs, batches, labels_stack,
                        bank, ks[0], n_passes=n_passes)
                else:
                    p_vmi, ovs, loss_mi = critic_epoch_fresh(
                        p_main, p_bert, p_vmi, ovs, batches, labels_stack,
                        bank, ks[0], n_passes=n_passes)

                new_bank = FeatureBank.create(n_bank, n_valid, d_common,
                                              dtype=bank_dtype)
                (p_main, p_bert, oms, losses, mis, outs, new_bank) = (
                    train_epoch(p_main, p_bert, p_vmi, oms, batches,
                                labels_stack, bank, new_bank, ks[1],
                                use_mi=True))
                bank = new_bank

                def eval_with_text(split, ebatches):
                    if text_plan is not None and split in text_plan:
                        ids, types, amask = text_plan[split]
                        ebatches = dict(
                            ebatches, bert_sentences=ids,
                            bert_sentence_types=types,
                            bert_sentence_att_mask=amask)
                        if batch_sharding is not None:
                            ebatches = jax.tree_util.tree_map(
                                lambda a: jax.lax.with_sharding_constraint(
                                    a, batch_sharding), ebatches)
                    return ebatches

                v_batches = eval_with_text("valid", valid_batches)
                t_batches = eval_with_text("test", test_batches)
                v_losses, v_mis, v_outs, v_feats = eval_epoch(
                    p_main, p_bert, p_vmi, v_batches, valid_labels,
                    bank, ks[2], use_mi=True)
                t_losses, t_mis, t_outs, t_feats = eval_epoch(
                    p_main, p_bert, p_vmi, t_batches, test_labels,
                    bank, ks[3], use_mi=True)

                val_metric = _sel_metric(sel, v_outs, valid_labels,
                                         valid_batches["sample_mask"])
                test_metric = _sel_metric(sel, t_outs, test_labels,
                                          test_batches["sample_mask"])
                snap = {"pm": p_main, "pb": p_bert, "pv": p_vmi,
                        "oms": oms, "ovs": ovs, "bank": bank,
                        "epoch": epoch_id,
                        "metric": jnp.float32(0)}
                if save_feats:
                    snap["feats_v"] = v_feats
                    snap["feats_t"] = t_feats
                v_better = _sel_better(sel, val_metric, bv["metric"])
                bv = _select_tree(
                    v_better, dict(snap, metric=val_metric), bv)
                t_better = _sel_better(sel, test_metric, bt["metric"])
                bt = _select_tree(
                    t_better, dict(snap, metric=test_metric), bt)

                if plateau_cfg is not None:
                    # ReduceLROnPlateau on this epoch's valid loss,
                    # mirroring train/optim.LRScheduler.step exactly
                    # (ref: torch ReduceLROnPlateau / Solver.py:163-170)
                    rate, patience, mode = plateau_cfg
                    val_loss = jnp.sum(v_losses) / v_losses.shape[0]
                    better = (val_loss < pstate["best"] if mode == "min"
                              else val_loss > pstate["best"])
                    best = jnp.where(better, val_loss, pstate["best"])
                    bad = jnp.where(better, 0, pstate["bad"] + 1)
                    decay = bad > patience
                    factor = jnp.where(decay,
                                       pstate["factor"] * rate,
                                       pstate["factor"])
                    bad = jnp.where(decay, 0, bad)
                    pstate = {"factor": factor, "best": best, "bad": bad}
                    # report the POST-update LR — the per-epoch plateau
                    # path logs/stamps the factor after its
                    # end-of-epoch step (solver._finalize_epoch)
                    lr_m = base_lr_m * factor

                ys = (loss_mi, losses, mis, outs,
                      v_losses, v_mis, v_outs, val_metric, v_better,
                      t_losses, t_mis, t_outs, test_metric, t_better,
                      lr_m)
                return (p_main, p_bert, p_vmi, oms, ovs, bank, bv, bt,
                        pstate), ys

            if save_feats and "feats_v" not in best_v:
                # seed snapshots arrive without feature slots (the host
                # cannot know their dtype); normalize the carry pytree
                # with zero feats of the exact eval shapes before the
                # scan (eval_shape: no compute)
                def probe(batches, split):
                    if text_plans is not None and split in text_plans:
                        ids, types, amask = (t[0] for t in
                                             text_plans[split])
                        batches = dict(
                            batches, bert_sentences=ids,
                            bert_sentence_types=types,
                            bert_sentence_att_mask=amask)
                    return batches

                def feat_zeros(batches, labels, k):
                    shapes = jax.eval_shape(
                        lambda pm, pb, pv, b, l, bk, kk: eval_epoch(
                            pm, pb, pv, b, l, bk, kk, use_mi=True),
                        params_main, params_bert, params_vmi, batches,
                        labels, bank, k)[3]
                    return jax.tree_util.tree_map(
                        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

                fv = feat_zeros(probe(valid_batches, "valid"),
                                valid_labels, rngs[0][2])
                ft = feat_zeros(probe(test_batches, "test"),
                                test_labels, rngs[0][3])
                best_v = dict(best_v, feats_v=fv, feats_t=ft)
                best_t = dict(best_t,
                              feats_v=jax.tree_util.tree_map(
                                  jnp.copy, fv),
                              feats_t=jax.tree_util.tree_map(
                                  jnp.copy, ft))

            carry = (params_main, params_bert, params_vmi, oms, ovs, bank,
                     best_v, best_t, plateau_state)
            carry, ys = jax.lax.scan(
                body, carry,
                (idx_plans, mask_plans, labels_plans, rngs, lrs_main,
                 lrs_vmi, epoch_ids, text_plans))
            return carry, ys

        self.epoch_group = jax.jit(
            epoch_group,
            static_argnames=("n_passes", "stage1_mode", "sel", "n_bank",
                             "n_valid", "plateau_cfg", "save_feats",
                             "batch_sharding"),
            donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))

        self.critic_step = jax.jit(critic_step, donate_argnums=(2, 3))
        self.features_step = jax.jit(features_step)
        self.critic_update = jax.jit(critic_update, donate_argnums=(2, 3))
        self.critic_epoch = jax.jit(critic_epoch,
                                    static_argnames=("n_passes",),
                                    donate_argnums=(2, 3))
        self.critic_epoch_fresh = jax.jit(critic_epoch_fresh,
                                          static_argnames=("n_passes",),
                                          donate_argnums=(2, 3))
        self.critic_epoch_cached = jax.jit(
            critic_epoch_cached, static_argnames=("n_passes", "nb"),
            donate_argnums=(2, 3))
        self.train_epoch = jax.jit(train_epoch,
                                   static_argnames=("use_mi",),
                                   donate_argnums=(0, 1, 3, 7))
        self.eval_epoch = jax.jit(eval_epoch, static_argnames=("use_mi",))
        self.grad_debug_step = jax.jit(grad_debug_step,
                                       static_argnames=("stage",))
        self.train_step = jax.jit(train_step, static_argnames=("use_mi",),
                                  donate_argnums=(0, 1, 3, 7))
        self.eval_step = jax.jit(eval_step, static_argnames=("use_mi",))
