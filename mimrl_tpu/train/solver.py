"""Training driver: the two-stage epoch loop, evaluation, model
selection, checkpointing, logging.

Orchestration parity with the reference Solver (ref: Solver.py:18-531):
same epoch structure, label routing, score routing, dual best-model
tracking, epoch log line and telemetry channels — but the host loop only
feeds batches and reads scalars; every numeric step is one of the three
compiled programs in `mimrl_tpu.train.steps`.

TPU-native additions over the reference:
- real resume (`--resume <task_dir>`): the reference's latest_model_path
  is never written (ref: Solver.py:111); here it is, every epoch.
- data parallelism via a jax.sharding mesh instead of DataParallel, with
  the MI critics seeing the *global* batch (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import pickle
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mimrl_tpu.core.checkpoint import CheckpointManager
from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.core.logging import ScalarWriter, log_message, set_logger
from mimrl_tpu.data.pipeline import prefetch
from mimrl_tpu.data.tokenizer import build_tokenizer
from mimrl_tpu.data.universal import get_data_loader
from mimrl_tpu.eval.metrics import current_result_better, get_score_from_result
from mimrl_tpu.models.bert import BertConfig, load_bert_weights
from mimrl_tpu.models.model import MimrlModel, init_full
from mimrl_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from mimrl_tpu.train.optim import (
    LRScheduler,
    make_main_optimizer,
    make_vmi_optimizer,
    merge_params,
    partition_params,
    set_learning_rate,
)
from mimrl_tpu.train.steps import (FeatureBank, StepFactory,
                                   init_training_state)

MI_NAMES = ("ft", "fa", "fv", "in", "spec_t", "spec_a", "spec_v", "comp")


class Solver:
    def __init__(self, opt: MimrlConfig):
        self.opt = opt
        (self.task_path, self.writer, self.ckpt) = self.prepare_checkpoint_log()
        log_message(str(opt))
        log_message("Making logger and dataset...")

        self.tokenizer = build_tokenizer(opt.bert_vocab)
        (self.train_loader, self.valid_loader, self.test_loader,
         self.d_t, self.d_a, self.d_v) = get_data_loader(opt, self.tokenizer)

        log_message("Making model and optimizer...")
        bert_cfg = BertConfig(
            vocab_size=max(self.tokenizer.vocab_size, 64),
            hidden_size=opt.bert_hidden,
            num_hidden_layers=opt.bert_layers,
            num_attention_heads=opt.bert_heads,
            intermediate_size=opt.bert_intermediate or opt.bert_hidden * 4,
            max_position_embeddings=max(512, opt.time_len),
            hidden_dropout_prob=opt.bert_dropout,
            attention_probs_dropout_prob=opt.bert_dropout,
            dtype=jnp.bfloat16 if opt.compute_dtype == "bfloat16"
            else jnp.float32,
            quant=opt.quant,
            # 'auto' engages the Pallas kernel on single-device TPU
            # runs only: under a GSPMD mesh a pallas_call is not
            # auto-partitionable, so a mesh run would replicate the
            # attention activations. Explicit 'on' is honored as
            # configured (single-axis data meshes can still shard the
            # grid's leading batch dim).
            flash_attn=("off" if (opt.flash_attn == "auto"
                                  and (opt.mesh_data != 1
                                       or opt.mesh_model > 1
                                       or opt.mesh_pipe > 1
                                       or opt.mesh_dcn > 1))
                        else opt.flash_attn),
        )
        self.model = MimrlModel(
            d_t=self.d_t, d_a=self.d_a, d_v=self.d_v, d_common=opt.d_common,
            encoders=opt.encoders,
            features_compose_t=opt.features_compose_t,
            features_compose_k=opt.features_compose_k,
            num_class=opt.num_class, activate=opt.activate,
            time_len=opt.time_len,
            d_hiddens=tuple(map(tuple, opt.d_hiddens)),
            d_outs=tuple(map(tuple, opt.d_outs)),
            dropout_mlp=tuple(opt.dropout_mlp), dropout=tuple(opt.dropout),
            bias=opt.bias, ln_first=opt.ln_first,
            res_project=tuple(opt.res_project),
            critic_type=opt.critic_type, baseline_type=opt.baseline_type,
            bound_type=opt.bound_type, k_neighbor=opt.k_neighbor,
            radius=opt.radius, cmi_last_acticate=opt.cmi_last_acticate,
            use_pallas=opt.use_pallas,
            fused_estimators=opt.fused_estimators,
            fused_av_scan=opt.fused_av_scan,
            fusion=opt.fusion, fusion_layers=opt.fusion_layers,
            fusion_heads=opt.fusion_heads,
            moe_experts=opt.moe_experts, moe_topk=opt.moe_topk,
            bert_config=bert_cfg,
        )

        # init params. In dense-text mode (local datasets, SDK/AVEC with
        # --text != text) the BERT tower is never traced, so no BERT
        # params or optimizer state exist at all.
        from mimrl_tpu.data.universal import uses_raw_text

        self.raw_text = uses_raw_text(opt)
        # Param init always uses threefry (init values are independent of
        # --rng_impl); the training-loop key carries the chosen impl on
        # the (typed) key itself — no global state. 'rbg' (hardware
        # RngBitGenerator) makes dropout-mask generation ~free on TPU
        # (+24% train throughput vs threefry at canonical shapes); every
        # key derived from loop_rng (split/fold_in) inherits it.
        self.root_rng = jax.random.PRNGKey(opt.seed)
        init_rng, ortho_rng, _ = jax.random.split(self.root_rng, 3)
        # jax names the counter-based impl 'threefry2x32'; the config
        # surface keeps the short 'threefry' (parity with docs/flags)
        impl = {"threefry": "threefry2x32"}.get(opt.rng_impl, opt.rng_impl)
        self.loop_rng = jax.random.fold_in(
            jax.random.key(opt.seed, impl=impl), 2)
        dummy = self._dummy_batch()
        # Param STRUCTURE first, with ZERO device work (eval_shape): the
        # optimizer factories only consume tree names/shapes. Then the
        # whole training-state init — flax init, orthogonal w_hh re-init
        # (ref: Customization.py:18-21), partition, both optax inits —
        # runs as ONE compiled program (steps.init_training_state);
        # running those eagerly costs ~100 one-off compiles, which is
        # minutes of wall clock on remote-compilation backends.
        var_shapes = jax.eval_shape(
            functools.partial(init_full, self.model),
            {"params": init_rng}, dummy["bert_sentences"],
            dummy["bert_sentence_types"], dummy["bert_sentence_att_mask"],
            dummy["audio"], dummy["video"],
            text_features=dummy.get("text"))
        shapes_main, shapes_bert, _ = partition_params(var_shapes["params"])
        if opt.print_params:
            for name in sorted(var_shapes["params"].keys()):
                log_message("\t" + name)

        # optimizers + schedules (dual, ref: Solver.py:119-170)
        self.opt_main = make_main_optimizer(opt, shapes_main, shapes_bert)
        self.opt_vmi = make_vmi_optimizer(opt)
        (self.params_main, self.params_bert, self.params_vmi,
         self.opt_main_state, self.opt_vmi_state) = init_training_state(
            self.model, self.opt_main, self.opt_vmi, init_rng, ortho_rng,
            dummy, text_features=dummy.get("text"))
        if opt.bert_weights and self.raw_text:
            loaded = load_bert_weights(opt.bert_weights, bert_cfg)
            self.params_bert = dict(self.params_bert)
            self.params_bert["bertmodel"] = loaded["params"]
            log_message(f"Loaded BERT weights from {opt.bert_weights}")
        self.lr_schedule = LRScheduler(opt)
        self.base_lr_main = opt.learning_rate
        self.base_lr_vmi = opt.learning_rate * opt.mi_lr_rate

        # mesh / sharding ("--parallel" is implicit: shard when >1
        # device). An explicit --mesh_data 1 still builds the mesh when
        # another axis is requested (pure pipeline/tensor parallelism).
        n_dev = len(jax.devices())
        wants_mesh = (opt.mesh_data != 1 or opt.mesh_model > 1
                      or opt.mesh_pipe > 1 or opt.mesh_dcn > 1)
        if wants_mesh and n_dev <= 1:
            log_message(
                f"WARNING: --mesh_data/--mesh_model/--mesh_pipe requested "
                f"but only {n_dev} device is visible — running unsharded.")
        if opt.seq_shard and opt.mesh_model <= 1:
            log_message("WARNING: --seq_shard requires --mesh_model > 1 — "
                        "sequence parallelism is disabled.")
        if opt.fusion == "moe" and opt.moe_experts > 1 and opt.mesh_model <= 1:
            log_message("WARNING: --fusion moe with --mesh_model 1: experts "
                        "run unsharded (no expert parallelism).")
        if wants_mesh and n_dev > 1:
            self.mesh = make_mesh(opt.mesh_data, opt.mesh_model,
                                  opt.mesh_pipe, opt.mesh_dcn)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from mimrl_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            if opt.seq_shard and opt.mesh_model > 1:
                bert_cfg = dataclasses.replace(
                    bert_cfg, seq_sharding=NamedSharding(
                        self.mesh, P(DATA_AXIS, MODEL_AXIS, None)))
                self.model = self.model.clone(bert_config=bert_cfg)
            if opt.fusion == "moe" and opt.mesh_model > 1:
                # expert parallelism: [E, bs, S, h] expert activations
                # sharded expert-axis over `model`, batch over `data`
                self.model = self.model.clone(
                    moe_ep_sharding=NamedSharding(
                        self.mesh, P(MODEL_AXIS, DATA_AXIS, None, None)))
            self.params_main = shard_params(self.mesh, self.params_main)
            self.params_bert = shard_params(self.mesh, self.params_bert)
            self.params_vmi = shard_params(self.mesh, self.params_vmi)
        else:
            self.mesh = None

        self.steps = StepFactory(self.model, opt, self.opt_main, self.opt_vmi,
                                 mesh=self.mesh)

        # feature banks: capacity = one row per train-step sample.
        # --bank_dtype bfloat16 halves bank HBM + kNN distance-matmul
        # traffic (the kNN top-k is rank-based, so bf16 distances only
        # reorder genuine near-ties).
        self.n_bank = len(self.train_loader) * opt.batch_size
        n_valid = min(self.train_loader.num_samples, self.n_bank)
        self.bank_dtype = jnp.dtype(opt.bank_dtype)
        self.bank = FeatureBank.create(self.n_bank, n_valid, opt.d_common,
                                       dtype=self.bank_dtype)
        self.have_bank = False  # epoch-0 semantics (ref: Customization.py:97)

        self.start_epoch = 0
        self.global_step = 0
        if opt.resume:
            self._resume(opt.resume)

    # ------------------------------------------------------------------ #
    def _dummy_batch(self) -> Dict[str, np.ndarray]:
        bs, T = self.opt.batch_size, self.opt.time_len
        batch = {
            "bert_sentences": np.zeros((bs, T), np.int32),
            "bert_sentence_types": np.zeros((bs, T), np.int32),
            "bert_sentence_att_mask": np.ones((bs, T), np.int32),
            "audio": np.zeros((bs, T, self.d_a), np.float32),
            "video": np.zeros((bs, T, self.d_v), np.float32),
        }
        if not self.raw_text:
            batch["text"] = np.zeros((bs, T, self.d_t), np.float32)
        return batch

    def prepare_checkpoint_log(self):
        task_path = os.path.join(self.opt.task_dir, self.opt.task_name)
        os.makedirs(task_path, exist_ok=True)
        set_logger(os.path.join(task_path, "Running.log"))
        writer = ScalarWriter(task_path)
        ckpt = CheckpointManager(task_path, backend=self.opt.ckpt_backend)
        ckpt.save_config(self.opt.to_json())
        return task_path, writer, ckpt

    # ------------------------------------------------------------------ #
    def get_label_from_datas(self, batch: Dict) -> np.ndarray:
        """Per-dataset label routing (ref: Solver.py:272-315)."""
        opt = self.opt
        labels = batch["labels"]
        if opt.dataset in ("mosi_Dec", "mosei_Dec"):
            return labels[0]
        if opt.dataset in ("mosi_SDK", "mosei_SDK", "mosi_20", "mosi_50",
                           "mosei_20", "mosei_50"):
            if opt.task == "regression":
                return labels[0]
            if opt.task == "classification" and opt.num_class == 2:
                return labels[1]
            if opt.task == "classification" and opt.num_class == 7:
                return labels[2]
            raise NotImplementedError
        if opt.dataset == "pom_SDK":
            return labels[0][:, 0] if opt.task == "regression" else labels[1]
        if opt.dataset in ("youtube", "youtubev2", "moud", "iemocap_20"):
            return labels[0]
        if opt.dataset in ("mmmo", "mmmov2"):
            return labels[0] if opt.task == "regression" else labels[1]
        if opt.dataset == "pom":
            return labels[0][:, -3] if opt.task == "regression" else labels[1]
        if opt.dataset == "avec2019":
            return labels[0]
        raise NotImplementedError(opt.dataset)

    def _prep(self, batch: Dict):
        """Host->device batch prep (+ optional mesh sharding)."""
        labels = np.asarray(self.get_label_from_datas(batch))
        if self.opt.task == "classification":
            labels_dev = labels.astype(np.int32)
        else:
            labels_dev = labels.astype(np.float32)
        model_batch = {k: batch[k] for k in (
            "bert_sentences", "bert_sentence_types", "bert_sentence_att_mask",
            "text", "audio", "video", "sample_mask") if k in batch}
        # dense-text mode: model routes batch["text"] -> text_features
        # (the reference's feature-text path is dead code,
        # Customization.py:86; this framework makes it functional)
        if self.mesh is not None:
            model_batch = shard_batch(self.mesh, model_batch)
            labels_dev = shard_batch(self.mesh, labels_dev)
        return model_batch, labels_dev, labels

    def _next_rng(self):
        self.global_step += 1
        return jax.random.fold_in(self.loop_rng, self.global_step)

    def _stack_epoch(self, loader):
        """Stack one epoch of batches into [NB, bs, ...] arrays for the
        epoch-scan programs (--epoch_scan). The whole epoch's inputs are
        a few MB at these dataset sizes, so one transfer replaces NB.

        Deterministic loaders (no shuffle, no per-epoch augmentation —
        i.e. the valid/test splits) produce identical stacks every epoch,
        so their device arrays are built once and cached: the host stack
        + transfer drops out of the steady-state epoch entirely."""
        cacheable = (not getattr(loader, "shuffle", True)
                     and not getattr(loader, "avec_random_word", False))
        if not hasattr(self, "_stack_cache"):
            # keyed by the loader OBJECT (identity hash): holding the key
            # keeps the loader alive, so — unlike an id() key — the entry
            # can never alias a new loader that reuses a GC'd id.
            self._stack_cache = {}
        if cacheable and loader in self._stack_cache:
            return self._stack_cache[loader]
        # Device-side shuffle fast path (shuffled loaders, single
        # device): the dataset-order tensors are uploaded ONCE and each
        # epoch ships only the [NB, bs] gather-index plan (a few KB) —
        # the batches are then assembled on-device. Bit-identical to the
        # host restack (same rng object, same cycle-pad: the plan comes
        # from the loader's own epoch_index_plan), but the steady-state
        # epoch no longer pays the host gather + full-epoch H2D upload
        # (~0.55 s/epoch at MOSI scale on a tunneled chip; grows with
        # dataset size). Mesh runs keep the host path (the stack needs
        # per-axis placement); AVEC's per-epoch random-word text is not
        # index-addressable (static_tensors False).
        if (not cacheable and self.mesh is None
                and getattr(loader, "static_tensors", False)
                and not getattr(loader, "avec_random_word", False)
                and os.environ.get("MIMRL_HOST_STACK") != "1"):
            return self._stack_epoch_device_shuffle(loader)
        if self.raw_text:
            fields = ("bert_sentences", "bert_sentence_types",
                      "bert_sentence_att_mask", "audio", "video",
                      "sample_mask")
        else:
            fields = ("text", "audio", "video", "sample_mask")
        cols = {k: [] for k in fields}
        labels_list, labels_np, masks = [], [], []
        for batch in loader:
            for k in fields:
                cols[k].append(batch[k])
            lab = np.asarray(self.get_label_from_datas(batch))
            labels_np.append(lab)
            labels_list.append(lab.astype(
                np.int32 if self.opt.task == "classification"
                else np.float32))
            masks.append(batch["sample_mask"] > 0.5)
        batches = {k: np.stack(v) for k, v in cols.items()}
        labels_stack = np.stack(labels_list)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mimrl_tpu.parallel.mesh import batch_axes

            axes = batch_axes(self.mesh)
            axes_t = axes if isinstance(axes, tuple) else (axes,)
            n_data = int(np.prod([self.mesh.shape[a] for a in axes_t]))

            def place(x):
                if x.ndim >= 2 and x.shape[1] % n_data == 0:
                    spec = P(None, axes)
                else:
                    spec = P()
                    if x.ndim >= 2 and not getattr(
                            self, "_warned_replicated_epoch", False):
                        # a quiet perf cliff otherwise: every device gets
                        # the full epoch instead of a 1/n_data shard
                        self._warned_replicated_epoch = True
                        log_message(
                            f"WARNING: --epoch_scan batch dim {x.shape[1]} "
                            f"is not divisible by mesh data axis {n_data}; "
                            f"replicating the epoch stack to all devices.")
                return jax.device_put(x, NamedSharding(self.mesh, spec))

            batches = jax.tree_util.tree_map(place, batches)
            labels_stack = place(labels_stack)
        if cacheable and self.mesh is None:
            # keep the reusable eval stacks device-resident: passing the
            # cached HOST arrays into a jitted program re-uploads them
            # every epoch (~10 MB/epoch at MOSI scale over a tunneled
            # chip); one device_put here makes every later dispatch a
            # no-copy argument pass
            batches = jax.device_put(batches)
            labels_stack = jax.device_put(labels_stack)
        result = (batches, labels_stack, labels_np, masks)
        if cacheable:
            self._stack_cache[loader] = result
        return result

    def _loader_flats(self, loader):
        """Device-resident dataset-order tensors for a static loader,
        uploaded once and cached (device-side shuffle / epoch groups)."""
        import jax.numpy as jnp

        if not hasattr(self, "_flat_cache"):
            self._flat_cache = {}
            self._gather_epoch = jax.jit(
                lambda flats, idx: jax.tree_util.tree_map(
                    lambda a: jnp.take(a, idx, axis=0), flats))
        if loader not in self._flat_cache:
            if self.raw_text and loader._token_cache is not None:
                ids, types, amask = loader._token_cache
                flats = {"bert_sentences": ids,
                         "bert_sentence_types": types,
                         "bert_sentence_att_mask": amask,
                         "audio": loader._audio, "video": loader._video}
            elif self.raw_text:
                # AVEC random-word text: tokens ship as per-epoch plans
                # (epoch_group text_plans); only the static modalities
                # are device-resident
                flats = {"audio": loader._audio, "video": loader._video}
            else:
                flats = {"text": loader._text_feat,
                         "audio": loader._audio, "video": loader._video}
            if self.mesh is not None:
                # replicate across the dp mesh: the grouped program
                # gathers per-device batches and pins their layout
                from jax.sharding import NamedSharding, PartitionSpec as P
                flats = jax.device_put(
                    flats, NamedSharding(self.mesh, P()))
            else:
                flats = jax.device_put(flats)
            self._flat_cache[loader] = flats
        return self._flat_cache[loader]

    def _stack_eval_static(self, loader):
        """Epoch-constant eval stack for AVEC grouped mode: modalities,
        labels and masks are fixed across epochs (shuffle off); the
        random-word TEXT is the only per-epoch part and ships as token
        plans. Does NOT touch the loader's RNG stream/epoch counter —
        the token pre-draw in _dispatch_epoch_group consumes those
        exactly like __iter__ would (ref: Customization.py:66-76)."""
        if not hasattr(self, "_eval_static_cache"):
            self._eval_static_cache = {}
        if loader in self._eval_static_cache:
            return self._eval_static_cache[loader]
        # shuffle=False: the plan is deterministic, rng is never drawn
        idx_plan, mask_plan = loader.epoch_index_plan(
            np.random.default_rng(0))
        batches = {
            "audio": loader._audio[idx_plan],
            "video": loader._video[idx_plan],
            "sample_mask": mask_plan.astype(np.float32),
        }
        ds_labels = [np.asarray(l) for l in loader.ds.labels]
        lab_all = np.asarray(self.get_label_from_datas(
            {"labels": ds_labels}))
        labels_np = [lab_all[idx_plan[b]]
                     for b in range(idx_plan.shape[0])]
        labels_stack = np.stack([
            lab.astype(np.int32 if self.opt.task == "classification"
                       else np.float32) for lab in labels_np])
        masks = [mask_plan[b] > 0.5 for b in range(idx_plan.shape[0])]
        if self.mesh is None:
            batches = jax.device_put(batches)
            labels_stack = jax.device_put(labels_stack)
        result = (batches, labels_stack, labels_np, masks,
                  np.asarray(idx_plan))
        self._eval_static_cache[loader] = result
        return result

    def _stack_epoch_device_shuffle(self, loader):
        """Fast-path _stack_epoch for shuffled loaders: gather the epoch
        on-device from cached dataset-order tensors (see _stack_epoch)."""
        import jax.numpy as jnp

        flats = self._loader_flats(loader)

        # the loader's own rng + plan (bit-identical batch composition
        # to iterating it); advance its epoch counter exactly like
        # __iter__ so per-batch and scanned paths stay interchangeable
        rng = np.random.default_rng(loader.seed + loader._epoch)
        idx_plan, mask_plan = loader.epoch_index_plan(rng)
        loader._epoch += 1

        batches = dict(self._gather_epoch(flats, jnp.asarray(
            idx_plan, jnp.int32)))
        batches["sample_mask"] = mask_plan.astype(np.float32)

        ds_labels = [np.asarray(lab) for lab in loader.ds.labels]
        labels_np, labels_list, masks = [], [], []
        for b in range(idx_plan.shape[0]):
            lab = np.asarray(self.get_label_from_datas(
                {"labels": [l[idx_plan[b]] for l in ds_labels]}))
            labels_np.append(lab)
            labels_list.append(lab.astype(
                np.int32 if self.opt.task == "classification"
                else np.float32))
            masks.append(mask_plan[b] > 0.5)
        return batches, np.stack(labels_list), labels_np, masks

    # ------------------------------------------------------------------ #
    def train(self, epoch: int):
        """One epoch: stage 1 (critics) x stage1_n, then stage 2 (main)
        (ref: Solver.py:194-248)."""
        opt = self.opt
        t_stage1 = time.time()
        running_loss, running_loss_mi = 0.0, 0.0
        mis_sum = np.zeros(8)
        predictions: List[np.ndarray] = []
        targets: List[np.ndarray] = []

        if opt.epoch_scan and not opt.check_gradient:
            return self._train_epoch_scan(epoch)

        # Stage 1 (skipped at epoch 0, ref: Solver.py:201-203)
        if epoch > 0 and self.have_bank:
            if opt.fast_stage1:
                # one forward per batch, stage1_n critic updates on the
                # cached features (--fast_stage1 perf mode)
                cached = []
                for batch in self.train_loader:
                    model_batch, labels_dev, _ = self._prep(batch)
                    feats = self.steps.features_step(
                        self.params_main, self.params_bert, self.params_vmi,
                        model_batch, self._next_rng())
                    cached.append((feats, labels_dev))
                mi_losses = []
                for _ in range(opt.stage1_n):
                    for feats, labels_dev in cached:
                        (self.params_vmi, self.opt_vmi_state, loss, _mis) = (
                            self.steps.critic_update(
                                self.params_main, self.params_bert,
                                self.params_vmi, self.opt_vmi_state, feats,
                                labels_dev, self.bank, self._next_rng()))
                        mi_losses.append(loss)
                running_loss_mi += float(np.sum([float(l) for l in mi_losses]))
            else:
                for _ in range(opt.stage1_n):
                    mi_losses = []
                    for batch in self.train_loader:
                        model_batch, labels_dev, _ = self._prep(batch)
                        (self.params_vmi, self.opt_vmi_state, loss, _mis) = (
                            self.steps.critic_step(
                                self.params_main, self.params_bert,
                                self.params_vmi, self.opt_vmi_state,
                                model_batch, labels_dev, self.bank,
                                self._next_rng()))
                        mi_losses.append(loss)
                        if opt.check_gradient:
                            self._log_gradients(model_batch, labels_dev, 1)
                    running_loss_mi += float(
                        np.sum([float(l) for l in mi_losses]))

        jax.block_until_ready(jax.tree_util.tree_leaves(self.params_vmi)[0])
        t_stage2 = time.time()
        log_message(f"  stage1: {t_stage2 - t_stage1:.2f}s")

        # Stage 2
        use_mi = self.have_bank
        new_bank = FeatureBank.create(
            self.n_bank, min(self.train_loader.num_samples, self.n_bank),
            opt.d_common, dtype=self.bank_dtype)
        offset = 0
        step_losses, step_mis = [], []
        train_iter = (prefetch(iter(self.train_loader), 2)
                      if opt.num_workers > 0 else self.train_loader)
        for batch in train_iter:
            model_batch, labels_dev, labels_np = self._prep(batch)
            (self.params_main, self.params_bert, self.opt_main_state, loss,
             mis, out, new_bank) = self.steps.train_step(
                self.params_main, self.params_bert, self.params_vmi,
                self.opt_main_state, model_batch, labels_dev, self.bank,
                new_bank, offset, self._next_rng(), use_mi=use_mi)
            step_losses.append(loss)
            step_mis.append(mis)
            if opt.check_gradient and use_mi:
                self._log_gradients(model_batch, labels_dev, 2)
            # keep device arrays; converting here would synchronize the
            # host on every step and break dispatch pipelining
            predictions.append((out, batch["sample_mask"] > 0.5))
            targets.append(labels_np)
            offset += opt.batch_size

        jax.block_until_ready(jax.tree_util.tree_leaves(self.params_main)[0])
        log_message(f"  stage2: {time.time() - t_stage2:.2f}s")
        n = len(self.train_loader)
        running_loss = float(np.sum([float(l) for l in step_losses]))
        mis_sum = np.sum([np.asarray(m) for m in step_mis], axis=0)

        self.bank = new_bank
        self.have_bank = True
        masks = [m for _, m in predictions]
        predictions = np.concatenate(
            [np.asarray(o)[m] for o, m in predictions])
        targets = np.concatenate([t[m] for t, m in zip(targets, masks)])
        train_score = get_score_from_result(
            predictions, targets, opt.dataset, opt.task, opt.num_class)
        return (running_loss / n, running_loss_mi / n,
                (mis_sum / n).tolist(), train_score)

    def _train_epoch_scan_dispatch(self, epoch: int):
        """--epoch_scan: each stage is one dispatched XLA program.
        Returns a finalize() closure: all device programs are enqueued
        asynchronously here; host-side syncing + metric computation is
        deferred so eval dispatches can be queued behind them first
        (the device crunches eval while the host scores training)."""
        opt = self.opt
        batches, labels_stack, labels_np, masks = self._stack_epoch(
            self.train_loader)
        t_dispatch = time.time()
        loss_mi = None
        if epoch > 0 and self.have_bank:
            if opt.stage1_cached:
                # --stage1_cached: critics train on the epoch-stale bank
                # (previous epoch's stage-2 features + labels); stage 1
                # runs no model forward at all
                (self.params_vmi, self.opt_vmi_state, loss_mi) = (
                    self.steps.critic_epoch_cached(
                        self.params_main, self.params_bert, self.params_vmi,
                        self.opt_vmi_state, self.bank, self._next_rng(),
                        n_passes=opt.stage1_n,
                        nb=len(self.train_loader)))
            elif opt.fast_stage1:
                # --fast_stage1 under scan: one forward per batch,
                # critics reuse the cached features across the
                # stage1_n passes
                (self.params_vmi, self.opt_vmi_state, loss_mi) = (
                    self.steps.critic_epoch(
                        self.params_main, self.params_bert, self.params_vmi,
                        self.opt_vmi_state, batches, labels_stack, self.bank,
                        self._next_rng(), n_passes=opt.stage1_n))
            else:
                # reference-exact schedule: fresh forward (new dropout
                # draw) per critic pass per batch, scanned
                (self.params_vmi, self.opt_vmi_state, loss_mi) = (
                    self.steps.critic_epoch_fresh(
                        self.params_main, self.params_bert, self.params_vmi,
                        self.opt_vmi_state, batches, labels_stack, self.bank,
                        self._next_rng(), n_passes=opt.stage1_n))

        use_mi = self.have_bank
        new_bank = FeatureBank.create(
            self.n_bank, min(self.train_loader.num_samples, self.n_bank),
            opt.d_common, dtype=self.bank_dtype)
        (self.params_main, self.params_bert, self.opt_main_state, losses,
         mis, outs, new_bank) = self.steps.train_epoch(
            self.params_main, self.params_bert, self.params_vmi,
            self.opt_main_state, batches, labels_stack, self.bank, new_bank,
            self._next_rng(), use_mi=use_mi)
        self.bank = new_bank
        self.have_bank = True
        log_message(f"  train dispatch: {time.time() - t_dispatch:.2f}s")

        def finalize():
            n = len(self.train_loader)
            running_loss_mi = float(loss_mi) if loss_mi is not None else 0.0
            running_loss = float(jnp.sum(losses))
            mis_sum = np.asarray(jnp.sum(mis, axis=0))
            outs_np = np.asarray(outs)
            predictions = np.concatenate(
                [outs_np[i][m] for i, m in enumerate(masks)])
            targets = np.concatenate(
                [t[m] for t, m in zip(labels_np, masks)])
            train_score = get_score_from_result(
                predictions, targets, opt.dataset, opt.task, opt.num_class)
            return (running_loss / n, running_loss_mi / n,
                    (mis_sum / n).tolist(), train_score)

        return finalize

    def _train_epoch_scan(self, epoch: int):
        return self._train_epoch_scan_dispatch(epoch)()

    def _evaluate_epoch_scan_dispatch(self, loader):
        """Dispatch one eval epoch; host syncing deferred to finalize()."""
        opt = self.opt
        use_mi = self.have_bank
        batches, labels_stack, labels_np, masks = self._stack_epoch(loader)
        losses, mis, outs, feats = self.steps.eval_epoch(
            self.params_main, self.params_bert, self.params_vmi, batches,
            labels_stack, self.bank, self._next_rng(), use_mi=use_mi)

        def finalize():
            n = len(loader)
            outs_np = np.asarray(outs)
            predictions = np.concatenate(
                [outs_np[i][m] for i, m in enumerate(masks)])
            targets = np.concatenate([t[m] for t, m in zip(labels_np, masks)])
            score = get_score_from_result(predictions, targets, opt.dataset,
                                          opt.task, opt.num_class)
            features = None
            if opt.save_best_features:
                feats_np = [np.asarray(f) for f in feats]  # each [NB, bs, d]
                features = [[f[i][m] for f in feats_np]
                            for i, m in enumerate(masks)]
            return (float(jnp.sum(losses)) / n,
                    (np.asarray(jnp.sum(mis, axis=0)) / n).tolist(), score,
                    predictions, targets, features)

        return finalize

    def _evaluate_epoch_scan(self, loader):
        return self._evaluate_epoch_scan_dispatch(loader)()

    # ---------------- epoch groups (--epoch_group) ---------------- #
    def _group_sel(self) -> Optional[str]:
        """On-device selection metric for the in-graph best tracking
        (must mirror eval/metrics.current_result_better)."""
        if self.opt.task == "classification":
            return "acc"
        if self.opt.dataset == "avec2019":
            return "ccc"
        return "mae"

    def _group_sel_key(self) -> str:
        if self.opt.task == "classification":
            return f"{self.opt.num_class}-class_acc"
        return "ccc" if self.opt.dataset == "avec2019" else "mae"

    def _group_mesh_ok(self) -> bool:
        """Grouped dispatch supports pure data-parallel meshes (dcn x
        data; pipe/model axes must be 1): the gathered batches are
        pinned to the mesh's batch axes in-graph. TP/PP keep the
        per-epoch path."""
        if self.mesh is None:
            return True
        from mimrl_tpu.parallel.mesh import MODEL_AXIS, PIPE_AXIS
        return (self.mesh.shape[PIPE_AXIS] == 1
                and self.mesh.shape[MODEL_AXIS] == 1)

    def _group_avec_ok(self, loader) -> bool:
        """AVEC's per-epoch random-word text is handled by pre-drawing
        every epoch's token plans with the loaders' own RNG streams
        (raw-text mode only: feature-text AVEC is static anyway)."""
        return (getattr(loader, "avec_random_word", False)
                and self.raw_text
                and getattr(loader, "tokenizer", None) is not None)

    def _group_supported(self) -> bool:
        opt = self.opt
        loader = self.train_loader
        loader_ok = (getattr(loader, "static_tensors", False)
                     or self._group_avec_ok(loader))
        return (opt.epoch_scan and opt.epoch_group > 1
                and not opt.check_gradient
                and self._group_mesh_ok()
                and not opt.profile_dir
                and loader_ok
                and os.environ.get("MIMRL_HOST_STACK") != "1"
                and self._group_sel() is not None)

    def _dispatch_epoch_group(self, e0: int, g: int, best_v, best_t,
                              pstate=None):
        """Dispatch g epochs as ONE XLA program (steps.epoch_group).
        Host work per group: g index plans (KBs), g LR factors, 4g RNG
        keys (+ for AVEC, g token plans per split). RNG stream, LR
        application points, batch composition and bank flow are
        identical to g per-epoch dispatches. Under a plateau schedule
        the LR factor is carried in-graph (`pstate`, device arrays)
        between groups — no host sync on the metric."""
        opt = self.opt
        loader = self.train_loader
        flats = self._loader_flats(loader)
        avec_text = self._group_avec_ok(loader)
        if avec_text:
            vb, vlab, _, _, v_idx = self._stack_eval_static(
                self.valid_loader)
            tb, tlab, _, _, t_idx = self._stack_eval_static(
                self.test_loader)
        else:
            vb, vlab, _, _ = self._stack_epoch(self.valid_loader)
            tb, tlab, _, _ = self._stack_epoch(self.test_loader)

        ds_labels = [np.asarray(l) for l in loader.ds.labels]
        lab_all = np.asarray(self.get_label_from_datas(
            {"labels": ds_labels}))
        if not hasattr(self, "_epoch_meta"):
            self._epoch_meta = {}
        plateau = self.lr_schedule.needs_metric
        gs0 = self.global_step
        idx_plans, mask_plans, labels_plans = [], [], []
        labels_np_g, masks_g, factors = [], [], []
        text_train = []
        for i in range(g):
            rng = np.random.default_rng(loader.seed + loader._epoch)
            idx_plan, mask_plan = loader.epoch_index_plan(rng)
            if avec_text:
                # SAME generator, drawn after the plan — exactly the
                # order __iter__ consumes it (pipeline.py __iter__)
                tokens = loader._epoch_tokens(rng)
                text_train.append(tuple(
                    np.asarray(t)[idx_plan] for t in tokens))
            loader._epoch += 1
            idx_plans.append(np.asarray(idx_plan, np.int32))
            mask_plans.append(np.asarray(mask_plan, np.float32))
            lab_e = lab_all[idx_plan]
            labels_np_g.append(lab_e)
            masks_g.append(np.asarray(mask_plan) > 0.5)
            labels_plans.append(lab_e.astype(
                np.int32 if opt.task == "classification" else np.float32))
            if plateau:
                # factor decided in-graph from each epoch's valid loss;
                # _epoch_meta is filled in _finalize_group from the
                # emitted per-epoch LRs
                factors.append(None)
            else:
                factors.append(self.lr_schedule.factor)
                self.lr_schedule.step(None)
                # post-step factor + the global_step this epoch will
                # END at, so a best checkpoint resumes exactly like a
                # per-epoch snapshot taken after this epoch
                self._epoch_meta[e0 + i] = (self.lr_schedule.factor,
                                            gs0 + 4 * (i + 1))
        text_plans = None
        if avec_text:
            eval_text = {"valid": [], "test": []}
            for ld, key, idxp in ((self.valid_loader, "valid", v_idx),
                                  (self.test_loader, "test", t_idx)):
                for i in range(g):
                    # each loader owns an independent RNG stream
                    # (seed + its own epoch counter), like __iter__;
                    # shuffle=False so the plan consumes no draws
                    e_rng = np.random.default_rng(ld.seed + ld._epoch)
                    toks = ld._epoch_tokens(e_rng)
                    ld._epoch += 1
                    eval_text[key].append(tuple(
                        np.asarray(t)[idxp] for t in toks))

            def stack3(lst):
                return tuple(np.stack([e[j] for e in lst])
                             for j in range(3))

            text_plans = {"train": stack3(text_train),
                          "valid": stack3(eval_text["valid"]),
                          "test": stack3(eval_text["test"])}

        if plateau:
            lrs_main = np.full(g, self.base_lr_main, np.float32)
            lrs_vmi = np.full(g, self.base_lr_vmi, np.float32)
            plateau_cfg = (self.lr_schedule.rate,
                           self.lr_schedule.patience,
                           self.lr_schedule.mode)
            if pstate is None:
                worst = (np.inf if self.lr_schedule.mode == "min"
                         else -np.inf)
                best0 = (self.lr_schedule.best
                         if self.lr_schedule.best is not None else worst)
                pstate = {"factor": jnp.float32(self.lr_schedule.factor),
                          "best": jnp.float32(best0),
                          "bad": jnp.int32(self.lr_schedule.bad_epochs)}
        else:
            lrs_main = np.asarray(
                [self.base_lr_main * f for f in factors], np.float32)
            lrs_vmi = np.asarray(
                [self.base_lr_vmi * f for f in factors], np.float32)
            plateau_cfg = None
            pstate = None

        batch_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mimrl_tpu.parallel.mesh import batch_axes
            batch_sharding = NamedSharding(
                self.mesh, P(None, batch_axes(self.mesh)))

        counters = np.arange(self.global_step + 1,
                             self.global_step + 4 * g + 1).reshape(g, 4)
        self.global_step += 4 * g
        rngs = jax.vmap(jax.vmap(
            lambda c: jax.random.fold_in(self.loop_rng, c)))(
            jnp.asarray(counters))

        stage1_mode = ("cached" if opt.stage1_cached
                       else "fast" if opt.fast_stage1 else "fresh")
        carry, ys = self.steps.epoch_group(
            self.params_main, self.params_bert, self.params_vmi,
            self.opt_main_state, self.opt_vmi_state, self.bank,
            best_v, best_t, flats,
            jnp.asarray(np.stack(idx_plans)),
            jnp.asarray(np.stack(mask_plans)),
            jnp.asarray(np.stack(labels_plans)),
            vb, vlab, tb, tlab, rngs,
            jnp.asarray(lrs_main), jnp.asarray(lrs_vmi),
            jnp.arange(e0, e0 + g, dtype=jnp.int32),
            text_plans, pstate,
            n_passes=opt.stage1_n, stage1_mode=stage1_mode,
            sel=self._group_sel(), n_bank=self.n_bank,
            n_valid=min(loader.num_samples, self.n_bank),
            plateau_cfg=plateau_cfg,
            save_feats=bool(opt.save_best_features),
            batch_sharding=batch_sharding)
        (self.params_main, self.params_bert, self.params_vmi,
         self.opt_main_state, self.opt_vmi_state, self.bank,
         best_v, best_t, pstate) = carry
        self.have_bank = True
        meta = dict(e0=e0, g=g, labels_np=labels_np_g, masks=masks_g,
                    factors=factors, nb=len(loader), gs0=gs0,
                    plateau=plateau)
        return best_v, best_t, pstate, ys, meta

    def _finalize_group(self, tracking, ys, meta, dt):
        """Host half of one dispatched epoch group: sync the stacked
        per-epoch outputs, compute the metric batteries, replay the
        device's best-model decisions (v_better/t_better bits), and emit
        the per-epoch log lines / TB channels."""
        opt = self.opt
        (loss_mi, losses, mis, outs,
         v_losses, v_mis, v_outs, _v_metric, v_better,
         t_losses, t_mis, t_outs, _t_metric, t_better, lr_used) = ys
        g, nb = meta["g"], meta["nb"]
        if meta.get("plateau"):
            # the factors were decided in-graph; recover them from the
            # emitted per-epoch POST-update LRs (matching the per-epoch
            # plateau path, which logs/stamps after its end-of-epoch
            # step) for TB + best-checkpoint metadata
            facs = (np.asarray(lr_used, np.float64)
                    / self.base_lr_main).tolist()
            meta["factors"] = facs
            for i in range(g):
                self._epoch_meta[meta["e0"] + i] = (
                    facs[i], meta["gs0"] + 4 * (i + 1))
        if self._group_avec_ok(self.train_loader):
            _, _, v_labels_np, v_masks, _ = self._stack_eval_static(
                self.valid_loader)
            _, _, t_labels_np, t_masks, _ = self._stack_eval_static(
                self.test_loader)
        else:
            _, _, v_labels_np, v_masks = self._stack_epoch(
                self.valid_loader)
            _, _, t_labels_np, t_masks = self._stack_epoch(
                self.test_loader)
        nv, nt = len(self.valid_loader), len(self.test_loader)
        outs_np = np.asarray(outs)
        v_outs_np, t_outs_np = np.asarray(v_outs), np.asarray(t_outs)
        loss_mi_np = np.asarray(loss_mi)
        losses_np, mis_np = np.asarray(losses), np.asarray(mis)
        v_losses_np, v_mis_np = np.asarray(v_losses), np.asarray(v_mis)
        t_losses_np, t_mis_np = np.asarray(t_losses), np.asarray(t_mis)
        v_better_np = np.asarray(v_better)
        t_better_np = np.asarray(t_better)

        v_targets = np.concatenate(
            [t[m] for t, m in zip(v_labels_np, v_masks)])
        t_targets = np.concatenate(
            [t[m] for t, m in zip(t_labels_np, t_masks)])

        for i in range(g):
            epoch = meta["e0"] + i
            masks = meta["masks"][i]
            train_preds = np.concatenate(
                [outs_np[i][b][masks[b]] for b in range(nb)])
            train_targs = np.concatenate(
                [meta["labels_np"][i][b][masks[b]] for b in range(nb)])
            train_score = get_score_from_result(
                train_preds, train_targs, opt.dataset, opt.task,
                opt.num_class)
            v_preds = np.concatenate(
                [v_outs_np[i][b][m] for b, m in enumerate(v_masks)])
            t_preds = np.concatenate(
                [t_outs_np[i][b][m] for b, m in enumerate(t_masks)])
            val_score = get_score_from_result(
                v_preds, v_targets, opt.dataset, opt.task, opt.num_class)
            test_score = get_score_from_result(
                t_preds, t_targets, opt.dataset, opt.task, opt.num_class)

            # best-model bookkeeping: replay the DEVICE's decisions (the
            # snapshots were already selected in-graph)
            if bool(v_better_np[i]):
                self._group_v_replaced = True
                log_message("Better valid score found...")
                tracking["score"][0] = val_score
                tracking["predictions"][0] = v_preds
                tracking["targets"][0] = v_targets
                tracking["score"][2] = test_score
                tracking["predictions"][2] = t_preds
                tracking["features"][0] = tracking["features"][2] = None
            if bool(t_better_np[i]):
                self._group_t_replaced = True
                log_message("Better test score found...")
                tracking["score"][1] = test_score
                tracking["predictions"][1] = t_preds
                tracking["targets"][1] = t_targets
                tracking["features"][1] = None

            train_loss = float(np.sum(losses_np[i])) / nb
            train_mis = (np.sum(mis_np[i], axis=0) / nb).tolist()
            val_loss = float(np.sum(v_losses_np[i])) / nv
            val_mis = (np.sum(v_mis_np[i], axis=0) / nv).tolist()
            test_loss = float(np.sum(t_losses_np[i])) / nt
            test_mis = (np.sum(t_mis_np[i], axis=0) / nt).tolist()
            sps = self.train_loader.num_samples / max(dt / g, 1e-9)
            msg = self.build_message(
                epoch, train_loss, train_mis, train_score, val_loss,
                val_mis, val_score, test_loss, test_mis, test_score)
            log_message(msg + f" || {dt / g:.2f}s {sps:.1f} samples/s "
                        f"(group of {g})" + self._hbm_suffix())
            self.log_tf_board(epoch, train_loss, train_mis, train_score,
                              val_loss, val_mis, val_score, test_loss,
                              test_mis, test_score,
                              lr_factor=meta["factors"][i])

    def _dev_best_to_state(self, b) -> Optional[Dict]:
        """Convert a device-resident best snapshot (epoch_group carry
        schema) into the checkpoint state-dict schema."""
        epoch = int(b["epoch"])
        if epoch < 0:
            return None
        factor, gstep = getattr(self, "_epoch_meta", {}).get(
            epoch, (self.lr_schedule.factor, self.global_step))
        return {
            "epoch": epoch,
            "params_main": b["pm"], "params_bert": b["pb"],
            "params_vmi": b["pv"],
            "opt_main_state": b["oms"], "opt_vmi_state": b["ovs"],
            "bank": b["bank"],
            "lr_factor": factor, "global_step": gstep,
        }

    def _solve_loop_grouped(self, opt, tracking):
        """The --epoch_group driver loop: epoch 0 (empty bank) runs on
        the per-epoch scan path, then every subsequent G epochs are ONE
        device dispatch, with group k's host finalization overlapped
        with group k+1's device execution."""
        sel_key = self._group_sel_key()
        e = self.start_epoch
        if not self.have_bank and e < opt.epochs_num:
            t0 = time.time()
            fin_tr = self._train_epoch_scan_dispatch(e)
            fin_v = self._evaluate_epoch_scan_dispatch(self.valid_loader)
            fin_te = self._evaluate_epoch_scan_dispatch(self.test_loader)
            self._finalize_epoch(tracking, e, time.time() - t0, fin_tr,
                                 fin_v, fin_te)
            # the warm-up epoch never enters _dispatch_epoch_group's
            # meta loop; record its post-epoch factor/step so a best
            # snapshot at this epoch carries exact resume metadata
            if not hasattr(self, "_epoch_meta"):
                self._epoch_meta = {}
            self._epoch_meta[e] = (self.lr_schedule.factor,
                                   self.global_step)
            e += 1

        copy = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True) if hasattr(x, "dtype") else x,
            t)
        worst = np.inf if self._group_sel() == "mae" else -np.inf

        def seed(state, score):
            if state is not None and score is not None:
                return {"pm": copy(state["params_main"]),
                        "pb": copy(state["params_bert"]),
                        "pv": copy(state["params_vmi"]),
                        "oms": copy(state["opt_main_state"]),
                        "ovs": copy(state["opt_vmi_state"]),
                        "bank": copy(state["bank"]),
                        "epoch": jnp.int32(state["epoch"]),
                        "metric": jnp.float32(score[sel_key])}
            return {"pm": copy(self.params_main),
                    "pb": copy(self.params_bert),
                    "pv": copy(self.params_vmi),
                    "oms": copy(self.opt_main_state),
                    "ovs": copy(self.opt_vmi_state),
                    "bank": copy(self.bank),
                    "epoch": jnp.int32(-1), "metric": jnp.float32(worst)}

        best_v = seed(tracking["valid_state"], tracking["score"][0])
        best_t = seed(tracking["test_state"], tracking["score"][1])

        pending = None  # (ys, meta, t0)
        pstate = None   # in-graph plateau-LR state, threaded group→group
        while e < opt.epochs_num and not self._preempted:
            g = min(opt.epoch_group, opt.epochs_num - e)
            t0 = time.time()
            best_v, best_t, pstate, ys, meta = self._dispatch_epoch_group(
                e, g, best_v, best_t, pstate)
            if pending is not None:
                p_ys, p_meta, p_t0 = pending
                self._finalize_group(tracking, p_ys, p_meta, t0 - p_t0)
            pending = (ys, meta, t0)
            e += g
            if (opt.save_latest_every > 0
                    and (e % opt.save_latest_every == 0
                         or e >= opt.epochs_num)):
                # group-boundary `latest` (cadence rounds to groups)
                self.ckpt.save("latest", self._state_dict(e - 1))
        if pending is not None:
            p_ys, p_meta, p_t0 = pending
            self._finalize_group(tracking, p_ys, p_meta,
                                 time.time() - p_t0)
        if self._preempted:
            log_message(f"Preemption requested — checkpointing at epoch "
                        f"{e - 1} and stopping.")
            self.ckpt.save("latest", self._state_dict(e - 1))

        if pstate is not None:
            # sync the host plateau schedule from the in-graph state so
            # resume metadata and any later reads agree with the device
            self.lr_schedule.factor = float(pstate["factor"])
            best_metric = float(pstate["best"])
            self.lr_schedule.best = (
                None if not np.isfinite(best_metric) else best_metric)
            self.lr_schedule.bad_epochs = int(pstate["bad"])

        if opt.save_best_features and "feats_v" in best_v:
            # stream the eval features of the winning epochs from the
            # device snapshots (the per-epoch path stores them at each
            # better-epoch; grouped mode keeps them in-snapshot instead)
            if self._group_avec_ok(self.train_loader):
                _, _, _, v_masks, _ = self._stack_eval_static(
                    self.valid_loader)
                _, _, _, t_masks, _ = self._stack_eval_static(
                    self.test_loader)
            else:
                _, _, _, v_masks = self._stack_epoch(self.valid_loader)
                _, _, _, t_masks = self._stack_epoch(self.test_loader)

            def fmt(feats, masks):
                feats_np = [np.asarray(f) for f in feats]
                return [[f[i][m] for f in feats_np]
                        for i, m in enumerate(masks)]

            # only when the device actually replaced the snapshot — a
            # never-beaten SEED snapshot (e.g. the warm-up epoch's
            # host-tracked best) carries zero feats, and the host copy
            # in tracking[] is already correct for it
            if getattr(self, "_group_v_replaced", False):
                tracking["features"][0] = fmt(best_v["feats_v"], v_masks)
                tracking["features"][2] = fmt(best_v["feats_t"], t_masks)
            if getattr(self, "_group_t_replaced", False):
                tracking["features"][1] = fmt(best_t["feats_t"], t_masks)

        # device-tracked best states become the persisted best states
        v_state = self._dev_best_to_state(best_v)
        t_state = self._dev_best_to_state(best_t)
        if v_state is not None:
            tracking["valid_state"] = v_state
        if t_state is not None:
            tracking["test_state"] = t_state

        log_message("Training complete.")
        self.writer.close()
        if tracking["score"][0] is not None:
            self.log_best_scores(tracking["score"])
        self.save_results(tracking["predictions"], tracking["targets"],
                          tracking["features"], tracking["valid_state"],
                          tracking["test_state"])
        return tracking["score"]

    def _log_gradients(self, model_batch, labels_dev, stage: int):
        """--check_gradient: per-PARAMETER name/param-sum/grad-sum lines,
        bert params skipped, matching the reference's print_gradient
        (ref: Solver.py:215-216, Utils.py:11-19)."""
        sums = self.steps.grad_debug_step(
            self.params_main, self.params_bert, self.params_vmi,
            model_batch, labels_dev, self.bank, self._next_rng(), stage)
        for name in sorted(sums):
            p_sum, g_sum = sums[name]
            log_message(f"-->name: {name}")
            log_message(f"-->para: {float(p_sum):.6f}")
            log_message(f"-->grad_value: {float(g_sum):.6f}")
            log_message("=" * 25)

    def evaluate(self, loader):
        """No-grad eval pass (ref: Solver.py:250-270)."""
        opt = self.opt
        if opt.epoch_scan:
            return self._evaluate_epoch_scan(loader)
        use_mi = self.have_bank
        losses, mis_list = [], []
        predictions, targets, features = [], [], []
        loader_iter = (prefetch(iter(loader), 2)
                       if opt.num_workers > 0 else loader)
        for batch in loader_iter:
            model_batch, labels_dev, labels_np = self._prep(batch)
            loss, mis, out, feats = self.steps.eval_step(
                self.params_main, self.params_bert, self.params_vmi,
                model_batch, labels_dev, self.bank, self._next_rng(),
                use_mi=use_mi)
            losses.append(loss)
            mis_list.append(mis)
            mask = batch["sample_mask"] > 0.5
            predictions.append((out, mask))
            targets.append(labels_np)
            if opt.save_best_features:
                features.append(([np.asarray(f) for f in feats], mask))

        n = len(loader)
        masks = [m for _, m in predictions]
        predictions = np.concatenate(
            [np.asarray(o)[m] for o, m in predictions])
        targets = np.concatenate([t[m] for t, m in zip(targets, masks)])
        if opt.save_best_features:
            features = [[f[m] for f in fl] for fl, m in features]
        score = get_score_from_result(predictions, targets, opt.dataset,
                                      opt.task, opt.num_class)
        avg_loss = float(np.sum([float(l) for l in losses])) / n
        avg_mis = (np.sum([np.asarray(m) for m in mis_list], axis=0) / n
                   ).tolist()
        return (avg_loss, avg_mis, score, predictions, targets,
                features if opt.save_best_features else None)

    # ------------------------------------------------------------------ #
    def _device_snapshot(self, epoch: int):
        """Device-resident snapshot: fresh HBM copies (cheap, ~ms) so the
        jitted steps' donations can't invalidate them. Converted to host
        arrays only when actually written to disk."""
        copy = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True) if hasattr(x, "dtype") else x,
            t)
        return {
            "epoch": epoch,
            "params_main": copy(self.params_main),
            "params_bert": copy(self.params_bert),
            "params_vmi": copy(self.params_vmi),
            "opt_main_state": copy(self.opt_main_state),
            "opt_vmi_state": copy(self.opt_vmi_state),
            "bank": copy(self.bank),
            "lr_factor": self.lr_schedule.factor,
            "global_step": self.global_step,
        }

    def _state_dict(self, epoch: int):
        """Host-materialized snapshot: the jitted steps donate their
        param/optimizer buffers, so a snapshot holding live device arrays
        would be invalidated by the next step."""
        return jax.device_get({
            "epoch": epoch,
            "params_main": self.params_main,
            "params_bert": self.params_bert,
            "params_vmi": self.params_vmi,
            "opt_main_state": self.opt_main_state,
            "opt_vmi_state": self.opt_vmi_state,
            "bank": self.bank,
            "lr_factor": self.lr_schedule.factor,
            "global_step": self.global_step,
        })

    def _resume(self, resume_dir: str):
        mgr = CheckpointManager(resume_dir)
        template = self._state_dict(0)
        state = mgr.restore("latest", template)
        if state is None:
            log_message(f"No latest checkpoint in {resume_dir}; fresh start")
            return
        self.params_main = state["params_main"]
        self.params_bert = state["params_bert"]
        self.params_vmi = state["params_vmi"]
        self.opt_main_state = state["opt_main_state"]
        self.opt_vmi_state = state["opt_vmi_state"]
        self.bank = state["bank"]
        self.lr_schedule.factor = float(state["lr_factor"])
        self.global_step = int(state["global_step"])
        self.start_epoch = int(state["epoch"]) + 1
        self.have_bank = self.start_epoch > 0
        log_message(f"Resumed from {resume_dir} at epoch {self.start_epoch}")

    # ------------------------------------------------------------------ #
    def solve(self):
        log_message("Start training...")
        opt = self.opt
        best_score = [None, None, None]  # valid, test, test-at-best-valid
        best_predictions = [None, None, None]
        best_features = [None, None, None]
        best_targets = [None, None]
        best_valid_state, best_test_state = None, None

        # Graceful preemption (SURVEY.md §5.3: the reference has no
        # failure/preemption handling at all): SIGTERM/SIGINT sets a
        # flag; the loop finishes the current epoch, writes a resumable
        # `latest` checkpoint, and returns. `--resume <task_dir>`
        # continues from it.
        self._preempted = False
        prev_handlers = self._install_preemption_handlers()
        try:
            return self._solve_loop(opt, best_score, best_predictions,
                                    best_features, best_targets,
                                    best_valid_state, best_test_state)
        finally:
            # always restore SIGINT/SIGTERM, even if the loop raised —
            # a leaked handler would swallow Ctrl+C for the rest of the
            # process and keep this Solver (params, banks) alive
            self._restore_signal_handlers(prev_handlers)

    def _finalize_epoch(self, tracking, epoch, dt, fin_train, fin_val,
                        fin_test, snap=None, lr_stepped=False):
        """Host half of one epoch: sync the dispatched results, step the
        LR schedule (unless the pipelined dispatch already did), track
        best models, emit the epoch log line / TB channels, and honor the
        checkpoint cadence. In pipelined mode this runs while the device
        crunches the NEXT epoch's programs; `snap` is the device-resident
        state copy taken at dispatch time (the live buffers have already
        been donated to the next epoch's steps by now)."""
        opt = self.opt
        train_loss, train_loss_mi, train_mis, train_score = fin_train()
        (val_loss, val_mis, val_score, val_predictions, val_targets,
         val_features) = fin_val()
        (test_loss, test_mis, test_score, test_predictions,
         test_targets, test_features) = fin_test()

        # LR schedule (applied to BOTH optimizers, ref: Solver.py:52-57).
        # Pipelined dispatch steps metric-independent schedules up front;
        # plateau (needs val_loss) always lands here, on the sync path.
        if not lr_stepped:
            factor = self.lr_schedule.step(val_loss)
            self.opt_main_state = set_learning_rate(
                self.opt_main_state, self.base_lr_main * factor)
            self.opt_vmi_state = set_learning_rate(
                self.opt_vmi_state, self.base_lr_vmi * factor)

        # Best-model tracking (ref: Solver.py:59-93)
        if current_result_better(tracking["score"][0], val_score, opt.task,
                                 opt.num_class, opt.dataset):
            log_message("Better valid score found...")
            tracking["valid_state"] = (
                snap if snap is not None else self._device_snapshot(epoch))
            tracking["score"][0] = val_score
            tracking["predictions"][0] = val_predictions
            tracking["features"][0] = val_features
            tracking["score"][2] = test_score
            tracking["predictions"][2] = test_predictions
            tracking["features"][2] = test_features
            tracking["targets"][0] = val_targets
        if current_result_better(tracking["score"][1], test_score, opt.task,
                                 opt.num_class, opt.dataset):
            log_message("Better test score found...")
            tracking["test_state"] = (
                snap if snap is not None else self._device_snapshot(epoch))
            tracking["score"][1] = test_score
            tracking["predictions"][1] = test_predictions
            tracking["features"][1] = test_features
            tracking["targets"][1] = test_targets

        sps = self.train_loader.num_samples / max(dt, 1e-9)
        msg = self.build_message(epoch, train_loss, train_mis, train_score,
                                 val_loss, val_mis, val_score, test_loss,
                                 test_mis, test_score)
        log_message(msg + f" || {dt:.1f}s {sps:.1f} samples/s"
                    + self._hbm_suffix())
        self.log_tf_board(epoch, train_loss, train_mis, train_score,
                          val_loss, val_mis, val_score, test_loss,
                          test_mis, test_score)
        if opt.save_latest_every > 0 and (
                epoch % opt.save_latest_every == opt.save_latest_every - 1
                or epoch == opt.epochs_num - 1):
            state = (jax.device_get(snap) if snap is not None
                     else self._state_dict(epoch))
            self.ckpt.save("latest", state)

    def _solve_loop(self, opt, best_score, best_predictions, best_features,
                    best_targets, best_valid_state, best_test_state):
        profiling = False
        tracking = {"score": best_score, "predictions": best_predictions,
                    "features": best_features, "targets": best_targets,
                    "valid_state": best_valid_state,
                    "test_state": best_test_state}
        if self._group_supported():
            return self._solve_loop_grouped(opt, tracking)
        if opt.epoch_group > 1:
            log_message(
                "WARNING: --epoch_group requires --epoch_scan + a "
                "device-shuffle-capable (or AVEC raw-text) loader, a "
                "data-parallel-only mesh (pipe=model=1), and no "
                "check_gradient/profiling; falling back to per-epoch "
                "dispatch.")
        scan_mode = opt.epoch_scan and not opt.check_gradient
        # Pipelined epochs: epoch e's host work (metric battery, TB/log,
        # best bookkeeping, checkpoint pulls) overlaps epoch e+1's device
        # execution. Safe (bit-identical) whenever the next epoch's LR
        # does not depend on this epoch's valid loss; profiling epochs
        # stay synchronous so the trace brackets exactly one epoch.
        pipelined = (scan_mode and opt.pipeline_epochs
                     and not self.lr_schedule.needs_metric
                     and not opt.profile_dir)
        pending = None  # (epoch, t0, fin_train, fin_val, fin_test, snap)

        for epoch in range(self.start_epoch, opt.epochs_num):
            if opt.profile_dir and epoch == self.start_epoch + 1:
                # trace the first post-compile epoch (SURVEY.md §5.1)
                jax.profiler.start_trace(opt.profile_dir)
                profiling = True
            t0 = time.time()
            if scan_mode:
                # dispatch ALL of the epoch's programs (stage1, stage2,
                # valid eval, test eval) before syncing anything: the
                # host computes training metrics while the device is
                # still running the eval scans
                fin_train = self._train_epoch_scan_dispatch(epoch)
                fin_val = self._evaluate_epoch_scan_dispatch(
                    self.valid_loader)
                fin_test = self._evaluate_epoch_scan_dispatch(
                    self.test_loader)
            else:
                tr = self.train(epoch)
                ev_val = self.evaluate(self.valid_loader)
                ev_test = self.evaluate(self.test_loader)
                fin_train = lambda tr=tr: tr
                fin_val = lambda ev=ev_val: ev
                fin_test = lambda ev=ev_test: ev

            if pipelined:
                # advance the metric-independent LR schedule NOW so the
                # next iteration's dispatch sees it (this epoch's
                # programs were dispatched above with this epoch's LR),
                # then snapshot the dispatched state before the next
                # epoch's donations invalidate the live buffers
                factor = self.lr_schedule.step(None)
                self.opt_main_state = set_learning_rate(
                    self.opt_main_state, self.base_lr_main * factor)
                self.opt_vmi_state = set_learning_rate(
                    self.opt_vmi_state, self.base_lr_vmi * factor)
                snap = self._device_snapshot(epoch)
                if pending is not None:
                    p_epoch, p_t0, pf_tr, pf_v, pf_te, p_snap = pending
                    # dt = dispatch-to-dispatch = steady-state wall/epoch
                    self._finalize_epoch(tracking, p_epoch, t0 - p_t0,
                                         pf_tr, pf_v, pf_te, snap=p_snap,
                                         lr_stepped=True)
                pending = (epoch, t0, fin_train, fin_val, fin_test, snap)
                if self._preempted:
                    break  # drained + checkpointed below
                continue

            self._finalize_epoch(tracking, epoch, time.time() - t0,
                                 fin_train, fin_val, fin_test)
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
                log_message(f"Profiler trace written to {opt.profile_dir}")
            if self._preempted:
                log_message(f"Preemption requested — checkpointing at "
                            f"epoch {epoch} and stopping.")
                self.ckpt.save("latest", self._state_dict(epoch))
                break

        if pending is not None:
            p_epoch, p_t0, pf_tr, pf_v, pf_te, p_snap = pending
            self._finalize_epoch(tracking, p_epoch, time.time() - p_t0,
                                 pf_tr, pf_v, pf_te, snap=p_snap,
                                 lr_stepped=True)
            if self._preempted:
                log_message(f"Preemption requested — checkpointing at "
                            f"epoch {p_epoch} and stopping.")
                self.ckpt.save("latest", jax.device_get(p_snap))

        log_message("Training complete.")
        self.writer.close()
        if tracking["score"][0] is not None:
            self.log_best_scores(tracking["score"])
        self.save_results(tracking["predictions"], tracking["targets"],
                          tracking["features"], tracking["valid_state"],
                          tracking["test_state"])
        return tracking["score"]

    # ------------------------------------------------------------------ #
    def request_preemption(self, *_args):
        """Mark the run for a graceful stop at the end of the current
        epoch (signal-handler entry point; also callable directly).
        On the FIRST signal the previous handlers are restored, so a
        second Ctrl+C aborts immediately instead of being swallowed."""
        self._preempted = True
        self._restore_signal_handlers(getattr(self, "_prev_handlers", None))
        self._prev_handlers = None

    def _install_preemption_handlers(self):
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return None  # signals only deliverable to the main thread
        prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev[sig] = signal.signal(sig, self.request_preemption)
            except (ValueError, OSError):  # non-main interpreter states
                return None
        self._prev_handlers = prev
        return prev

    def _restore_signal_handlers(self, prev):
        if not prev:
            return
        import signal

        for sig, handler in prev.items():
            signal.signal(sig, handler)

    # ------------------------------------------------------------------ #
    def _hbm_suffix(self) -> str:
        """' || HBM peak/live GiB' when the backend exposes memory stats
        (TPU runtimes do; CPU returns None/raises -> empty string). Peak
        HBM is the first thing to check when scaling batch/model size,
        so it rides the epoch log line rather than hiding in a tool."""
        try:
            stats = jax.local_devices()[0].memory_stats()
        except Exception:
            return ""
        if not stats or "peak_bytes_in_use" not in stats:
            return ""
        gib = 1024 ** 3
        peak = stats["peak_bytes_in_use"] / gib
        live = stats.get("bytes_in_use", 0) / gib
        return f" HBM {peak:.2f}/{live:.2f} GiB peak/live"

    def build_message(self, epoch, train_loss, train_mis, train_score,
                      val_loss, val_mis, val_score, test_loss, test_mis,
                      test_score) -> str:
        """Epoch summary line (ref: Solver.py:438-459)."""

        def block(tag, loss, mis, score):
            s = f" {tag}Loss:[{loss:.3f}]"
            s += (" " + tag + "MI_ft/fa/fv/in/st/sa/sv/cp:[" +
                  "/".join(f"{m:.3f}" for m in mis) + "]")
            for key in score:
                s += f" {tag}_{key}:[{score[key]:6.3f}]"
            return s

        msg = f"Epoch:[{epoch + 1:3.0f}] ||"
        msg += block("Train", train_loss, train_mis, train_score)
        msg += " ||" + block("Val", val_loss, val_mis, val_score)
        msg += " ||" + block("Test", test_loss, test_mis, test_score)
        return msg

    def build_single_message(self, score, mode):
        msg = mode
        for key in score:
            msg += f" {key}:[{score[key]:6.3f}]"
        return msg

    def log_tf_board(self, epoch, train_loss, train_mis, train_score,
                     val_loss, val_mis, val_score, test_loss, test_mis,
                     test_score, lr_factor=None):
        """Same channel names as ref: Solver.py:467-507. `lr_factor`
        overrides the live schedule factor — grouped dispatch advances
        the schedule for the whole group up front, so per-epoch Lr
        channels must use the factor the epoch actually ran with."""
        for tag, loss, mis, score in (
            ("Train", train_loss, train_mis, train_score),
            ("Val", val_loss, val_mis, val_score),
            ("Test", test_loss, test_mis, test_score),
        ):
            self.writer.add_scalar(f"{tag}/Loss", loss, epoch)
            for name, value in zip(
                    ("MI_ft", "MI_fa", "MI_fv", "MI_in", "MI_spec_t",
                     "MI_spec_a", "MI_spec_v", "MI_comp"), mis):
                self.writer.add_scalar(f"{tag}/{name}", value, epoch)
            for key in score:
                self.writer.add_scalar(f"{tag}/{key}", score[key], epoch)
        factor = (self.lr_schedule.factor if lr_factor is None
                  else lr_factor)
        self.writer.add_scalar("Lr", self.base_lr_main * factor, epoch)
        self.writer.flush()

    def log_best_scores(self, best_score):
        log_message(self.build_single_message(best_score[0],
                                              "Best Valid Score \t\t"))
        log_message(self.build_single_message(best_score[2],
                                              "Test Score at Best Valid \t"))
        log_message(self.build_single_message(best_score[1],
                                              "Best Test Score \t\t"))

    def save_results(self, best_predictions, best_targets, best_features,
                     best_valid_state, best_test_state):
        """(ref: Solver.py:514-531)"""
        np.save(os.path.join(self.task_path, "predictions_val.npy"),
                best_predictions[0])
        np.save(os.path.join(self.task_path, "predictions_test.npy"),
                best_predictions[1])
        np.save(os.path.join(self.task_path, "predictions_test_for_valid.npy"),
                best_predictions[2])
        np.save(os.path.join(self.task_path, "targets_val.npy"),
                best_targets[0])
        np.save(os.path.join(self.task_path, "targets_test.npy"),
                best_targets[1])
        if self.opt.save_best_features:
            for name, feats in (("features_val", best_features[0]),
                                ("features_test", best_features[1]),
                                ("features_test_for_valid", best_features[2])):
                with open(os.path.join(self.task_path, f"{name}.pkl"),
                          "wb") as f:
                    pickle.dump(feats, f)
        if best_valid_state is not None and self.opt.save_models:
            self.ckpt.save("best_valid", jax.device_get(best_valid_state))
        if best_test_state is not None and self.opt.save_models:
            self.ckpt.save("best_test", jax.device_get(best_test_state))
        # async (orbax) saves must be durable before the run returns
        self.ckpt.wait_until_finished()
