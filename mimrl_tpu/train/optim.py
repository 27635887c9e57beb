"""Optimizers, parameter partitioning, LR schedules.

Functional re-design of the reference's dual-optimizer setup
(ref: Solver.py:119-170):

- params are partitioned by *top-level module name* into
  bert / vmi (incl. vcmi) / main groups — the same name-based split as
  the reference's ``'bert' in name`` / ``'vmi' in name`` /
  ``'vcmi' in name`` tests (Solver.py:124-133), made structural.
- `optimizer_main` covers bert+main with the bert group's LR scaled by
  ``bert_lr_rate`` (when > 0); `optimizer_vmi` covers the vmi group with
  LR scaled by ``mi_lr_rate`` (``cmi_lr_rate`` is accepted-but-unused,
  matching Solver.py:140-142).
- gradient clipping is by VALUE (torch `clip_grad_value_`,
  ref: Solver.py:212) and torch-Adam style weight decay (L2 added to the
  gradient before the moment updates).
- the learning rate is an injected hyperparameter so all four schedule
  families (step / multi_step / exp / plateau) are host-side epoch
  functions mutating one scalar — no re-jit.
- `--optm SAM` raises NotImplementedError exactly like the reference
  (Solver.py:150-151); a working SAM implementation ships in
  `mimrl_tpu.train.sam` for library parity with Utils.py:471-538.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from mimrl_tpu.core.config import MimrlConfig

BERT_KEYS_PREFIX = "bertmodel"


def partition_params(params: Dict) -> Tuple[Dict, Dict, Dict]:
    """Split a flax params dict (top-level module names) into
    (main, bert, vmi) sub-dicts. Keys are disjoint; merge with
    `merge_params`."""
    main, bert, vmi = {}, {}, {}
    for key, value in params.items():
        if "bert" in key:
            bert[key] = value
        elif key.startswith("vmi_") or key.startswith("vcmi_"):
            vmi[key] = value
        else:
            main[key] = value
    return main, bert, vmi


def merge_params(*parts: Dict) -> Dict:
    out: Dict = {}
    for p in parts:
        out.update(p)
    return out


def bert_freeze_mask(bert_params: Dict, bert_freeze: str) -> Dict:
    """Pytree of 0/1 floats: 0 = frozen (ref: Customization.py:7-16).
    'part' freezes encoder layers <= 8; 'all' freezes everything."""

    def layer_frozen(layer_name: str) -> bool:
        if bert_freeze == "all":
            return True
        if bert_freeze == "part" and layer_name.startswith("layer_"):
            return int(layer_name.split("_")[1]) <= 8
        return False

    mask = {}
    for top, sub in bert_params.items():  # top == 'bertmodel'
        mask[top] = {
            name: jax.tree_util.tree_map(
                lambda _: 0.0 if layer_frozen(name) else 1.0, node)
            for name, node in sub.items()
        }
    return mask


def lock_all_params(params):
    """Zero-update scale tree for every leaf — the optimizer-mask
    equivalent of the reference's requires_grad=False sweep
    (ref: Utils.py:301-304)."""
    return jax.tree_util.tree_map(lambda _: 0.0, params)


def _scale_by_tree(scale_tree):
    """Elementwise multiply updates by a (broadcast) pytree of scalars."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda u, s: u * s, updates, scale_tree)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _base_opt(cfg: MimrlConfig):
    # --moment_dtype bfloat16: first moment / momentum accumulator in
    # bf16 (second moment stays f32). The update step is HBM-bound, so
    # shrinking the streamed state is a direct bandwidth win.
    mu_dtype = (jnp.bfloat16 if getattr(cfg, "moment_dtype", "float32")
                == "bfloat16" else None)
    if cfg.optm == "Adam":
        return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8,
                                   mu_dtype=mu_dtype)
    if cfg.optm == "SGD":
        # momentum 0.9 (ref: Solver.py:148)
        return optax.trace(decay=0.9, accumulator_dtype=mu_dtype)
    if cfg.optm == "SAM":
        # accepted by the parser, rejected by the solver (ref: Solver.py:150)
        raise NotImplementedError(
            "SAM is accepted by the CLI but not wired into the two-stage "
            "solver (reference parity); use mimrl_tpu.train.sam directly."
        )
    raise NotImplementedError(cfg.optm)


def _fused_adam_chain(cfg: MimrlConfig, scale_tree, learning_rate,
                      trailing_empty: int):
    """Single-pass fused equivalent of the
    clip -> (weight_decay) -> scale_by_adam -> [scale_by_tree] -> -lr
    chain: one elementwise kernel per leaf instead of one tree pass per
    transform (each optax transform streams the full update tree through
    HBM; at 110M params that is the dominant optimizer cost).

    State structure is kept IDENTICAL to the optax.chain it replaces
    (EmptyState placeholders in the same positions, ScaleByAdamState at
    the same index) so checkpoints round-trip between the two paths and
    `set_learning_rate` keeps working. Math matches optax bit-for-bit
    modulo elementwise reassociation (tests/test_optim.py).
    """
    assert cfg.optm == "Adam"  # SGD/SAM keep the optax path
    b1, b2, eps = 0.9, 0.999, 1e-8
    mu_dtype = (jnp.bfloat16 if getattr(cfg, "moment_dtype", "float32")
                == "bfloat16" else None)
    n_pre = ((1 if cfg.gradient_clip > 0 else 0)
             + (1 if cfg.weight_decay > 0 else 0))

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        adam = optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)
        states = ([optax.EmptyState()] * n_pre + [adam]
                  + [optax.EmptyState()] * trailing_empty)
        return tuple(states)

    def update_fn(updates, state, params=None):
        adam = state[n_pre]
        count = optax.safe_int32_increment(adam.count)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = learning_rate

        def leaf(g, p, m, v, s):
            g = g.astype(jnp.float32)
            if cfg.gradient_clip > 0:
                g = jnp.clip(g, -cfg.gradient_clip, cfg.gradient_clip)
            if cfg.weight_decay > 0:
                g = g + cfg.weight_decay * p.astype(jnp.float32)
            # NB: `b1 * m` runs in m's dtype (bf16 under --moment_dtype)
            # before promotion — exactly optax's update_moment expression
            m2 = (1.0 - b1) * g + b1 * m
            v2 = (1.0 - b2) * (g * g) + b2 * v
            u = (-lr * s) * ((m2 / c1) / (jnp.sqrt(v2 / c2) + eps))
            m_out = m2.astype(mu_dtype) if mu_dtype else m2
            return u.astype(g.dtype), m_out, v2

        if scale_tree is None:
            scale_tree_eff = jax.tree_util.tree_map(lambda _: 1.0, updates)
        else:
            scale_tree_eff = scale_tree
        if params is None:
            params = jax.tree_util.tree_map(jnp.zeros_like, updates)
        flat = jax.tree_util.tree_map(
            leaf, updates, params, adam.mu, adam.nu, scale_tree_eff,
            is_leaf=lambda x: False)
        u = jax.tree_util.tree_map(lambda t: t[0], flat,
                                   is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree_util.tree_map(lambda t: t[1], flat,
                                    is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[2], flat,
                                    is_leaf=lambda t: isinstance(t, tuple))
        new_adam = optax.ScaleByAdamState(count=count, mu=mu, nu=nu)
        states = ([optax.EmptyState()] * n_pre + [new_adam]
                  + [optax.EmptyState()] * trailing_empty)
        return u, tuple(states)

    return optax.GradientTransformation(init_fn, update_fn)


def make_main_optimizer(cfg: MimrlConfig, params_main: Dict,
                        params_bert: Dict):
    """Optimizer over merge(main, bert) with bert-group LR scaling and
    freeze masking."""
    bert_rate = cfg.bert_lr_rate if cfg.bert_lr_rate > 0 else 1.0
    freeze = bert_freeze_mask(params_bert, cfg.bert_freeze)
    scale_tree = merge_params(
        jax.tree_util.tree_map(lambda _: 1.0, params_main),
        jax.tree_util.tree_map(lambda f: f * bert_rate, freeze),
    )

    def make(learning_rate):
        if getattr(cfg, "fused_optim", False) and cfg.optm == "Adam":
            return _fused_adam_chain(cfg, scale_tree, learning_rate,
                                     trailing_empty=2)
        chain = []
        if cfg.gradient_clip > 0:
            chain.append(optax.clip(cfg.gradient_clip))
        if cfg.weight_decay > 0:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(_base_opt(cfg))
        chain.append(_scale_by_tree(scale_tree))
        chain.append(optax.scale(-learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(make)(learning_rate=cfg.learning_rate)


def make_vmi_optimizer(cfg: MimrlConfig):
    def make(learning_rate):
        if getattr(cfg, "fused_optim", False) and cfg.optm == "Adam":
            return _fused_adam_chain(cfg, None, learning_rate,
                                     trailing_empty=1)
        chain = []
        if cfg.gradient_clip > 0:
            chain.append(optax.clip(cfg.gradient_clip))
        if cfg.weight_decay > 0:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(_base_opt(cfg))
        chain.append(optax.scale(-learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(make)(
        learning_rate=cfg.learning_rate * cfg.mi_lr_rate)


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected LR of an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


class LRScheduler:
    """Host-side epoch scheduler covering the reference's four families
    (ref: Solver.py:153-170). Returns the multiplicative factor applied
    to the base LR; `step(val_loss)` advances one epoch."""

    def __init__(self, cfg: MimrlConfig):
        self.kind = cfg.lr_decrease
        self.rate = cfg.lr_decrease_rate
        self.mode = "min" if cfg.task == "regression" else "max"
        self.factor = 1.0
        self.epoch = 0
        if self.kind == "step":
            self.period = int(cfg.lr_decrease_iter)
        elif self.kind == "multi_step":
            self.milestones = list(map(int, str(cfg.lr_decrease_iter).split("-")))
        elif self.kind == "plateau":
            self.patience = int(cfg.lr_decrease_iter)
            self.best = None
            self.bad_epochs = 0
        elif self.kind != "exp":
            raise NotImplementedError(self.kind)

    @property
    def needs_metric(self) -> bool:
        """True when step() consumes the epoch's valid loss (plateau) —
        such schedules force the synchronous epoch loop: the next epoch's
        LR cannot be set before this epoch's metrics are known."""
        return self.kind == "plateau"

    def step(self, val_metric: float | None = None) -> float:
        """Advance one epoch (called after the epoch, like
        scheduler.step(), ref: Solver.py:52-57) and return the factor."""
        self.epoch += 1
        if self.kind == "step":
            if self.epoch % self.period == 0:
                self.factor *= self.rate
        elif self.kind == "multi_step":
            if self.epoch in self.milestones:
                self.factor *= self.rate
        elif self.kind == "exp":
            self.factor *= self.rate
        elif self.kind == "plateau":
            assert val_metric is not None
            better = (
                self.best is None
                or (self.mode == "min" and val_metric < self.best)
                or (self.mode == "max" and val_metric > self.best)
            )
            if better:
                self.best = val_metric
                self.bad_epochs = 0
            else:
                self.bad_epochs += 1
                if self.bad_epochs > self.patience:
                    self.factor *= self.rate
                    self.bad_epochs = 0
        return self.factor
