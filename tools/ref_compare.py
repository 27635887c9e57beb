"""Executable comparison against the ACTUAL reference implementation
(the second half of the BASELINE.md protocol).

Runs /root/reference's torch code on CPU (shims: tools/_ref_harness.py)
and mimrl_tpu side by side FROM IDENTICAL WEIGHTS (utils/torch_import)
on identical synthetic Dec data, and diffs:

  forward  — the Model.forward 5-tuple (predictions + 4 feature means)
  losses   — all 11 stage-1 (mi, mi_loss) pairs and all 8 stage-2 MI
             channels + their losses, with IDENTICAL injected kNN
             conditional-product samples (the reference's own
             prod_knn_sample output is replayed into both sides)
  step     — a K-step stage-2 training trajectory: same batch, same
             injected kNN per step, dropout off; reference = torch
             autograd + clip_grad_value_ + torch.optim.Adam; ours = the
             production make_main_optimizer chain. Per-step loss deltas.

Each section reports max abs deltas and a PASS/FAIL verdict against a
tolerance; the whole report is printed as one JSON document (commit it
under docs/). Exit code 1 if any section fails.

Usage:
  python tools/ref_compare.py [--steps 8] [--tol 2e-3] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FORCE CPU. This environment registers a remote-TPU PJRT plugin
# ('axon') via sitecustomize in every python process and overrides
# jax_platforms, so the env var alone is NOT enough (the first run of
# this tool silently landed on the chip, where f32 matmuls use the
# MXU's reduced-precision passes and the f32 tolerances here fail).
# Same recipe as tests/conftest.py: pop the factory before any backend
# initializes. REFCMP_PLATFORM=axon opts back into the chip.
os.environ["JAX_PLATFORMS"] = os.environ.get("REFCMP_PLATFORM", "cpu")
if os.environ["JAX_PLATFORMS"] == "cpu":
    import jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")


# d_common MUST be 128 here: the reference hard-codes embed_dim=128 in
# its estimators (Model.py:285) and prod_knn_sample tiles its samples to
# max(d_x,d_y,d_z)=d_common while VCMIEstimator tiles features to
# embed_dim — any d_common != 128 crashes the reference's own CMI path
# (torch.cat size mismatch at Model.py:174). mimrl_tpu generalizes
# (tiles both to embed_dim), but the comparison must run where the
# reference runs.
BS, TIME_LEN, D_COMMON, D_A, D_V = 8, 12, 128, 5, 20
BERT_LAYERS = 2
CMI_KEYS = ("ac_t", "ta_c", "vc_t", "tv_c", "tc_a", "tc_v")
# (X, Y, Z) bank triples per CMI estimator, in the reference's exact
# call order (ref: Model.py:323-339)
CMI_TRIPLES = {
    "ac_t": ("A", "C", "T"), "ta_c": ("T", "A", "C"),
    "vc_t": ("V", "C", "T"), "tv_c": ("T", "V", "C"),
    "tc_a": ("T", "C", "A"), "tc_v": ("T", "C", "V"),
}
STAGE1_ORDER = ("f_t", "f_a", "f_v", "t_a", "t_v") + CMI_KEYS
STAGE2_CHANNELS = ("f_t", "f_a", "f_v", "inv", "spec_t", "spec_a",
                   "spec_v", "comp")


# one model-level comparison cell = a (encoders, bound, baseline, task)
# point of the reference's config surface. The matrix (--matrix) runs
# forward/losses/trajectory for every cell; round-2's interpolate bug
# proved a composed path can drift even when each component is pinned.
DEFAULT_CELL = dict(encoders="gru", bound_type="infonce",
                    baseline_type="constant", task="regression",
                    num_class=1, loss="MAE")
MATRIX_CELLS = {
    # canonical README recipe (ref: README.md:17-24)
    "gru_infonce_reg": {},
    # alternate A/V encoders (ref: Model.py:247-257)
    "lstm": dict(encoders="lstm"),
    "conv": dict(encoders="conv"),
    # bounds that exercise the baseline model in-model
    # (ref: Model.py:128-130, 141-143; VMI.py:148-154, 229-250)
    "tuba": dict(bound_type="tuba", baseline_type="unnormalized"),
    "interpolate": dict(bound_type="interpolate",
                        baseline_type="unnormalized"),
    # 7-class classification head + CE loss + reshape conventions
    # (ref: Solver.py:325-327, 344-399)
    "cls7_ce": dict(task="classification", num_class=7, loss="CE"),
}


def build_pair(cell=None, f64=False):
    """Reference torch Model and mimrl_tpu model with IDENTICAL weights
    at one config-matrix cell. f64: BERT compute dtype float64 (for the
    drift-attribution section; caller handles param/input casts)."""
    from tools._ref_harness import (build_ref_model, load_reference,
                                    make_ref_opt)

    c = dict(DEFAULT_CELL, **(cell or {}))
    tmp = tempfile.mkdtemp(prefix="refcmp_")
    ref = load_reference(tmp, bert_layers=BERT_LAYERS)
    opt = make_ref_opt([
        "--dataset", "mosi_Dec", "--batch_size", str(BS),
        "--time_len", str(TIME_LEN), "--d_common", str(D_COMMON),
        "--encoders", c["encoders"],
        "--task", c["task"], "--num_class", str(c["num_class"]),
        "--d_hiddens", "12-3-128=4-3-128", "--d_outs", "12-3-128=4-3-128",
        "--dropout_mlp", "0.0-0.0-0.0", "--dropout", "0.0-0.0-0.0-0.0",
        "--bias", "--res_project", "1-1",
        "--bound_type", c["bound_type"], "--critic_type", "separate",
        "--baseline_type", c["baseline_type"],
        "--cmi_last_acticate", "sigmoid",
        "--k_neighbor", "2", "--radius", "1.0",
        "--loss", c["loss"], "--learning_rate", "4e-3",
        "--gradient_clip", "1.0", "--num_workers", "0",
    ])
    ref_model = build_ref_model(opt, d_t=768, d_a=D_A, d_v=D_V, seed=0)

    import jax
    import jax.numpy as jnp

    from mimrl_tpu.models.bert import BertConfig
    from mimrl_tpu.models.model import MimrlModel, init_full
    from mimrl_tpu.utils.torch_import import reference_state_dict_to_params

    model = MimrlModel(
        d_t=768, d_a=D_A, d_v=D_V, d_common=D_COMMON,
        encoders=c["encoders"],
        num_class=c["num_class"], activate="gelu", time_len=TIME_LEN,
        d_hiddens=((12, 3, 128), (4, 3, 128)), d_outs=((12, 3, 128), (4, 3, 128)),
        dropout_mlp=(0.0, 0.0, 0.0), dropout=(0.0, 0.0, 0.0, 0.0),
        bias=True, ln_first=False, res_project=(True, True),
        critic_type="separate", baseline_type=c["baseline_type"],
        bound_type=c["bound_type"], k_neighbor=2, radius=1.0,
        cmi_last_acticate="sigmoid", fused_estimators=False,
        bert_config=BertConfig(
            vocab_size=30522, hidden_size=768,
            num_hidden_layers=BERT_LAYERS, num_attention_heads=12,
            intermediate_size=1536, max_position_embeddings=512,
            dtype=jnp.float64 if f64 else jnp.float32),
    )
    inputs = make_inputs(seed=0)
    template = init_full(model, {"params": jax.random.PRNGKey(0)},
                         *[jnp.asarray(x) for x in inputs])["params"]
    params = reference_state_dict_to_params(
        ref_model.state_dict(), template, encoders=c["encoders"],
        baseline_type=c["baseline_type"])
    return ref, opt, ref_model, model, params


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(100, 30000, (BS, TIME_LEN)).astype(np.int64),
        np.zeros((BS, TIME_LEN), np.int64),
        np.ones((BS, TIME_LEN), np.int64),
        rng.normal(size=(BS, TIME_LEN, D_A)).astype(np.float32),
        rng.normal(size=(BS, TIME_LEN, D_V)).astype(np.float32),
    )


def make_bank(seed=1, n=64):
    rng = np.random.default_rng(seed)
    return {
        "C": rng.normal(size=(n, 1)).astype(np.float32),
        "F": rng.normal(size=(n, D_COMMON)).astype(np.float32),
        "T": rng.normal(size=(n, D_COMMON)).astype(np.float32),
        "A": rng.normal(size=(n, D_COMMON)).astype(np.float32),
        "V": rng.normal(size=(n, D_COMMON)).astype(np.float32),
    }


def sample_knn_with_reference(ref, bank_np, seed):
    """Produce the 6 conditional-product triples by calling the
    reference's OWN prod_knn_sample (host numpy + sklearn) under a fixed
    numpy seed — the exact samples are then replayed into both sides."""
    import torch
    prod = ref["Model"].prod_knn_sample
    np.random.seed(seed)
    out = {}
    for name in CMI_KEYS:
        x, y, z = (torch.from_numpy(bank_np[k]) for k in CMI_TRIPLES[name])
        bx, by, bz = prod(x, y, z, BS, 2, 1.0)
        out[name] = (bx.detach().numpy(), by.detach().numpy(),
                     bz.detach().numpy())
    return out


class _ReplaySampler:
    """Monkeypatch target for the reference's prod_knn_sample: replays
    the recorded triples in call order (stage-1 and stage-2 each make 6
    calls in CMI_KEYS order, ref: Model.py:323-339)."""

    def __init__(self, knn):
        self.queue = []
        self.knn = knn
        self.reset()

    def reset(self):
        import torch
        self.queue = [
            tuple(torch.from_numpy(a) for a in self.knn[name])
            for name in CMI_KEYS]

    def __call__(self, *a, **k):
        return self.queue.pop(0)


def forward_pair(ref_model, model, params, inputs):
    import torch

    import jax.numpy as jnp

    ids, types, mask, audio, video = inputs
    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(ids), torch.from_numpy(types),
            torch.from_numpy(mask), torch.from_numpy(audio),
            torch.from_numpy(video), return_features=True)
    ours = model.apply(
        {"params": params}, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(types.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)), jnp.asarray(audio),
        jnp.asarray(video), deterministic=True, return_features=True)
    return ref_out, ours


def diff_tuple(ref_out, ours, names):
    deltas = {}
    for i, name in enumerate(names):
        r = np.asarray(ref_out[i].detach() if hasattr(ref_out[i], "detach")
                       else ref_out[i], np.float32)
        o = np.asarray(ours[i], np.float32).reshape(r.shape)
        deltas[name] = float(np.max(np.abs(r - o)))
    return deltas


def compare_forward(ref_model, model, params, inputs):
    ref_out, ours = forward_pair(ref_model, model, params, inputs)
    return diff_tuple(ref_out, ours, ("pred", "F_F", "T_F", "A_F", "V_F"))


def compare_losses(ref, ref_model, model, params, inputs, bank_np, knn):
    """Stage-1 11 pairs + stage-2 8 channels from identical features +
    identical kNN samples."""
    import torch

    import jax.numpy as jnp

    ref_out, ours = forward_pair(ref_model, model, params, inputs)
    labels = np.random.default_rng(3).normal(
        size=(BS,)).astype(np.float32)

    replay = _ReplaySampler(knn)
    orig = ref["Model"].prod_knn_sample
    ref["Model"].prod_knn_sample = replay
    try:
        bank_t = {k: torch.from_numpy(v) for k, v in bank_np.items()}
        t_labels = torch.from_numpy(labels)
        with torch.no_grad():
            replay.reset()
            mis1_r, losses1_r = ref_model.compute_vmi_loss_stage1(
                ref_out[0], t_labels, *ref_out[1:5],
                bank_t["C"], bank_t["F"], bank_t["T"], bank_t["A"],
                bank_t["V"])
            replay.reset()
            mis2_r, losses2_r = ref_model.compute_vmi_loss_stage2(
                ref_out[0], t_labels, *ref_out[1:5],
                bank_t["C"], bank_t["F"], bank_t["T"], bank_t["A"],
                bank_t["V"])
    finally:
        ref["Model"].prod_knn_sample = orig

    from mimrl_tpu.models.model import MimrlModel
    knn_j = {k: tuple(jnp.asarray(a) for a in v) for k, v in knn.items()}
    feats = tuple(jnp.asarray(np.asarray(x)) for x in ours[1:5])
    mis1_o, losses1_o = model.apply(
        {"params": params}, jnp.asarray(labels), *feats, knn_j,
        method=MimrlModel.compute_vmi_loss_stage1)
    mis2_o, losses2_o = model.apply(
        {"params": params}, jnp.asarray(labels), *feats, knn_j,
        method=MimrlModel.compute_vmi_loss_stage2)

    def dvec(ref_list, our_list, names):
        return {n: float(abs(float(r) - float(o)))
                for n, r, o in zip(names, ref_list, our_list)}

    return {
        "stage1_mi": dvec(mis1_r, mis1_o, STAGE1_ORDER),
        "stage1_loss": dvec(losses1_r, losses1_o, STAGE1_ORDER),
        "stage2_mi": dvec(mis2_r, mis2_o, STAGE2_CHANNELS),
        "stage2_loss": dvec(losses2_r, losses2_o, STAGE2_CHANNELS),
    }


def _make_labels(cell):
    """Task-appropriate labels: regression floats, or classification
    class ids (the reference buckets regression scores to ids before the
    loss, Solver.py:362-375; here we feed ids directly — the bucketers
    themselves are pinned by tests/test_metrics.py)."""
    c = dict(DEFAULT_CELL, **(cell or {}))
    rng = np.random.default_rng(3)
    if c["task"] == "classification":
        return rng.integers(0, c["num_class"], size=(BS,)).astype(np.int64)
    return rng.normal(size=(BS,)).astype(np.float32)


def _ref_task_loss(torch, opt, out0, t_labels):
    """The reference's task loss incl. its reshape conventions
    (ref: Solver.py:172-342)."""
    if opt.loss == "CE":
        return torch.nn.CrossEntropyLoss()(
            out0.reshape(-1, opt.num_class), t_labels.reshape(-1))
    assert opt.loss == "MAE"
    return torch.mean(torch.abs(
        out0.reshape(-1, 1) - t_labels.reshape(-1, 1).float()))


def compare_step_trajectory(ref, opt, ref_model, model, params, inputs,
                            bank_np, n_steps, cell=None, f64=False,
                            optm="Adam"):
    """K stage-2 updates: task loss + 0.01*sum(stage-2 losses), identical
    kNN per step; reference = torch Adam + clip_grad_value_ (the real
    Solver recipe, Solver.py:221-236), ours = the production optimizer
    chain (train/optim.make_main_optimizer) + the production task-loss
    dispatch (train/losses.compute_task_loss).

    f64=True runs BOTH sides in double precision (torch .double() /
    jax x64) — the drift-attribution experiment: if the per-step deltas
    collapse by ~the f32->f64 precision ratio, the f32 drift is
    torch-vs-XLA round-off (arithmetic), not a semantics gap. Enabling
    jax x64 is process-global; this section must run LAST."""
    import torch

    import jax
    import jax.numpy as jnp

    from mimrl_tpu.core.config import MimrlConfig
    from mimrl_tpu.models.model import MimrlModel
    from mimrl_tpu.train.losses import compute_task_loss
    from mimrl_tpu.train.optim import (make_main_optimizer, merge_params,
                                       partition_params)

    c = dict(DEFAULT_CELL, **(cell or {}))
    labels = _make_labels(cell)
    _f64_restore = None
    if f64:
        import torch as _torch

        jax.config.update("jax_enable_x64", True)
        _f64_restore = (_torch, _torch.Tensor.float,
                        _torch.get_default_dtype())
        # the reference allocates f32 constants inside its modules
        # (e.g. VCMI's BCE targets, Model.py:190-198) — double the
        # default dtype so its whole graph runs in f64. It ALSO
        # hard-codes `.float()` on those targets (Model.py:179,187),
        # which would force f32 back in; redirect .float() to the
        # default floating dtype for the duration of this section
        # (this is the last section of the run).
        _torch.set_default_dtype(_torch.float64)
        _torch.Tensor.float = (
            lambda self: self.to(_torch.get_default_dtype()))
        ref_model = ref_model.double()
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64), params)
        inputs = tuple(x if x.dtype == np.int64 else x.astype(np.float64)
                       for x in inputs)
        labels = labels.astype(np.float64)
        bank_np = {k: v.astype(np.float64) for k, v in bank_np.items()}
    # the patches above are process-global: restore them whatever
    # happens below so later sections / reordered cells see stock
    # torch (f32 default, real Tensor.float)
    try:
        # classification: the reference's stage-2 tiles the (long) class-id
        # labels into C_F (Model.py:345) and later torch.cat's them with
        # float features inside the CMI estimators — a dtype error in the
        # reference itself, i.e. its classification path runs without the
        # in-model MI term. The cell therefore pins head+CE+optimizer with
        # coef2=0; the MI machinery is identical across tasks and pinned by
        # the regression cells.
        coef2 = 0.0 if c["task"] == "classification" else 0.01
        knn_per_step = [sample_knn_with_reference(ref, bank_np, seed=100 + s)
                        for s in range(n_steps)]

        # ---- reference side ----
        ref_model.train()  # dropout is 0.0 everywhere, so still deterministic
        t_in = [torch.from_numpy(x) for x in inputs]
        t_labels = torch.from_numpy(labels)
        bank_t = {k: torch.from_numpy(v) for k, v in bank_np.items()}
        vmi_p, main_p, bert_p = [], [], []
        for name, p in ref_model.named_parameters():
            if "bert" in name:
                bert_p.append(p)
            elif "vmi" in name or "vcmi" in name:
                vmi_p.append(p)
            else:
                main_p.append(p)
        if optm == "SGD":
            # reference SGD recipe: momentum 0.9 (Solver.py:146-148)
            optim = torch.optim.SGD(
                [{"params": bert_p, "lr": 4e-3},
                 {"params": main_p, "lr": 4e-3}], lr=4e-3, momentum=0.9)
        else:
            optim = torch.optim.Adam(
                [{"params": bert_p, "lr": 4e-3},
                 {"params": main_p, "lr": 4e-3}],
                lr=4e-3, weight_decay=0.0)
        replay = _ReplaySampler(knn_per_step[0])
        orig = ref["Model"].prod_knn_sample
        ref["Model"].prod_knn_sample = replay
        ref_losses = []
        try:
            for s in range(n_steps):
                replay.knn = knn_per_step[s]
                replay.reset()
                out = ref_model(*t_in, return_features=True)
                task = _ref_task_loss(torch, opt, out[0], t_labels)
                if coef2:
                    _, losses2 = ref_model.compute_vmi_loss_stage2(
                        out[0], t_labels, *out[1:5], bank_t["C"], bank_t["F"],
                        bank_t["T"], bank_t["A"], bank_t["V"])
                    loss = task + coef2 * sum(losses2)
                else:
                    loss = task
                optim.zero_grad()
                loss.backward()
                torch.nn.utils.clip_grad_value_(
                    [p for p in ref_model.parameters() if p.requires_grad],
                    1.0)
                optim.step()
                ref_losses.append(float(loss))
        finally:
            ref["Model"].prod_knn_sample = orig

        # ---- our side: production optimizer chain ----
        cfg = MimrlConfig(
        # pin reference-equivalent numerics: the solver DEFAULTS may
        # adopt perf dtypes (bf16 Adam moments); the torch side is f32
        moment_dtype="float32", bank_dtype="float32",
            dataset="mosi_Dec", batch_size=BS, time_len=TIME_LEN,
            d_common=D_COMMON, task=c["task"], num_class=c["num_class"],
            d_hiddens=[[12, 3, 128], [4, 3, 128]], d_outs=[[12, 3, 128], [4, 3, 128]],
            dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
            bias=True, res_project=[True, True], loss=c["loss"], optm=optm,
            learning_rate=4e-3, gradient_clip=1.0, weight_decay=0.0,
            loss_mi_coefficient1=[1.0] * 11,
            loss_mi_coefficient2=[coef2] * 8, k_neighbor=2)
        p_main, p_bert, p_vmi = partition_params(params)
        opt_main = make_main_optimizer(cfg, p_main, p_bert)
        opt_state = opt_main.init(merge_params(p_main, p_bert))
        merged_mb = merge_params(p_main, p_bert)

        j_in = (jnp.asarray(inputs[0].astype(np.int32)),
                jnp.asarray(inputs[1].astype(np.int32)),
                jnp.asarray(inputs[2].astype(np.int32)),
                jnp.asarray(inputs[3]), jnp.asarray(inputs[4]))
        j_labels = jnp.asarray(
            labels.astype(np.int32) if c["task"] == "classification"
            else labels)

        import optax

        def loss_fn(mb_params, knn_j):
            full = dict(mb_params, **p_vmi)
            out = model.apply({"params": full}, *j_in, deterministic=True,
                              return_features=True)
            task = compute_task_loss(c["loss"], c["num_class"], out[0],
                                     j_labels)
            if coef2:
                _, losses2 = model.apply(
                    {"params": full}, j_labels, *out[1:5], knn_j,
                    method=MimrlModel.compute_vmi_loss_stage2)
                return task + coef2 * sum(losses2), (task, sum(losses2))
            return task, (task, 0.0)

        @jax.jit
        def step(mb_params, opt_state, knn_j):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                mb_params, knn_j)
            updates, opt_state = opt_main.update(grads, opt_state, mb_params)
            return optax.apply_updates(mb_params, updates), opt_state, loss, aux

        our_losses = []
        for s in range(n_steps):
            knn_j = {k: tuple(jnp.asarray(a) for a in v)
                     for k, v in knn_per_step[s].items()}
            merged_mb, opt_state, loss, aux = step(merged_mb, opt_state, knn_j)
            our_losses.append(float(loss))
            if os.environ.get("REFCMP_DEBUG"):
                print(f"our step {s}: task={float(aux[0]):.6f} "
                      f"mi_sum={float(aux[1]):.6f}", flush=True)

        deltas = [abs(r - o) for r, o in zip(ref_losses, our_losses)]
        return {"ref_losses": ref_losses, "our_losses": our_losses,
                "per_step_abs_delta": deltas}
    finally:
        if _f64_restore is not None:
            _t, _float, _dtype = _f64_restore
            _t.Tensor.float = _float
            _t.set_default_dtype(_dtype)


def compare_two_stage_trajectory(ref, opt, ref_model, model, params,
                                 inputs, bank_np, n_steps):
    """K full two-stage steps with coef2>0: per step, a stage-1 critic
    update (optimizer_vmi) followed by a stage-2 main update whose loss
    includes 0.01 x the 8 MI losses computed THROUGH the just-updated
    critics — MI influences training, unlike the coef2=0 deterministic
    solver diff. The reference's own prod_knn_sample output is replayed
    into both sides at every (step, stage) (ref loop structure:
    Solver.py:200-236; weighting: Customization.py:96-113)."""
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    from mimrl_tpu.core.config import MimrlConfig
    from mimrl_tpu.models.model import MimrlModel
    from mimrl_tpu.train.optim import (make_main_optimizer,
                                       make_vmi_optimizer, merge_params,
                                       partition_params)

    labels = np.random.default_rng(3).normal(size=(BS,)).astype(np.float32)
    coef2 = 0.01
    knn_s1 = [sample_knn_with_reference(ref, bank_np, seed=200 + s)
              for s in range(n_steps)]
    knn_s2 = [sample_knn_with_reference(ref, bank_np, seed=300 + s)
              for s in range(n_steps)]

    # ---- reference side: the real Solver per-batch ops ----
    ref_model.train()  # dropout 0.0 everywhere -> deterministic
    t_in = [torch.from_numpy(x) for x in inputs]
    t_labels = torch.from_numpy(labels)
    bank_t = {k: torch.from_numpy(v) for k, v in bank_np.items()}
    vmi_p, main_p, bert_p = [], [], []
    for name, p in ref_model.named_parameters():
        if "bert" in name:
            bert_p.append(p)
        elif "vmi" in name or "vcmi" in name:
            vmi_p.append(p)
        else:
            main_p.append(p)
    optim_vmi = torch.optim.Adam(vmi_p, lr=4e-3)   # mi_lr_rate=1
    optim_main = torch.optim.Adam(
        [{"params": bert_p, "lr": 4e-3}, {"params": main_p, "lr": 4e-3}],
        lr=4e-3, weight_decay=0.0)
    replay = _ReplaySampler(knn_s1[0])
    orig = ref["Model"].prod_knn_sample
    ref["Model"].prod_knn_sample = replay
    ref_l1, ref_l2 = [], []
    try:
        for s in range(n_steps):
            # stage 1 (Solver.py:200-216)
            replay.knn = knn_s1[s]
            replay.reset()
            out = ref_model(*t_in, return_features=True)
            _, losses1 = ref_model.compute_vmi_loss_stage1(
                out[0], t_labels, *out[1:5], bank_t["C"], bank_t["F"],
                bank_t["T"], bank_t["A"], bank_t["V"])
            loss1 = sum(losses1)  # coef1 all 1.0
            optim_vmi.zero_grad()
            loss1.backward()
            torch.nn.utils.clip_grad_value_(
                [p for p in ref_model.parameters() if p.requires_grad], 1.0)
            optim_vmi.step()
            ref_l1.append(float(loss1))
            # stage 2 (Solver.py:219-236), critics just updated
            replay.knn = knn_s2[s]
            replay.reset()
            out = ref_model(*t_in, return_features=True)
            task = _ref_task_loss(torch, opt, out[0], t_labels)
            _, losses2 = ref_model.compute_vmi_loss_stage2(
                out[0], t_labels, *out[1:5], bank_t["C"], bank_t["F"],
                bank_t["T"], bank_t["A"], bank_t["V"])
            loss2 = task + coef2 * sum(losses2)
            optim_main.zero_grad()
            loss2.backward()
            torch.nn.utils.clip_grad_value_(
                [p for p in ref_model.parameters() if p.requires_grad], 1.0)
            optim_main.step()
            ref_l2.append(float(loss2))
    finally:
        ref["Model"].prod_knn_sample = orig

    # ---- our side: production optimizer chains, jitted two-stage ----
    cfg = MimrlConfig(
        # pin reference-equivalent numerics: the solver DEFAULTS may
        # adopt perf dtypes (bf16 Adam moments); the torch side is f32
        moment_dtype="float32", bank_dtype="float32",
        dataset="mosi_Dec", batch_size=BS, time_len=TIME_LEN,
        d_common=D_COMMON,
        d_hiddens=[[12, 3, 128], [4, 3, 128]],
        d_outs=[[12, 3, 128], [4, 3, 128]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], loss="MAE",
        learning_rate=4e-3, gradient_clip=1.0, weight_decay=0.0,
        mi_lr_rate=1.0, loss_mi_coefficient1=[1.0] * 11,
        loss_mi_coefficient2=[coef2] * 8, k_neighbor=2)
    p_main, p_bert, p_vmi = partition_params(params)
    opt_vmi = make_vmi_optimizer(cfg)
    ovs = opt_vmi.init(p_vmi)
    opt_main = make_main_optimizer(cfg, p_main, p_bert)
    mb = merge_params(p_main, p_bert)
    oms = opt_main.init(mb)

    j_in = (jnp.asarray(inputs[0].astype(np.int32)),
            jnp.asarray(inputs[1].astype(np.int32)),
            jnp.asarray(inputs[2].astype(np.int32)),
            jnp.asarray(inputs[3]), jnp.asarray(inputs[4]))
    j_labels = jnp.asarray(labels)

    def critic_loss(pv, mb, knn_j):
        full = dict(mb, **pv)
        out = model.apply({"params": full}, *j_in, deterministic=True,
                          return_features=True)
        _, losses1 = model.apply(
            {"params": full}, j_labels, *out[1:5], knn_j,
            method=MimrlModel.compute_vmi_loss_stage1)
        return sum(losses1)

    def main_loss(mb, pv, knn_j):
        full = dict(mb, **pv)
        out = model.apply({"params": full}, *j_in, deterministic=True,
                          return_features=True)
        task = jnp.mean(jnp.abs(out[0].reshape(-1, 1)
                                - j_labels.reshape(-1, 1)))
        _, losses2 = model.apply(
            {"params": full}, j_labels, *out[1:5], knn_j,
            method=MimrlModel.compute_vmi_loss_stage2)
        return task + coef2 * sum(losses2)

    @jax.jit
    def two_stage(pv, ovs, mb, oms, knn1_j, knn2_j):
        l1, g1 = jax.value_and_grad(critic_loss)(pv, mb, knn1_j)
        upd, ovs = opt_vmi.update(g1, ovs, pv)
        pv = optax.apply_updates(pv, upd)
        l2, g2 = jax.value_and_grad(main_loss)(mb, pv, knn2_j)
        upd2, oms = opt_main.update(g2, oms, mb)
        mb = optax.apply_updates(mb, upd2)
        return pv, ovs, mb, oms, l1, l2

    our_l1, our_l2 = [], []
    for s in range(n_steps):
        knn1_j = {k: tuple(jnp.asarray(a) for a in v)
                  for k, v in knn_s1[s].items()}
        knn2_j = {k: tuple(jnp.asarray(a) for a in v)
                  for k, v in knn_s2[s].items()}
        pv2, ovs, mb, oms, l1, l2 = two_stage(p_vmi, ovs, mb, oms,
                                              knn1_j, knn2_j)
        p_vmi = pv2
        our_l1.append(float(l1))
        our_l2.append(float(l2))

    return {
        "ref_stage1_loss": ref_l1, "our_stage1_loss": our_l1,
        "ref_stage2_loss": ref_l2, "our_stage2_loss": our_l2,
        "stage1_abs_delta": [abs(a - b) for a, b in zip(ref_l1, our_l1)],
        "stage2_abs_delta": [abs(a - b) for a, b in zip(ref_l2, our_l2)],
    }


def compare_solver_end_to_end(ref, epochs=4, n_train=64,
                              deterministic=False):
    """Run the reference Solver.solve() end to end (its own DataLoader,
    two-stage schedule, selection, metrics) against mimrl_tpu's Solver on
    the SAME pickles, both from the SAME initial weights (torch state
    transferred at init). Remaining divergence sources are the two
    frameworks' independent RNG streams (batch shuffle order + kNN
    subset sampling), so per-epoch deltas are stochastic-level, not
    bitwise: the verdict tolerance is correspondingly loose and the
    point of the diff is catching SEMANTIC drift (wrong loss scale,
    wrong MI channel wiring, wrong metric routing), which shows up as
    O(1) divergence, not O(0.1).

    deterministic=True removes BOTH cross-framework RNG streams from the
    MODEL's trajectory so the per-epoch train loss must track tightly:
    shuffle is forced off on both sides (the reference via a get_loader
    wrapper, ours via the pipeline flag), the stage-2 MI coefficients
    are zeroed (stage-1 critic training still runs — with coef2=0 its
    kNN stream cannot reach the model parameters), and the task loss is
    RMSE (smooth a.e. — MAE's subgradient flips sign on 1-ulp prediction
    differences and turns reduction-order noise chaotic). What remains
    is torch-vs-XLA arithmetic plus the two optimizer implementations,
    i.e. the same surface the 3-step trajectory section pins, but over
    full epochs through both frameworks' REAL data paths (tokenizer,
    collation, padding, label routing)."""
    import tempfile

    import torch

    from tools._ref_harness import make_ref_opt, write_shim_vocab

    data_dir = ref["Config"].Data_path_DecLab
    from mimrl_tpu.data.synthetic import make_dec_fixture
    make_dec_fixture(data_dir, "mosi", n_per_split=(n_train, 16, 16),
                     d_audio=D_A, d_video=D_V, max_len=TIME_LEN, seed=11)

    task_loss = "RMSE" if deterministic else "MAE"
    common = [
        "--dataset", "mosi_Dec", "--batch_size", str(BS),
        "--time_len", str(TIME_LEN), "--d_common", str(D_COMMON),
        "--encoders", "gru",
        "--d_hiddens", "12-3-128=4-3-128", "--d_outs", "12-3-128=4-3-128",
        "--dropout_mlp", "0.0-0.0-0.0", "--dropout", "0.0-0.0-0.0-0.0",
        "--bias", "--res_project", "1-1",
        "--bound_type", "infonce", "--critic_type", "separate",
        "--baseline_type", "constant", "--cmi_last_acticate", "sigmoid",
        "--k_neighbor", "2", "--radius", "1.0", "--stage1_n", "1",
        "--loss", task_loss, "--learning_rate", "4e-3",
        "--gradient_clip", "1.0", "--num_workers", "0",
        "--epochs_num", str(epochs), "--seed", "0",
    ]
    if deterministic:
        common += ["--loss_mi_coefficient2", "-".join(["0.0"] * 8)]
    # --parallel is REQUIRED by the reference: its loss glue hard-codes
    # the DataParallel .module hop (Customization.py:100,107); the
    # harness substitutes a 1-device pass-through wrapper on CPU
    task = "refcmp_det" if deterministic else "refcmp"
    opt = make_ref_opt(common + ["--task_name", task, "--parallel"])

    # --- reference run, recording per-epoch train/eval returns ---
    RefSolver = ref["Solver"].Solver
    rec = {"train": [], "valid": [], "test": []}
    orig_train, orig_eval = RefSolver.train, RefSolver.evaluate

    def train_wrap(self, *a, **k):
        out = orig_train(self, *a, **k)
        rec["train"].append({
            "loss": float(out[0]), "loss_mi": float(out[1]),
            "mis": [float(x) for x in out[2]],
            "score": {k2: float(v) for k2, v in out[3].items()}})
        return out

    def eval_wrap(self, loader, *a, **k):
        out = orig_eval(self, loader, *a, **k)
        split = "valid" if loader is self.valid_loader else "test"
        rec[split].append({
            "loss": float(out[0]),
            "score": {k2: float(v) for k2, v in out[2].items()}})
        return out

    RefSolver.train, RefSolver.evaluate = train_wrap, eval_wrap
    # deterministic mode: force the reference's train DataLoader to
    # dataset order (DataLoaderUniversal.py:57 hard-codes shuffle=True
    # for the Dec train split; it reaches get_loader as a keyword)
    uni = ref["DataLoaderUniversal"]
    orig_get_loader = uni.get_loader
    if deterministic:
        def _noshuffle(*a, **k):
            k["shuffle"] = False
            return orig_get_loader(*a, **k)
        uni.get_loader = _noshuffle
    run_root = tempfile.mkdtemp(prefix="refcmp_run_")
    cwd = os.getcwd()
    init_sd = None
    try:
        os.chdir(run_root)  # reference writes ./TaskRuning/<task_name>
        import random as _random
        _random.seed(0)
        np.random.seed(0)
        torch.manual_seed(0)
        solver = RefSolver(opt)
        init_sd = {k: v.detach().clone().numpy()
                   for k, v in solver.model.state_dict().items()}
        solver.solve()
    finally:
        os.chdir(cwd)
        RefSolver.train, RefSolver.evaluate = orig_train, orig_eval
        uni.get_loader = orig_get_loader

    # --- mimrl_tpu run on the same pickles, same initial weights ---
    from mimrl_tpu.core.config import MimrlConfig
    from mimrl_tpu.train.solver import Solver as OurSolver
    from mimrl_tpu.train.optim import merge_params, partition_params
    from mimrl_tpu.utils.torch_import import reference_state_dict_to_params

    cfg = MimrlConfig(
        # pin reference-equivalent numerics: the solver DEFAULTS may
        # adopt perf dtypes (bf16 Adam moments); the torch side is f32
        moment_dtype="float32", bank_dtype="float32",
        task_name="ourcmp", task_dir=tempfile.mkdtemp(prefix="refcmp_our_"),
        dataset="mosi_Dec", data_dir=data_dir, batch_size=BS,
        time_len=TIME_LEN, d_common=D_COMMON, encoders="gru",
        d_hiddens=[[12, 3, 128], [4, 3, 128]],
        d_outs=[[12, 3, 128], [4, 3, 128]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], loss=task_loss,
        learning_rate=4e-3, gradient_clip=1.0, stage1_n=1,
        k_neighbor=2, epochs_num=epochs, seed=0, num_workers=0,
        loss_mi_coefficient1=[1.0] * 11,
        loss_mi_coefficient2=[0.0] * 8 if deterministic else [0.01] * 8,
        bert_layers=BERT_LAYERS, bert_heads=12, bert_hidden=768,
        bert_intermediate=1536, bert_dropout=0.0,
        bert_vocab=write_shim_vocab(), compute_dtype="float32")
    ours = OurSolver(cfg)
    if deterministic:
        ours.train_loader.shuffle = False  # dataset order, as the ref
    template = merge_params(ours.params_main, ours.params_bert,
                            ours.params_vmi)
    params = reference_state_dict_to_params(init_sd, template)
    p_main, p_bert, p_vmi = partition_params(params)
    ours.params_main, ours.params_bert, ours.params_vmi = (
        p_main, p_bert, p_vmi)
    ours.solve()

    import json as _json
    scalars = [_json.loads(l) for l in
               open(os.path.join(cfg.task_dir, "ourcmp", "scalars.jsonl"))]

    def series(tag):
        return [s["value"] for s in scalars if s["tag"] == tag]

    our_train_loss = series("Train/Loss")
    ref_train_loss = [r["loss"] for r in rec["train"]]
    deltas = [abs(a - b) for a, b in zip(ref_train_loss, our_train_loss)]
    # Train MAE is critic-independent — in the stochastic mode the
    # composite loss legitimately diverges O(1) once the two sides'
    # critics (trained on independent shuffle/kNN streams) produce
    # different MI values under coef2 weighting; MAE isolates the
    # model's actual fit on a comparable scale.
    our_train_mae = series("Train/mae")
    ref_train_mae = [r["score"].get("mae") for r in rec["train"]]
    mae_deltas = [abs(a - b) for a, b in zip(ref_train_mae, our_train_mae)
                  if a is not None]
    mi_tags = ("ft", "fa", "fv", "in", "spec_t", "spec_a", "spec_v", "comp")
    our_mis = {t: series(f"Train/MI_{t}") for t in mi_tags}
    ref_mis = {t: [r["mis"][i] for r in rec["train"]]
               for i, t in enumerate(mi_tags)}
    mi_deltas = {
        t: [abs(a - b) for a, b in zip(ref_mis[t], our_mis[t])]
        for t in mi_tags if our_mis[t]}
    valid_last = rec["valid"][-1]["score"] if rec["valid"] else {}
    return {
        "epochs": epochs,
        "deterministic": deterministic,
        "ref_train_loss": ref_train_loss, "our_train_loss": our_train_loss,
        "train_loss_abs_delta": deltas,
        "ref_train_mae": ref_train_mae, "our_train_mae": our_train_mae,
        "train_mae_abs_delta": mae_deltas,
        "mi_channel_abs_delta_last_epoch":
            {t: d[-1] for t, d in mi_deltas.items()},
        "ref_final_valid_score": valid_last,
        "note": (
            "shuffle off both sides, MI coef2=0, RMSE: the model "
            "trajectory is RNG-free, deltas are torch-vs-XLA arithmetic "
            "+ optimizer-impl only" if deterministic else
            "same pickles, same initial weights; deltas are "
            "stochastic-level (independent shuffle + kNN RNG "
            "streams), semantic drift would be O(1)"),
    }


def run_cell(name, cell, n_steps):
    """One config-matrix cell: forward 5-tuple + all 19 loss channels +
    a K-step trajectory, at identical weights + replayed kNN."""
    ref, opt, ref_model, model, params = build_pair(cell)
    inputs = make_inputs()
    bank_np = make_bank()
    knn = sample_knn_with_reference(ref, bank_np, seed=7)
    out = {"cell": dict(DEFAULT_CELL, **cell)}
    out["forward"] = compare_forward(ref_model, model, params, inputs)
    out["losses"] = compare_losses(ref, ref_model, model, params,
                                   inputs, bank_np, knn)
    out["trajectory"] = compare_step_trajectory(
        ref, opt, ref_model, model, params, inputs, bank_np, n_steps,
        cell=cell)
    # Verdict over forward + losses + the first 2 trajectory steps (with
    # identical weights + identical kNN these pin loss/grad/optimizer
    # semantics; step 0 is bitwise). Later steps drift chaotically — the
    # MAE subgradient flips sign on 1-ulp prediction differences, so
    # torch-vs-XLA reduction order compounds at a per-step Lyapunov rate
    # of ~30-70x (measured: GRU 1e-7 -> 7e-7 -> 5e-5; LSTM starts an
    # order higher at 1e-6 forward round-off and crosses 2e-3 by step
    # 2). Step 2+ is sanity-bounded at 50x tol — a semantic error
    # (wrong loss scale, misrouted channel) shows as O(0.1)+ there.
    traj = out["trajectory"]["per_step_abs_delta"]
    out["worst_abs_delta"] = max(
        max(out["forward"].values()),
        max(max(d.values()) for d in out["losses"].values()),
        max(traj[:2]),
    )
    out["traj_step2_sane"] = len(traj) < 3 or traj[2] <= 0.1
    return ref, opt, ref_model, model, params, inputs, bank_np, out


def compare_solver_sdk(ref, epochs=4, n_train=64):
    """Deterministic Solver-vs-Solver through the CMU-SDK loader path
    (ref: DataLoaderCMUSDK.py:86-119 + the raw-text tokenize-in-loop
    adapter, Customization.py:55-84): same pickles, same initial
    weights, shuffle off both sides, coef2=0, RMSE. This executes the
    reference's OTHER data path end to end — feature-slot selection,
    NaN scrub, minmax normalize, sort-by-length collate, per-batch
    tokenization — against our static pipeline."""
    import tempfile

    import torch

    from tools._ref_harness import make_ref_opt, write_shim_vocab

    sdk_dir = tempfile.mkdtemp(prefix="refcmp_sdk_")
    from mimrl_tpu.data.synthetic import make_sdk_fixture
    # fixed_len=TIME_LEN: uniform sample lengths make the reference's
    # batch-max padding numerically identical to our static time_len
    # padding (the general case diverges by the documented static-shape
    # time-mean semantics, models/model.py module docstring) — the cell
    # pins the LOADER path: slot selection, NaN scrub, normalize,
    # collate, tokenize, label routing.
    make_sdk_fixture(sdk_dir, "mosi", n_per_split=(n_train, 16, 16),
                     d_audio=74, d_video=35, max_len=TIME_LEN, seed=13,
                     fixed_len=TIME_LEN)
    # DataLoaderCMUSDK bound DATA_PATH at import (line 30); patch the
    # live module attribute, not Config
    sys.modules["DataLoaderCMUSDK"].DATA_PATH = sdk_dir

    common = [
        "--dataset", "mosi_SDK", "--batch_size", str(BS),
        "--time_len", str(TIME_LEN), "--d_common", str(D_COMMON),
        "--encoders", "gru",
        "--text", "text", "--audio", "covarep", "--video", "facet42",
        "--normalize", "0-1-1", "--log_scale", "0-0-0",
        "--d_hiddens", "12-3-128=4-3-128", "--d_outs", "12-3-128=4-3-128",
        "--dropout_mlp", "0.0-0.0-0.0", "--dropout", "0.0-0.0-0.0-0.0",
        "--bias", "--res_project", "1-1",
        "--bound_type", "infonce", "--critic_type", "separate",
        "--baseline_type", "constant", "--cmi_last_acticate", "sigmoid",
        "--k_neighbor", "2", "--radius", "1.0", "--stage1_n", "1",
        "--loss", "RMSE", "--learning_rate", "4e-3",
        "--gradient_clip", "1.0", "--num_workers", "0",
        "--epochs_num", str(epochs), "--seed", "0",
        "--loss_mi_coefficient2", "-".join(["0.0"] * 8),
        "--task_name", "refcmp_sdk", "--parallel",
    ]
    opt = make_ref_opt(common)

    RefSolver = ref["Solver"].Solver
    rec = {"train": [], "valid": [], "test": []}
    orig_train, orig_eval = RefSolver.train, RefSolver.evaluate

    def train_wrap(self, *a, **k):
        out = orig_train(self, *a, **k)
        rec["train"].append({
            "loss": float(out[0]),
            "score": {k2: float(v) for k2, v in out[3].items()}})
        return out

    def eval_wrap(self, loader, *a, **k):
        out = orig_eval(self, loader, *a, **k)
        split = "valid" if loader is self.valid_loader else "test"
        rec[split].append({
            "loss": float(out[0]),
            "score": {k2: float(v) for k2, v in out[2].items()}})
        return out

    RefSolver.train, RefSolver.evaluate = train_wrap, eval_wrap
    # force the SDK train DataLoader to dataset order
    # (DataLoaderUniversal.py:25 hard-codes shuffle=True)
    uni = ref["DataLoaderUniversal"]
    orig_dl = uni.DataLoader

    def _noshuffle_dl(*a, **k):
        k["shuffle"] = False
        return orig_dl(*a, **k)

    uni.DataLoader = _noshuffle_dl
    run_root = tempfile.mkdtemp(prefix="refcmp_sdk_run_")
    cwd = os.getcwd()
    init_sd = None
    try:
        os.chdir(run_root)
        import random as _random
        _random.seed(0)
        np.random.seed(0)
        torch.manual_seed(0)
        solver = RefSolver(opt)
        init_sd = {k: v.detach().clone().numpy()
                   for k, v in solver.model.state_dict().items()}
        solver.solve()
    finally:
        os.chdir(cwd)
        RefSolver.train, RefSolver.evaluate = orig_train, orig_eval
        uni.DataLoader = orig_dl

    from mimrl_tpu.core.config import MimrlConfig
    from mimrl_tpu.train.solver import Solver as OurSolver
    from mimrl_tpu.train.optim import merge_params, partition_params
    from mimrl_tpu.utils.torch_import import reference_state_dict_to_params

    cfg = MimrlConfig(
        # pin reference-equivalent numerics: the solver DEFAULTS may
        # adopt perf dtypes (bf16 Adam moments); the torch side is f32
        moment_dtype="float32", bank_dtype="float32",
        task_name="ourcmp_sdk",
        task_dir=tempfile.mkdtemp(prefix="refcmp_sdk_our_"),
        dataset="mosi_SDK", data_dir=sdk_dir, batch_size=BS,
        time_len=TIME_LEN, d_common=D_COMMON, encoders="gru",
        text="text", audio="covarep", video="facet42",
        normalize=[False, True, True], log_scale=[False, False, False],
        d_hiddens=[[12, 3, 128], [4, 3, 128]],
        d_outs=[[12, 3, 128], [4, 3, 128]],
        dropout_mlp=[0.0, 0.0, 0.0], dropout=[0.0, 0.0, 0.0, 0.0],
        bias=True, res_project=[True, True], loss="RMSE",
        learning_rate=4e-3, gradient_clip=1.0, stage1_n=1,
        k_neighbor=2, epochs_num=epochs, seed=0, num_workers=0,
        loss_mi_coefficient1=[1.0] * 11, loss_mi_coefficient2=[0.0] * 8,
        bert_layers=BERT_LAYERS, bert_heads=12, bert_hidden=768,
        bert_intermediate=1536, bert_dropout=0.0,
        bert_vocab=write_shim_vocab(), compute_dtype="float32")
    ours = OurSolver(cfg)
    ours.train_loader.shuffle = False
    template = merge_params(ours.params_main, ours.params_bert,
                            ours.params_vmi)
    params = reference_state_dict_to_params(init_sd, template)
    p_main, p_bert, p_vmi = partition_params(params)
    ours.params_main, ours.params_bert, ours.params_vmi = (
        p_main, p_bert, p_vmi)
    ours.solve()

    import json as _json
    scalars = [_json.loads(l) for l in
               open(os.path.join(cfg.task_dir, "ourcmp_sdk",
                                 "scalars.jsonl"))]

    def series(tag):
        return [s["value"] for s in scalars if s["tag"] == tag]

    our_train_loss = series("Train/Loss")
    ref_train_loss = [r["loss"] for r in rec["train"]]
    deltas = [abs(a - b) for a, b in zip(ref_train_loss, our_train_loss)]
    our_train_mae = series("Train/mae")
    ref_train_mae = [r["score"].get("mae") for r in rec["train"]]
    mae_deltas = [abs(a - b) for a, b in zip(ref_train_mae, our_train_mae)
                  if a is not None]
    return {
        "epochs": epochs,
        "ref_train_loss": ref_train_loss, "our_train_loss": our_train_loss,
        "train_loss_abs_delta": deltas,
        "train_mae_abs_delta": mae_deltas,
        "ref_final_valid_score":
            rec["valid"][-1]["score"] if rec["valid"] else {},
        "note": ("SDK loader path, deterministic: shuffle off both "
                 "sides, coef2=0, RMSE; deltas are torch-vs-XLA "
                 "arithmetic + the two data pipelines (slot selection, "
                 "normalize, collate, tokenize)"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--tol", type=float, default=2e-3)
    ap.add_argument("--matrix", action="store_true",
                    help="run the full config matrix (encoders x bounds "
                         "x task) instead of only the canonical cell")
    ap.add_argument("--cells", nargs="*", default=None,
                    help="subset of matrix cell names to run")
    ap.add_argument("--solver", action="store_true",
                    help="also run the end-to-end Solver-vs-Solver "
                         "comparison (slow: trains both frameworks)")
    ap.add_argument("--f64", action="store_true",
                    help="drift attribution: rerun the canonical "
                         "trajectory with torch double + jax x64 (runs "
                         "last; x64 is process-global)")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    report = {"config": {
        "bs": BS, "time_len": TIME_LEN, "d_common": D_COMMON,
        "bert_layers": BERT_LAYERS, "steps": args.steps, "tol": args.tol,
        "note": ("identical weights via utils/torch_import; identical "
                 "kNN samples replayed from the reference's own "
                 "prod_knn_sample; BERT is a shimmed random-init "
                 "bert-base layout (no HF cache in this env)")}}

    cell_names = (args.cells if args.cells
                  else (list(MATRIX_CELLS) if args.matrix
                        else ["gru_infonce_reg"]))
    report["cells"] = {}
    canonical = None
    for name in cell_names:
        (ref, opt, ref_model, model, params, inputs, bank_np,
         cell_report) = run_cell(name, MATRIX_CELLS[name], args.steps)
        cell_report["pass"] = (cell_report["worst_abs_delta"] <= args.tol
                               and cell_report["traj_step2_sane"])
        report["cells"][name] = cell_report
        if name == "gru_infonce_reg":
            canonical = (ref, opt, ref_model, model, params, inputs,
                         bank_np)

    # canonical-cell extras: the coef2>0 two-stage trajectory (critics
    # trained, MI steering the main update, replayed kNN both sides)
    if canonical is not None:
        ref, opt, ref_model, model, params, inputs, bank_np = canonical
        # fresh pair: the cell trajectory above already stepped ref_model
        ref, opt, ref_model, model, params = build_pair({})
        report["two_stage_trajectory"] = compare_two_stage_trajectory(
            ref, opt, ref_model, model, params, inputs, bank_np,
            args.steps)
        ts = report["two_stage_trajectory"]
        ts["pass"] = (max(ts["stage1_abs_delta"][:3]) <= args.tol
                      and max(ts["stage2_abs_delta"][:3]) <= args.tol)
    if args.solver:
        from tools._ref_harness import load_reference
        ref = load_reference(tempfile.mkdtemp(prefix="refcmp_"),
                             bert_layers=BERT_LAYERS)
        report["solver_end_to_end"] = compare_solver_end_to_end(
            ref, epochs=args.epochs)
        report["solver_deterministic"] = compare_solver_end_to_end(
            ref, epochs=args.epochs, deterministic=True)
        report["solver_sdk_deterministic"] = compare_solver_sdk(
            ref, epochs=args.epochs)

    # drift attribution (LAST: enabling jax x64 is process-global):
    # rerun the canonical trajectory with torch double + jax f64. If the
    # deltas collapse toward f64 round-off, the f32 drift is arithmetic
    # (torch-vs-XLA reduction order + optimizer round-off), not a
    # semantics gap.
    if args.f64:
        import jax as _jax

        _jax.config.update("jax_enable_x64", True)
        # (a) f64 + SGD: updates are LINEAR in gradients, so per-step
        # deltas stay at f64 round-off if and only if forward/loss/grad
        # semantics agree — the decisive attribution experiment.
        refx, optx, ref_modelx, modelx, paramsx = build_pair({}, f64=True)
        report["trajectory_f64_sgd"] = compare_step_trajectory(
            refx, optx, ref_modelx, modelx, paramsx, make_inputs(),
            make_bank(), args.steps, f64=True, optm="SGD")
        sgd_d = report["trajectory_f64_sgd"]["per_step_abs_delta"]
        report["trajectory_f64_sgd"]["pass"] = max(sgd_d[:3]) <= 1e-7
        # (b) f64 + Adam: step 0 must collapse vs f32 (forward+loss);
        # later steps re-amplify through Adam's g/(|g|+eps) sensitivity
        # on near-zero-gradient parameters IN BOTH precisions — that
        # growth is the optimizer's conditioning, not a semantics gap.
        refy, opty, ref_modely, modely, paramsy = build_pair({}, f64=True)
        report["trajectory_f64"] = compare_step_trajectory(
            refy, opty, ref_modely, modely, paramsy, make_inputs(),
            make_bank(), args.steps, f64=True)
        f64d = report["trajectory_f64"]["per_step_abs_delta"]
        report["trajectory_f64"]["pass"] = f64d[0] <= 1e-7
        if "gru_infonce_reg" in report["cells"]:
            f32d = (report["cells"]["gru_infonce_reg"]["trajectory"]
                    ["per_step_abs_delta"])
            report["trajectory_f64"]["f32_step_deltas"] = f32d
        report["drift_attribution"] = (
            "The deterministic torch-vs-jax trajectory drift is "
            "ARITHMETIC, not semantic: with both sides in f64 and the "
            "SGD chain (updates linear in gradients), per-step loss "
            "deltas stay flat at ~1e-9 across every step "
            "(trajectory_f64_sgd) — forward, loss, gradient and "
            "optimizer semantics agree to round-off. Under Adam the "
            "same f64 run collapses step 0 by ~100x vs f32 but "
            "re-amplifies ~50-100x per step: Adam's g/(sqrt(v)+eps) "
            "normalization is eps-scale sensitive on near-zero-gradient "
            "parameters, so sub-ulp reduction-order differences grow at "
            "the optimizer's conditioning rate in BOTH precisions "
            "(trajectory_f64 vs the f32 cell trajectory). The epoch-"
            "level drift in solver_deterministic (1e-3 at epoch 1 "
            "growing to ~5e-2) is this same amplification compounded "
            "through tens of Adam steps.")

    worst = max(c["worst_abs_delta"] for c in report["cells"].values())
    report["worst_abs_delta"] = worst
    verdict_ok = all(c["pass"] for c in report["cells"].values())
    if "trajectory_f64" in report:
        verdict_ok = (verdict_ok and report["trajectory_f64"]["pass"]
                      and report["trajectory_f64_sgd"]["pass"])
    if "two_stage_trajectory" in report:
        verdict_ok = verdict_ok and report["two_stage_trajectory"]["pass"]
    if "solver_deterministic" in report:
        # RNG-free full-epoch trajectory. Epoch 1's running loss is a
        # mean over the epoch's steps, so it carries the per-step
        # arithmetic drift the 3-step section measures (2.5e-5 at step
        # 1, 3.9e-4 at step 2) averaged through 8 steps — measured
        # 1.4e-3; gate at 5e-3. Later epochs compound torch-vs-XLA
        # round-off through tens of Adam steps (measured 0.054 at epoch
        # 4); gate at 0.15. A semantic error (misrouted labels, wrong
        # loss scale/coef wiring) shows as O(0.1) at epoch 1 already.
        det = report["solver_deterministic"]["train_loss_abs_delta"]
        report["solver_deterministic"]["pass"] = (
            det[0] <= 5e-3 and max(det) <= 0.15)
        verdict_ok = verdict_ok and report["solver_deterministic"]["pass"]
    if "solver_sdk_deterministic" in report:
        sdk = report["solver_sdk_deterministic"]["train_loss_abs_delta"]
        report["solver_sdk_deterministic"]["pass"] = (
            sdk[0] <= 5e-3 and max(sdk) <= 0.15)
        verdict_ok = (verdict_ok
                      and report["solver_sdk_deterministic"]["pass"])
    report["verdict"] = "PASS" if verdict_ok else "FAIL"
    text = json.dumps(report, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    sys.exit(0 if report["verdict"] == "PASS" else 1)


if __name__ == "__main__":
    main()
