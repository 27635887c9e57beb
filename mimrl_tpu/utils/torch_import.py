"""Import a reference (kiva12138/MIMRL) torch ``Model`` state_dict into a
mimrl_tpu params tree.

Two uses:
- migration: load a reference ``*.pth.tar`` checkpoint
  (``torch.load(...)['state_dict']`` or a raw state_dict) and continue
  training / serve it from this framework;
- verification: ``tools/ref_compare.py`` transfers a freshly-initialised
  reference model's weights so both frameworks compute from IDENTICAL
  parameters, turning trajectory comparison into a tight numeric diff.

Name/layout conventions translated (reference Model.py:228-305,
VMI.py:13-43, MLPProcess.py:9-52):
- torch ``nn.Linear.weight`` is [out, in]; flax ``Dense.kernel`` is
  [in, out] -> transpose.
- torch GRU/LSTM per-layer per-direction tensors ``weight_ih_l{k}``
  [gates*H, in] map to our scan cells' ``l{k}_{fwd,bwd}/w_ih`` [in,
  gates*H] (same gate order; parity pinned by tests/test_encoders.py).
- sequential MLP stacks (VMI.mlps, Model.MLP_For_CMI.mlp) index their
  Linears at 0, 2, 4, ... -> our named fc_in/fc_0/.../fc_out (critics)
  and fc0/fc1/fc2/fc_out (CMI classifier).
- the HF BERT subtree (``bertmodel.*``) goes through
  models.bert.convert_hf_torch_state_dict (fused QKV).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax.numpy as jnp

VMI_NAMES = ("f_t", "f_a", "f_v", "t_a", "t_v")
VCMI_NAMES = ("ac_t", "ta_c", "vc_t", "tv_c", "tc_a", "tc_v")


def _t(x) -> np.ndarray:
    # MUST copy: np.asarray(torch_tensor) shares the tensor's memory and
    # jnp.asarray on the CPU backend is zero-copy over numpy — without
    # the copy, later IN-PLACE torch optimizer updates silently mutate
    # the imported jax params (observed in tools/ref_compare.py).
    if hasattr(x, "detach"):
        x = x.detach()
    return np.array(x, copy=True)


def _seq_linear_names(layers: int):
    """torch Sequential indices of the Linears in VMI.mlps(...) ->
    our MLPStack names (fc_in, fc_0..fc_{layers-1}, fc_out)."""
    names = {0: "fc_in"}
    for i in range(layers):
        names[2 * (i + 1)] = f"fc_{i}"
    names[2 * layers + 2] = "fc_out"
    return names


def _import_mlp_stack(sd: Dict[str, Any], prefix: str, layers: int = 2):
    out: Dict[str, Any] = {}
    for idx, name in _seq_linear_names(layers).items():
        out[name] = {
            "kernel": jnp.asarray(_t(sd[f"{prefix}.{idx}.weight"]).T),
            "bias": jnp.asarray(_t(sd[f"{prefix}.{idx}.bias"])),
        }
    return out


def _import_cmi_mlp(sd: Dict[str, Any], prefix: str):
    """MLP_For_CMI.mlp: Sequential(L,a,L,a,L,a,L) -> fc0/fc1/fc2/fc_out
    (ref: Model.py:47-57)."""
    out: Dict[str, Any] = {}
    for idx, name in ((0, "fc0"), (2, "fc1"), (4, "fc2"), (6, "fc_out")):
        out[name] = {
            "kernel": jnp.asarray(_t(sd[f"{prefix}.{idx}.weight"]).T),
            "bias": jnp.asarray(_t(sd[f"{prefix}.{idx}.bias"])),
        }
    return out


def _import_rnn(sd: Dict[str, Any], prefix: str, num_layers: int):
    out: Dict[str, Any] = {}
    for k in range(num_layers):
        for suffix, dname in (("", "fwd"), ("_reverse", "bwd")):
            out[f"l{k}_{dname}"] = {
                "w_ih": jnp.asarray(
                    _t(sd[f"{prefix}.weight_ih_l{k}{suffix}"]).T),
                "w_hh": jnp.asarray(
                    _t(sd[f"{prefix}.weight_hh_l{k}{suffix}"]).T),
                "b_ih": jnp.asarray(_t(sd[f"{prefix}.bias_ih_l{k}{suffix}"])),
                "b_hh": jnp.asarray(_t(sd[f"{prefix}.bias_hh_l{k}{suffix}"])),
            }
    return out


def _import_ln(sd: Dict[str, Any], prefix: str):
    return {"scale": jnp.asarray(_t(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _import_mlp_encoder(sd: Dict[str, Any], n_blocks: int, bias: bool,
                        res_project):
    out: Dict[str, Any] = {}
    for i in range(n_blocks):
        p = f"mlp_encoder.layers_stack.{i}"
        blk: Dict[str, Any] = {}
        for axis in ("l", "k", "d"):
            m = {
                "w1": jnp.asarray(_t(sd[f"{p}.mlp_{axis}.fc1.weight"]).T),
                "w2": jnp.asarray(_t(sd[f"{p}.mlp_{axis}.fc2.weight"]).T),
            }
            if bias:
                m["b1"] = jnp.asarray(_t(sd[f"{p}.mlp_{axis}.fc1.bias"]))
                m["b2"] = jnp.asarray(_t(sd[f"{p}.mlp_{axis}.fc2.bias"]))
            blk[f"mlp_{axis}"] = m
            blk[f"ln_{axis}"] = _import_ln(sd, f"{p}.ln_{axis}")
            rkey = f"{p}.res_projection_{axis}.weight"
            if rkey in sd:
                blk[f"res_projection_{axis}"] = {
                    "w": jnp.asarray(_t(sd[rkey]).T)}
        out[f"block_{i}"] = blk
    return out


def reference_state_dict_to_params(
    state_dict: Dict[str, Any],
    params_template: Dict[str, Any],
    *,
    encoders: str = "gru",
    critic_type: str = "separate",
    baseline_type: str = "constant",
) -> Dict[str, Any]:
    """Build a full mimrl_tpu params tree from a reference Model
    state_dict. ``params_template`` (from init_full) supplies the tree
    to validate shapes/coverage against; every leaf in the template must
    be produced (shape-checked), so drift in either model surfaces as a
    hard error instead of a silent partial import."""
    sd = {k: v for k, v in state_dict.items()}
    # DataParallel checkpoints prefix everything with 'module.'
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()
              if k.startswith("module.")}

    params: Dict[str, Any] = {}

    # --- BERT tower (ref Model.py:243-244) ---
    # _t-copy here: convert_hf_torch_state_dict uses np.asarray (shares
    # torch storage) — see _t's aliasing note
    bert_sd = {k[len("bertmodel."):]: _t(v) for k, v in sd.items()
               if k.startswith("bertmodel.")}
    if bert_sd:
        from mimrl_tpu.models.bert import (BertConfig,
                                           convert_hf_torch_state_dict)
        n_layers = 1 + max(
            int(k.split(".")[2]) for k in bert_sd
            if k.startswith("encoder.layer."))
        params["bertmodel"] = convert_hf_torch_state_dict(
            bert_sd, BertConfig(num_hidden_layers=n_layers))["params"]

    # --- A/V encoders (ref Model.py:247-256) ---
    if encoders == "conv":
        for name in ("conv_a", "conv_v"):
            w = _t(sd[f"{name}.weight"])  # [out, in, k]
            params[name] = {
                "conv": {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
                         "bias": jnp.asarray(_t(sd[f"{name}.bias"]))}}
    else:
        num_layers = 1 if encoders == "lstm" else 2
        params["rnn_a"] = _import_rnn(sd, "rnn_a", num_layers)
        params["rnn_v"] = _import_rnn(sd, "rnn_v", num_layers)

    # --- norms, projector, classifier (ref Model.py:259-281) ---
    params["ln_a"] = _import_ln(sd, "ln_a")
    params["ln_v"] = _import_ln(sd, "ln_v")
    params["W_t"] = {"kernel": jnp.asarray(_t(sd["W_t.weight"]).T)}

    if "classifier.0.weight" in sd and "classifier.3.weight" not in sd:
        params["classifier"] = {
            "kernel": jnp.asarray(_t(sd["classifier.0.weight"]).T),
            "bias": jnp.asarray(_t(sd["classifier.0.bias"]))}
    else:  # classify_dim > 128: Linear/ReLU/Dropout/Linear
        params["classifier_0"] = {
            "kernel": jnp.asarray(_t(sd["classifier.0.weight"]).T),
            "bias": jnp.asarray(_t(sd["classifier.0.bias"]))}
        params["classifier_1"] = {
            "kernel": jnp.asarray(_t(sd["classifier.3.weight"]).T),
            "bias": jnp.asarray(_t(sd["classifier.3.bias"]))}

    # --- CubeMLP fusion (ref Model.py:269) ---
    n_blocks = len({k.split(".")[2] for k in sd
                    if k.startswith("mlp_encoder.layers_stack.")})
    has_bias = "mlp_encoder.layers_stack.0.mlp_l.fc1.bias" in sd
    params["mlp_encoder"] = _import_mlp_encoder(sd, n_blocks, has_bias,
                                                None)

    # --- VMI estimators (ref Model.py:291-297) ---
    for name in VMI_NAMES:
        p = f"vmi_estimator_{name}"
        est: Dict[str, Any] = {"critic_model": {}}
        if critic_type != "concat":
            est["critic_model"]["MLP_g"] = _import_mlp_stack(
                sd, f"{p}.critic_model.MLP_g")
            est["critic_model"]["MLP_h"] = _import_mlp_stack(
                sd, f"{p}.critic_model.MLP_h")
        else:  # concat
            est["critic_model"]["MLP_f"] = _import_mlp_stack(
                sd, f"{p}.critic_model.MLP_f")
        if baseline_type == "unnormalized":
            est["baseline_model"] = {"MLP": _import_mlp_stack(
                sd, f"{p}.baseline_model.MLP")}
        params[p] = est

    # --- VCMI estimators (ref Model.py:301-306) ---
    for name in VCMI_NAMES:
        p = f"vcmi_estimator_{name}"
        params[p] = {"classifier": _import_cmi_mlp(
            sd, f"{p}.classifier.mlp")}

    # --- vocab adaptation: when the target model was built against a
    # smaller tokenizer vocab (e.g. the ref_compare shim vocab), keep
    # the first rows of the source word-embedding table — token ids are
    # shared, so row i means the same token on both sides ---
    try:
        we = params["bertmodel"]["embeddings"]["word_embeddings"]
        want_rows = params_template["bertmodel"]["embeddings"][
            "word_embeddings"]["embedding"].shape[0]
        if we["embedding"].shape[0] > want_rows:
            we["embedding"] = we["embedding"][:want_rows]
    except KeyError:
        pass

    # --- validate against the template ---
    import jax

    flat_got = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_want = jax.tree_util.tree_flatten_with_path(params_template)[0]
    missing, bad = [], []
    for path, leaf in flat_want:
        name = jax.tree_util.keystr(path)
        if path not in flat_got:
            missing.append(name)
        elif tuple(flat_got[path].shape) != tuple(leaf.shape):
            bad.append((name, flat_got[path].shape, leaf.shape))
    extra = [jax.tree_util.keystr(p) for p in
             set(flat_got) - {p for p, _ in flat_want}]
    if missing or bad or extra:
        raise ValueError(
            f"torch import mismatch: missing={missing[:5]} "
            f"shape={bad[:5]} extra={extra[:5]} "
            f"(counts: {len(missing)}/{len(bad)}/{len(extra)})")
    return params
