"""The MIMRL model: BERT text extractor + GRU/LSTM/Conv A-V encoders +
CubeMLP fusion + classifier, plus the embedded MI/CMI estimator bank.

Functional flax re-design of the reference `Model`
(ref: Model.py:227-519). Sub-module names mirror the reference's
attribute names so the optimizer's name-based parameter split
('bert*' / 'vmi*' / 'vcmi*' / rest, ref: Solver.py:119-142) works
identically on the flax param tree's top-level keys.

Static-shape design notes (divergences from the reference, all
documented):

- All modality streams arrive padded to ``time_len``. The reference pads
  audio/video to the *batch max* length and computes the time-mean
  summary features over that dynamic length (ref: Model.py:466); here the
  mean runs over the static ``time_len``. For the canonical Dec recipe
  the reference's BERT input is already fixed-length ``time_len``
  (ref: DataLoaderCMUDeclareLab.py:423-430), so the text path is
  semantics-identical; for batch-max-padded datasets the summary feature
  scale differs by the (constant) padding ratio.
- RNN outputs at padded positions are exactly 0 (pad_packed semantics),
  then LayerNorm+ReLU runs over *all* positions including padded ones —
  matching the reference, which also LayerNorms the zero rows
  (ref: Model.py:457).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mimrl_tpu.mi.estimators import VCMIEstimator, VMIEstimator
from mimrl_tpu.models.bert import BertConfig, BertModel
from mimrl_tpu.models.cubemlp import MLPEncoder
from mimrl_tpu.models.fusion import MoEFusion, TFNFusion, TransformerFusion
from mimrl_tpu.models.encoders import (
    BiRnnEncoder,
    ConvEncoder,
    run_bidir_pair,
    lengths_from_sequence,
    prefix_mask,
)

Array = jax.Array

# Estimator hyperparameters hard-coded by the reference (ref: Model.py:285-286)
EST_HIDDEN_DIM = 256
EST_EMBED_DIM = 128
EST_LAYERS = 2
EST_ACTIVATION = "relu"
EST_MU, EST_RHO = 0.0, 1.0

CMI_KEYS = ("ac_t", "ta_c", "vc_t", "tv_c", "tc_a", "tc_v")


def get_output_dim(features_compose_t: str, features_compose_k: str,
                   d_out: int, t_out: int, k_out: int) -> int:
    """Classifier input width (ref: Model.py:12-27)."""
    if features_compose_k in ("mean", "sum"):
        classify_dim = d_out
    elif features_compose_k == "cat":
        classify_dim = d_out * k_out
    else:
        raise NotImplementedError(features_compose_k)
    if features_compose_t == "cat":
        classify_dim = classify_dim * t_out
    elif features_compose_t not in ("mean", "sum"):
        raise NotImplementedError(features_compose_t)
    return classify_dim


class MimrlModel(nn.Module):
    # modality dims
    d_t: int
    d_a: int
    d_v: int
    d_common: int = 128
    encoders: str = "gru"
    features_compose_t: str = "mean"
    features_compose_k: str = "mean"
    num_class: int = 1
    activate: str = "gelu"
    time_len: int = 100
    d_hiddens: Sequence[Sequence[int]] = ((10, 2, 128), (5, 2, 128))
    d_outs: Sequence[Sequence[int]] = ((10, 2, 128), (5, 2, 128))
    dropout_mlp: Sequence[float] = (0.5, 0.5, 0.5)
    dropout: Sequence[float] = (0.5, 0.5, 0.5, 0.5)
    bias: bool = False
    ln_first: bool = False
    res_project: Sequence[bool] = (True, True)
    # MI estimation
    critic_type: str = "separate"
    baseline_type: str = "constant"
    bound_type: str = "infonce"
    k_neighbor: int = 2
    radius: float = 1.0
    cmi_last_acticate: str = "sigmoid"
    use_pallas: bool = False
    # batch the 5 VMI + 6 VCMI estimators into vmapped applies (stacked
    # params, identical math/param-names; ~130 tiny GEMMs -> ~12 batched
    # ones). Falls back to sequential for the CLUB bound and during init.
    fused_estimators: bool = False
    # run the audio and video recurrent towers as ONE fused scan per
    # layer (4 direction slots) instead of two sequential scan chains;
    # identical math/params (tests/test_encoders.py, test_model.py)
    fused_av_scan: bool = False
    # fusion encoder family: 'cubemlp' (reference parity) |
    # 'transformer' | 'tfn' (README.md:13 calls the fusion replaceable)
    fusion: str = "cubemlp"
    fusion_layers: int = 2
    fusion_heads: int = 4
    # 'moe' fusion: expert count / router top-k / optional NamedSharding
    # for the expert activations (expert parallelism over the mesh)
    moe_experts: int = 4
    moe_topk: int = 2
    moe_ep_sharding: Optional[object] = None
    # BERT
    bert_config: BertConfig = BertConfig()

    def setup(self):
        assert self.encoders in ("lstm", "gru", "conv")
        c = self.bert_config

        self.bertmodel = BertModel(c, name="bertmodel")
        # projector (no bias, ref: Model.py:264)
        self.W_t = nn.Dense(self.d_common, use_bias=False, name="W_t")

        if self.encoders == "conv":
            self.conv_a = ConvEncoder(self.d_common, name="conv_a")
            self.conv_v = ConvEncoder(self.d_common, name="conv_v")
        elif self.encoders == "lstm":
            # 1-layer bidirectional LSTM (ref: Model.py:251-252)
            self.rnn_a = BiRnnEncoder("lstm", self.d_common, 1, name="rnn_a")
            self.rnn_v = BiRnnEncoder("lstm", self.d_common, 1, name="rnn_v")
        else:
            # 2-layer bidirectional GRU (ref: Model.py:254-255)
            self.rnn_a = BiRnnEncoder("gru", self.d_common, 2, name="rnn_a")
            self.rnn_v = BiRnnEncoder("gru", self.d_common, 2, name="rnn_v")

        self.ln_a = nn.LayerNorm(epsilon=1e-6, name="ln_a")
        self.ln_v = nn.LayerNorm(epsilon=1e-6, name="ln_v")
        self.dropout_t = nn.Dropout(self.dropout[0])
        self.dropout_a = nn.Dropout(self.dropout[1])
        self.dropout_v = nn.Dropout(self.dropout[2])

        assert self.fusion in ("cubemlp", "transformer", "tfn", "moe")
        if self.fusion == "cubemlp":
            self.mlp_encoder = MLPEncoder(
                activate=self.activate,
                d_in=(self.time_len, 3, self.d_common),
                d_hiddens=self.d_hiddens,
                d_outs=self.d_outs,
                dropouts=self.dropout_mlp,
                use_bias=self.bias,
                ln_first=self.ln_first,
                res_project=self.res_project,
                use_pallas=self.use_pallas,
                name="mlp_encoder",
            )
            t_out, k_out, d_out = (self.d_outs[-1][0], self.d_outs[-1][1],
                                   self.d_outs[-1][2])
        elif self.fusion == "transformer":
            self.mlp_encoder = TransformerFusion(
                d_model=self.d_common, time_len=self.time_len,
                num_layers=self.fusion_layers, num_heads=self.fusion_heads,
                dropout=self.dropout_mlp[0], name="mlp_encoder")
            t_out, k_out, d_out = self.time_len, 3, self.d_common
        elif self.fusion == "moe":
            self.mlp_encoder = MoEFusion(
                d_model=self.d_common, time_len=self.time_len,
                num_layers=self.fusion_layers, num_heads=self.fusion_heads,
                num_experts=self.moe_experts, top_k=self.moe_topk,
                dropout=self.dropout_mlp[0],
                ep_sharding=self.moe_ep_sharding, name="mlp_encoder")
            t_out, k_out, d_out = self.time_len, 3, self.d_common
        else:  # tfn
            self.mlp_encoder = TFNFusion(
                d_model=self.d_common, dropout=self.dropout_mlp[0],
                name="mlp_encoder")
            t_out, k_out, d_out = self.time_len, 3, self.d_common

        classify_dim = get_output_dim(
            self.features_compose_t, self.features_compose_k,
            d_out, t_out, k_out,
        )
        self._classify_dim = classify_dim
        if classify_dim <= 128:
            self.classifier = nn.Dense(self.num_class, name="classifier")
        else:
            self.classifier_hidden = nn.Dense(128, name="classifier_hidden")
            self.classifier_dropout = nn.Dropout(self.dropout[3])
            self.classifier = nn.Dense(self.num_class, name="classifier")

        est_kw = dict(
            critic_type=self.critic_type, baseline_type=self.baseline_type,
            bound_type=self.bound_type, hidden_dim=EST_HIDDEN_DIM,
            embed_dim=EST_EMBED_DIM, layers=EST_LAYERS,
            activation=EST_ACTIVATION, mu=EST_MU, rho=EST_RHO,
        )
        # Fusion information: I(F;T), I(F;A), I(F;V) (ref: Model.py:290-292)
        self.vmi_estimator_f_t = VMIEstimator(**est_kw, name="vmi_estimator_f_t")
        self.vmi_estimator_f_a = VMIEstimator(**est_kw, name="vmi_estimator_f_a")
        self.vmi_estimator_f_v = VMIEstimator(**est_kw, name="vmi_estimator_f_v")
        # Invariant information: I(T;A) + I(T;V) (ref: Model.py:294-295)
        self.vmi_estimator_t_a = VMIEstimator(**est_kw, name="vmi_estimator_t_a")
        self.vmi_estimator_t_v = VMIEstimator(**est_kw, name="vmi_estimator_t_v")
        # Conditional-MI classifiers (ref: Model.py:298-303)
        cmi_kw = dict(embed_dim=EST_EMBED_DIM, hidden_dim=EST_HIDDEN_DIM,
                      activation=EST_ACTIVATION,
                      last_activate=self.cmi_last_acticate)
        self.vcmi_estimator_ac_t = VCMIEstimator(**cmi_kw, name="vcmi_estimator_ac_t")
        self.vcmi_estimator_ta_c = VCMIEstimator(**cmi_kw, name="vcmi_estimator_ta_c")
        self.vcmi_estimator_vc_t = VCMIEstimator(**cmi_kw, name="vcmi_estimator_vc_t")
        self.vcmi_estimator_tv_c = VCMIEstimator(**cmi_kw, name="vcmi_estimator_tv_c")
        self.vcmi_estimator_tc_a = VCMIEstimator(**cmi_kw, name="vcmi_estimator_tc_a")
        self.vcmi_estimator_tc_v = VCMIEstimator(**cmi_kw, name="vcmi_estimator_tc_v")

    # ------------------------------------------------------------------ #
    # Forward (ref: Model.py:388-519)
    # ------------------------------------------------------------------ #
    def __call__(
        self,
        bert_sentences: Array,       # [bs, T] int32 token ids
        bert_sentence_types: Array,  # [bs, T] int32
        bert_sentence_att_mask: Array,  # [bs, T] int32 (1 = valid)
        a: Array,                    # [bs, T, d_a]
        v: Array,                    # [bs, T, d_v]
        deterministic: bool = True,
        return_features: bool = True,
        text_hidden: Optional[Array] = None,
        text_features: Optional[Array] = None,
    ):
        T = self.time_len
        # Text tower, three routes into the common projection W_t:
        # - default: in-module BERT over the token ids;
        # - `text_hidden`: externally computed BERT states [bs, T, d_t]
        #   (the pipeline-parallel path, parallel/pipeline.py);
        # - `text_features`: dense pre-extracted text features (glove
        #   etc., [bs, T, d_t]) with NO BERT at all. The reference's
        #   feature-text path is dead code (Customization.py:86
        #   references undefined opt.mask); here it works, which is what
        #   makes the LocalDataset family (mosi_50 etc.) trainable.
        if text_features is not None:
            t = text_features
        elif text_hidden is None:
            t = self.bertmodel(bert_sentences, bert_sentence_types,
                               bert_sentence_att_mask,
                               deterministic=deterministic)
        else:
            t = text_hidden
        t = self.W_t(t)

        # lengths from non-zero rows, clamped to >=1 (ref: Model.py:425-432)
        lengths_a = lengths_from_sequence(a)
        lengths_v = lengths_from_sequence(v)
        mask_a = prefix_mask(lengths_a, a.shape[1])
        mask_v = prefix_mask(lengths_v, v.shape[1])

        if self.encoders == "conv":
            a = self.conv_a(a)
            v = self.conv_v(v)
            a = jax.nn.relu(self.ln_a(a))
            v = jax.nn.relu(self.ln_v(v))
        else:
            if self.fused_av_scan and not self.is_initializing():
                # one fused scan chain per layer for BOTH towers (the
                # two recurrences are independent but scans serialize on
                # the core); params read from the rnn_a/rnn_v subtrees,
                # math identical to the separate calls
                a, v = run_bidir_pair(
                    self.encoders, self.d_common, self.rnn_a.num_layers,
                    self.rnn_a.variables["params"],
                    self.rnn_v.variables["params"],
                    a, mask_a, v, mask_v)
            else:
                a = self.rnn_a(a, mask_a)
                v = self.rnn_v(v, mask_v)
            a = jax.nn.relu(self.ln_a(a))
            v = jax.nn.relu(self.ln_v(v))

        t = self.dropout_t(t, deterministic=deterministic)
        a = self.dropout_a(a, deterministic=deterministic)
        v = self.dropout_v(v, deterministic=deterministic)

        # summary features = time-mean (ref: Model.py:466)
        T_F = jnp.mean(t, axis=1)
        A_F = jnp.mean(a, axis=1)
        V_F = jnp.mean(v, axis=1)

        # pad/truncate temporal axis to time_len and stack modalities
        # (ref: Model.py:468-475); inputs are already static time_len here.
        t = _fit_time(t, T)
        a = _fit_time(a, T)
        v = _fit_time(v, T)
        x = jnp.stack([t, a, v], axis=2)  # [bs, T, 3, d_common]

        x = self.mlp_encoder(x, mask=None, deterministic=deterministic)

        # Compose over k then t (ref: Model.py:489-507)
        if self.features_compose_k == "mean":
            fused = jnp.mean(x, axis=2)
        elif self.features_compose_k == "sum":
            fused = jnp.sum(x, axis=2)
        else:  # cat
            fused = jnp.concatenate(
                [x[:, :, i, :] for i in range(x.shape[2])], axis=-1)

        if self.features_compose_t == "mean":
            fused = jnp.mean(fused, axis=1)
        elif self.features_compose_t == "sum":
            fused = jnp.sum(fused, axis=1)
        else:  # cat
            fused = jnp.concatenate(
                [fused[:, i, :] for i in range(fused.shape[1])], axis=-1)

        F_F = fused  # features.unsqueeze(1).mean(1) == fused (ref: Model.py:507-511)

        # Classifier (ref: Model.py:269-281, :515)
        if self._classify_dim <= 128:
            output = self.classifier(fused)
        else:
            h = jax.nn.relu(self.classifier_hidden(fused))
            h = self.classifier_dropout(h, deterministic=deterministic)
            output = self.classifier(h)

        if return_features:
            return output, F_F, T_F, A_F, V_F
        return (output,)

    # ------------------------------------------------------------------ #
    # Stage losses (ref: Model.py:305-386)
    # ------------------------------------------------------------------ #
    def _tiled_labels(self, labels: Array) -> Array:
        return jnp.tile(labels.reshape(-1, 1), (1, self.d_common))

    def _all_estimates(self, labels, F_F, T_F, A_F, V_F, knn: Dict):
        """Shared 5 MI + 6 CMI computation; knn maps CMI_KEYS to
        (x, y, z) conditional-product sample triples."""
        labels = self._tiled_labels(labels)
        if (self.fused_estimators and not self.is_initializing()
                and self.bound_type != "club"):
            return self._all_estimates_fused(labels, F_F, T_F, A_F, V_F, knn)
        mi_f_t, l_f_t = self.vmi_estimator_f_t(F_F, T_F)
        mi_f_a, l_f_a = self.vmi_estimator_f_a(F_F, A_F)
        mi_f_v, l_f_v = self.vmi_estimator_f_v(F_F, V_F)
        mi_t_a, l_t_a = self.vmi_estimator_t_a(T_F, A_F)
        mi_t_v, l_t_v = self.vmi_estimator_t_v(T_F, V_F)

        cmi_ac_t, cl_ac_t = self.vcmi_estimator_ac_t(A_F, labels, T_F, *knn["ac_t"])
        cmi_ta_c, cl_ta_c = self.vcmi_estimator_ta_c(T_F, A_F, labels, *knn["ta_c"])
        cmi_vc_t, cl_vc_t = self.vcmi_estimator_vc_t(V_F, labels, T_F, *knn["vc_t"])
        cmi_tv_c, cl_tv_c = self.vcmi_estimator_tv_c(T_F, V_F, labels, *knn["tv_c"])
        cmi_tc_a, cl_tc_a = self.vcmi_estimator_tc_a(T_F, labels, A_F, *knn["tc_a"])
        cmi_tc_v, cl_tc_v = self.vcmi_estimator_tc_v(T_F, labels, V_F, *knn["tc_v"])

        mis = dict(
            f_t=mi_f_t, f_a=mi_f_a, f_v=mi_f_v, t_a=mi_t_a, t_v=mi_t_v,
            ac_t=cmi_ac_t, ta_c=cmi_ta_c, vc_t=cmi_vc_t, tv_c=cmi_tv_c,
            tc_a=cmi_tc_a, tc_v=cmi_tc_v,
        )
        losses = dict(
            f_t=l_f_t, f_a=l_f_a, f_v=l_f_v, t_a=l_t_a, t_v=l_t_v,
            ac_t=cl_ac_t, ta_c=cl_ta_c, vc_t=cl_vc_t, tv_c=cl_tv_c,
            tc_a=cl_tc_a, tc_v=cl_tc_v,
        )
        return mis, losses

    def _all_estimates_fused(self, labels, F_F, T_F, A_F, V_F, knn: Dict):
        """Batched execution of the estimator bank (--fused_estimators).

        All 5 VMI estimators are architecturally identical (hard-coded
        hyperparams, ref: Model.py:285-286), as are all 6 VCMI
        classifiers — so their parameter subtrees are stacked leaf-wise
        per call and the module apply is vmapped over the leading axis.
        This turns ~130 tiny sequential [bs,256]-class GEMMs into ~12
        batched ones (a pure execution-order change: per-estimator math,
        parameter names, shapes, and checkpoints are IDENTICAL to the
        sequential path; gradients flow back through the stack).
        `labels` arrives already tiled to d_common."""
        vmi_mods = (self.vmi_estimator_f_t, self.vmi_estimator_f_a,
                    self.vmi_estimator_f_v, self.vmi_estimator_t_a,
                    self.vmi_estimator_t_v)
        xs = jnp.stack([F_F, F_F, F_F, T_F, T_F])
        ys = jnp.stack([T_F, A_F, V_F, A_F, V_F])
        p5 = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls),
            *[m.variables["params"] for m in vmi_mods])
        tmpl5 = vmi_mods[0].clone(parent=None)
        mis5, ls5 = jax.vmap(
            lambda p, x, y: tmpl5.apply({"params": p}, x, y))(p5, xs, ys)

        cmi_mods = (self.vcmi_estimator_ac_t, self.vcmi_estimator_ta_c,
                    self.vcmi_estimator_vc_t, self.vcmi_estimator_tv_c,
                    self.vcmi_estimator_tc_a, self.vcmi_estimator_tc_v)
        trip = {
            "ac_t": (A_F, labels, T_F), "ta_c": (T_F, A_F, labels),
            "vc_t": (V_F, labels, T_F), "tv_c": (T_F, V_F, labels),
            "tc_a": (T_F, labels, A_F), "tc_v": (T_F, labels, V_F),
        }
        cx = jnp.stack([trip[k][0] for k in CMI_KEYS])
        cy = jnp.stack([trip[k][1] for k in CMI_KEYS])
        cz = jnp.stack([trip[k][2] for k in CMI_KEYS])
        kx = jnp.stack([knn[k][0] for k in CMI_KEYS])
        ky = jnp.stack([knn[k][1] for k in CMI_KEYS])
        kz = jnp.stack([knn[k][2] for k in CMI_KEYS])
        p6 = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls),
            *[m.variables["params"] for m in cmi_mods])
        tmpl6 = cmi_mods[0].clone(parent=None)
        cmis, cls_ = jax.vmap(
            lambda p, a, b, c, d, e, f: tmpl6.apply(
                {"params": p}, a, b, c, d, e, f))(p6, cx, cy, cz, kx, ky, kz)

        mis = dict(
            f_t=mis5[0], f_a=mis5[1], f_v=mis5[2], t_a=mis5[3], t_v=mis5[4],
            **{k: cmis[i] for i, k in enumerate(CMI_KEYS)},
        )
        losses = dict(
            f_t=ls5[0], f_a=ls5[1], f_v=ls5[2], t_a=ls5[3], t_v=ls5[4],
            **{k: cls_[i] for i, k in enumerate(CMI_KEYS)},
        )
        return mis, losses

    def compute_vmi_loss_stage1(self, labels, F_F, T_F, A_F, V_F, knn):
        """11 (mi, mi_loss) pairs for critic training
        (ref: Model.py:305-341)."""
        m, l = self._all_estimates(labels, F_F, T_F, A_F, V_F, knn)
        order = ("f_t", "f_a", "f_v", "t_a", "t_v",
                 "ac_t", "ta_c", "vc_t", "tv_c", "tc_a", "tc_v")
        return [m[k] for k in order], [l[k] for k in order]

    def compute_vmi_loss_stage2(self, labels, F_F, T_F, A_F, V_F, knn):
        """8 derived (mi, mi_loss) pairs for main-model training
        (ref: Model.py:343-386)."""
        m, l = self._all_estimates(labels, F_F, T_F, A_F, V_F, knn)
        mi_inv = m["t_a"] + m["t_v"]
        mi_spec_t = m["tc_a"] + m["tc_v"] - m["ta_c"] - m["tv_c"]
        mi_spec_a = m["ac_t"] - m["ta_c"]
        mi_spec_v = m["vc_t"] - m["tv_c"]
        mi_comp = m["ta_c"] + m["tv_c"]
        mis = [m["f_t"], m["f_a"], m["f_v"], mi_inv,
               mi_spec_t, mi_spec_a, mi_spec_v, mi_comp]
        losses = [l["f_t"], l["f_a"], l["f_v"], -mi_inv,
                  -mi_spec_t, -mi_spec_a, -mi_spec_v, -mi_comp]
        return mis, losses


def _init_all_method(self: "MimrlModel", bert_sentences, bert_sentence_types,
                     bert_sentence_att_mask, a, v, text_features=None):
    """Init driver touching EVERY parameter, incl. the MI/CMI estimator
    bank. Flax creates params lazily on first use; the plain forward
    never calls the estimators (they run only in the stage losses), so a
    vanilla ``model.init`` would leave the 'vmi_*'/'vcmi_*' groups empty
    — unlike the reference, whose torch Model materializes everything in
    __init__ (ref: Model.py:283-303). With `text_features` (dense text
    mode) the BERT tower is never touched, so no BERT params exist and
    no optimizer state is wasted on them."""
    out, F_F, T_F, A_F, V_F = self(
        bert_sentences, bert_sentence_types, bert_sentence_att_mask, a, v,
        deterministic=True, return_features=True,
        text_features=text_features)
    bs = a.shape[0]
    m = (bs // self.k_neighbor) * self.k_neighbor
    dummy = jnp.zeros((m, EST_EMBED_DIM), F_F.dtype)
    knn = {k: (dummy, dummy, dummy) for k in CMI_KEYS}
    labels = jnp.zeros((bs,), F_F.dtype)
    self.compute_vmi_loss_stage1(labels, F_F, T_F, A_F, V_F, knn)
    return out


def init_full(model: "MimrlModel", rngs, bert_sentences, bert_sentence_types,
              bert_sentence_att_mask, a, v, text_features=None):
    """All-parameter init (forward + estimator bank); returns variables.

    Jitted so initialization is ONE compiled program — eager flax init
    compiles every op separately, which is pathological on backends with
    remote compilation."""

    @jax.jit
    def _do(rngs, bert_sentences, bert_sentence_types,
            bert_sentence_att_mask, a, v, text_features):
        return model.init(rngs, bert_sentences, bert_sentence_types,
                          bert_sentence_att_mask, a, v,
                          text_features=text_features,
                          method=_init_all_method)

    return _do(rngs, bert_sentences, bert_sentence_types,
               bert_sentence_att_mask, a, v, text_features)


def _fit_time(x: Array, T: int) -> Array:
    """Pad (zeros) or truncate axis 1 to length T (ref: Model.py:468-470)."""
    cur = x.shape[1]
    if cur == T:
        return x
    if cur > T:
        return x[:, :T]
    return jnp.pad(x, ((0, 0), (0, T - cur), (0, 0)))


def apply_orthogonal_whh(params, key):
    """Orthogonal re-init of every recurrent `w_hh` kernel
    (ref: Customization.py:18-21)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = [p for p, _ in flat[0]]
    new_leaves = []
    keys = jax.random.split(key, len(leaves))
    ortho = nn.initializers.orthogonal()
    for path, leaf, k in zip(paths, leaves, keys):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "w_hh" in name:
            new_leaves.append(ortho(k, leaf.shape, leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
