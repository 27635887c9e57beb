"""Load and run the ACTUAL reference implementation (/root/reference)
on CPU torch, for executable trajectory comparison (BASELINE.md protocol
second half).

What gets shimmed (and why each is semantics-preserving):
- ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` -> identity: the
  reference calls ``.cuda()`` unconditionally (Customization.py:46-51,
  Solver.py:36); ``Utils.to_gpu`` is already CPU-guarded.
- ``Config.Data_path_DecLab`` -> a caller-supplied fixture directory
  (the committed path points at the authors' machine).
- ``BertConfig/BertModel.from_pretrained`` on the reference's Model
  module -> a locally-constructed random-init BERT (hidden 768 to match
  dataset_dimensions['mosi_dec'][0]=768; this environment has no HF
  cache and no network). The substitution is IDENTICAL on the mimrl_tpu
  side via utils.torch_import, so comparisons stay weight-exact.

Nothing in the reference tree is modified; everything is monkeypatched
from outside.
"""

from __future__ import annotations

import os
import sys
from typing import Any, List

REF_DIR = os.environ.get("MIMRL_REF_DIR", "/root/reference")

_loaded: dict = {}


def reference_available() -> bool:
    return os.path.exists(os.path.join(REF_DIR, "Model.py"))


def write_shim_vocab(path: str | None = None) -> str:
    """A minimal WordPiece vocab.txt covering the synthetic fixtures'
    word list, so the reference's module-level BertTokenizer can be
    constructed without an HF cache. The SAME file must be handed to the
    mimrl_tpu pipeline (data/tokenizer.from_vocab_file) when comparing
    end-to-end runs, so both sides see identical token ids."""
    import tempfile
    if path is None:
        path = os.path.join(tempfile.gettempdir(), "mimrl_shim_vocab.txt")
    from mimrl_tpu.data.synthetic import _WORDS
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += sorted(set(_WORDS))
    tokens += [c for c in "abcdefghijklmnopqrstuvwxyz0123456789.,!?'"]
    with open(path, "w") as f:
        f.write("\n".join(tokens) + "\n")
    return path


def make_bert_shim_config(num_layers: int = 2):
    """A small random-init BERT standing in for bert-base-uncased:
    hidden stays 768 (= d_t the Dec loader reports) so every interface
    shape matches; fewer layers keep the CPU run tractable."""
    import transformers
    # dropout 0: every comparison runs with ALL stochastic layers off,
    # so train-mode trajectories are deterministic on both sides
    return transformers.BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=num_layers,
        num_attention_heads=12, intermediate_size=1536,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        output_hidden_states=True)


def load_reference(data_dir: str, bert_layers: int = 2):
    """Import the reference modules with shims applied. Returns a dict
    of the reference modules. Idempotent per process."""
    if _loaded:
        return _loaded

    import torch

    # .cuda() -> identity (CPU run)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not torch.cuda.is_available():
        torch.cuda.manual_seed_all = lambda *a, **k: None

    # The reference's loss glue hard-codes the DataParallel `.module`
    # hop (Customization.py:100,107): its Solver only runs under
    # --parallel. A 1-device pass-through wrapper preserves semantics
    # exactly (DataParallel over one device is a plain forward).
    if not torch.cuda.is_available():
        class _PassthroughDataParallel(torch.nn.Module):
            def __init__(self, module, device_ids=None, **k):
                super().__init__()
                self.module = module

            def forward(self, *a, **k):
                return self.module(*a, **k)

        torch.nn.DataParallel = _PassthroughDataParallel

    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)

    import Config  # noqa: E402 (reference)
    Config.Data_path_DecLab = data_dir

    import transformers
    shim_cfg = make_bert_shim_config(bert_layers)

    class _ShimBertConfig:
        @staticmethod
        def from_pretrained(*a, **k):
            return shim_cfg

    class _ShimBertModel:
        @staticmethod
        def from_pretrained(name, config=None, **k):
            torch.manual_seed(4242)  # deterministic shim weights
            return transformers.BertModel(config or shim_cfg)

    # DataLoaderCMUDeclareLab constructs a BertTokenizer at module import
    # (line 322); no HF cache exists here, so hand it a local vocab that
    # covers the synthetic fixture's word list (data/synthetic._WORDS).
    # Patch BEFORE any reference module imports transformers names.
    vocab_path = write_shim_vocab()
    _orig_tok_fp = transformers.BertTokenizer.from_pretrained.__func__

    def _shim_tok_fp(cls, *a, **k):
        return cls(vocab_file=vocab_path, do_lower_case=True)

    transformers.BertTokenizer.from_pretrained = classmethod(_shim_tok_fp)

    import Model as ref_model_mod  # noqa: E402
    ref_model_mod.BertConfig = _ShimBertConfig
    ref_model_mod.BertModel = _ShimBertModel

    # The reference repo does NOT ship DataLoaderLocal.py (the committed
    # code cannot run as-is: Solver.py:12 and DataLoaderUniversal.py:7
    # import it). Stand in our call-site reconstruction
    # (mimrl_tpu/data/local.py, SURVEY §2.2 row 8).
    import types
    from mimrl_tpu.data.local import r2c_2, r2c_7
    from mimrl_tpu.data.sdk import mosi_r2c_7, pom_r2c_7
    stub = types.ModuleType("DataLoaderLocal")
    stub.r2c_2, stub.r2c_7 = r2c_2, r2c_7
    stub.mosi_r2c_7, stub.pom_r2c_7 = mosi_r2c_7, pom_r2c_7

    class _LocalDatasetUnavailable:
        def __init__(self, *a, **k):
            raise NotImplementedError(
                "DataLoaderLocal.LocalDataset is absent from the "
                "reference repo; only Dec/SDK/AVEC paths run here")

    stub.LocalDataset = _LocalDatasetUnavailable
    stub.__all__ = ["r2c_2", "r2c_7", "mosi_r2c_7", "pom_r2c_7",
                    "LocalDataset"]
    sys.modules["DataLoaderLocal"] = stub

    import Customization as ref_cust  # noqa: E402
    import DataLoaderUniversal as ref_dlu  # noqa: E402
    import Solver as ref_solver_mod  # noqa: E402
    import Utils as ref_utils  # noqa: E402
    import VMI as ref_vmi  # noqa: E402

    _loaded.update(dict(
        Config=Config, Model=ref_model_mod, Solver=ref_solver_mod,
        Customization=ref_cust, Utils=ref_utils, VMI=ref_vmi,
        DataLoaderUniversal=ref_dlu, shim_bert_config=shim_cfg,
    ))
    return _loaded


def make_ref_opt(argv: List[str]) -> Any:
    """Parse a reference flag list through the reference's own
    Parameters.parse_args (so DSL strings are parsed by its code)."""
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    import Parameters  # noqa: E402 (reference)
    old = sys.argv
    try:
        sys.argv = ["Main.py"] + list(argv)
        return Parameters.parse_args()
    finally:
        sys.argv = old


def build_ref_model(opt, d_t: int = 768, d_a: int = 5, d_v: int = 20,
                    seed: int = 0):
    """Construct the reference Model with deterministic torch init."""
    import torch
    ref = _loaded
    torch.manual_seed(seed)
    model = ref["Model"].Model(opt, d_t, d_a, d_v)
    model.eval()
    return model
