"""Inference / serving path.

The reference's minimal serving surface is `Model.forward` with
`return_features=False` (ref: Model.py:519, SURVEY.md §3.3); it ships no
loader-to-prediction utility. This module closes that gap: restore a
trained run (any checkpoint slot) and produce predictions for a dataset
split with one compiled forward program.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np

from mimrl_tpu.core.checkpoint import CheckpointManager
from mimrl_tpu.core.config import MimrlConfig
from mimrl_tpu.eval.metrics import get_score_from_result


class Predictor:
    """Loads a run directory (config + checkpoint slot) and serves
    batched predictions with the training-time static shapes."""

    def __init__(self, task_dir: str, slot: str = "best_valid",
                 config_overrides: Optional[dict] = None):
        mgr = CheckpointManager(task_dir)
        cfg_dict = mgr.load_config()
        assert cfg_dict is not None, f"no config.json in {task_dir}"
        if config_overrides:
            cfg_dict.update(config_overrides)
        self.cfg = MimrlConfig.from_dict(cfg_dict)

        # Build the solver machinery without training state
        from mimrl_tpu.train.solver import Solver

        solver = Solver(self.cfg.replace(resume=None, task_name="_predict",
                                         task_dir=task_dir + "/_predict"))
        template = solver._state_dict(0)
        state = mgr.restore(slot, template)
        if state is None and slot != "latest":
            state = mgr.restore("latest", template)
        assert state is not None, f"no checkpoint in {task_dir}"
        solver.params_main = state["params_main"]
        solver.params_bert = state["params_bert"]
        solver.params_vmi = state["params_vmi"]
        self._solver = solver

        model = solver.model
        from mimrl_tpu.train.optim import merge_params

        params = merge_params(solver.params_main, solver.params_bert,
                              solver.params_vmi)

        from mimrl_tpu.train.steps import _model_inputs

        @jax.jit
        def forward(batch):
            out = model.apply(
                {"params": params}, *_model_inputs(batch),
                text_features=batch.get("text"),
                deterministic=True, return_features=False)
            return out[0]

        self._forward = forward

    def predict_loader(self, loader) -> Tuple[np.ndarray, np.ndarray]:
        """Predictions + targets for a BatchPipeline (mask-filtered)."""
        preds, targets = [], []
        for batch in loader:
            model_batch, labels_dev, labels_np = self._solver._prep(batch)
            out = self._forward(model_batch)
            mask = batch["sample_mask"] > 0.5
            preds.append(np.asarray(out)[mask])
            targets.append(labels_np[mask])
        return np.concatenate(preds), np.concatenate(targets)

    def evaluate_split(self, split: str = "test") -> Dict[str, float]:
        loader = {"train": self._solver.train_loader,
                  "valid": self._solver.valid_loader,
                  "test": self._solver.test_loader}[split]
        preds, targets = self.predict_loader(loader)
        return get_score_from_result(preds, targets, self.cfg.dataset,
                                     self.cfg.task, self.cfg.num_class)
