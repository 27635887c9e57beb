"""End-to-end: the CLI entry point runs the (scaled-down) canonical
recipe from argv, and the Predictor serves from the resulting
checkpoint."""

import json
import os

import numpy as np
import pytest

from mimrl_tpu.data.synthetic import make_dec_fixture

pytestmark = pytest.mark.slow  # full-solver e2e: excluded from the fast lane


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "dec"
    make_dec_fixture(str(data), "mosi", n_per_split=(24, 8, 8), d_audio=5,
                     d_video=20, seed=1)
    return str(root), str(data)


def test_cli_canonical_recipe_scaled(env):
    """README command shape (ref: README.md:17-24) through the real CLI,
    scaled down (2 epochs, tiny BERT, bs=8)."""
    root, data = env
    from mimrl_tpu.cli.main import main

    argv = (
        "--task_name e2e --dataset mosi_Dec --log_scale 0-0-0 "
        "--normalize 0-1-1 --batch_size 8 --num_workers 0 "
        "--d_common 16 --encoders gru --activate gelu --time_len 12 "
        "--d_hiddens 12-3-16=4-3-16 --d_outs 12-3-16=4-3-16 "
        "--dropout_mlp 0.0-0.0-0.0 --dropout 0.1-0.1-0.1-0.1 --bias "
        "--res_project 1-1 --critic_type separate --baseline_type constant "
        "--bound_type infonce --mi_lr_rate 1.0 --cmi_lr_rate 1.0 "
        "--loss_mi_coefficient1 1-1-1-1-1-1-1-1-1-1-1 "
        "--loss_mi_coefficient2 0.01-0.01-0.01-0.01-0.01-0.01-0.01-0.01 "
        "--k_neighbor 2 --radius 1.0 --cmi_last_acticate sigmoid "
        "--stage1_n 2 --seed 0 --loss MAE --gradient_clip 1.5 "
        "--epochs_num 2 --optm Adam --learning_rate 4e-3 --bert_freeze no "
        "--bert_lr_rate 0.01 --weight_decay 0.0 --lr_decrease multi_step "
        "--lr_decrease_iter 9-60 --lr_decrease_rate 0.1 "
        "--save_best_features --parallel "
        f"--data_dir {data} --task_dir {root}/runs "
        "--bert_layers 2 --bert_heads 2 --bert_hidden 32"
    ).split()
    best = main(argv)
    assert best[0] is not None
    assert np.isfinite(best[0]["mae"])

    run = os.path.join(root, "runs", "e2e")
    assert os.path.exists(os.path.join(run, "best_valid_model.msgpack"))
    assert os.path.exists(os.path.join(run, "features_val.pkl"))
    # full metric battery present in the scores log
    scalars = [json.loads(l) for l in
               open(os.path.join(run, "scalars.jsonl"))]
    tags = {s["tag"] for s in scalars}
    assert "Val/mae" in tags and "Test/7-class_acc" in tags
    assert "Train/MI_comp" in tags and "Lr" in tags


def test_predictor_serves_from_checkpoint(env):
    root, data = env
    from mimrl_tpu.eval.predict import Predictor

    run = os.path.join(root, "runs", "e2e")
    pred = Predictor(run, slot="best_valid")
    scores = pred.evaluate_split("test")
    assert "mae" in scores and np.isfinite(scores["mae"])
    preds, targets = pred.predict_loader(pred._solver.test_loader)
    assert preds.shape[0] == targets.shape[0] == 8
