"""CLI flag-surface parity tests (ref: Parameters.py:4-74)."""

import pytest

from mimrl_tpu.core.config import MimrlConfig, parse_args
from mimrl_tpu.utils.parsers import str2bools, str2floats, str2listoffints


def test_string_dsls():
    assert str2listoffints("50-3-128=10-3-128") == [[50, 3, 128], [10, 3, 128]]
    assert str2bools("0-1-1") == [False, True, True]
    assert str2floats("0.1-0.2") == [0.1, 0.2]


def test_defaults_match_reference():
    cfg = parse_args([])
    assert cfg.dataset == "mosi_SDK"
    assert cfg.batch_size == 16
    assert cfg.d_common == 128
    assert cfg.encoders == "gru"
    assert cfg.bound_type == "infonce"
    assert cfg.baseline_type == "constant"
    assert cfg.loss == "MAE"
    assert cfg.learning_rate == 4e-3
    assert cfg.d_hiddens == [[10, 2, 128], [5, 2, 128]]
    assert cfg.loss_mi_coefficient1 == [0.1] * 11
    assert cfg.loss_mi_coefficient2 == [0.1] * 8
    assert cfg.cmi_last_acticate == "sigmoid"


def test_readme_canonical_command_parses():
    """The README MOSI recipe must parse verbatim (ref: README.md:17-24)."""
    argv = (
        "--task_name mosiDec52.1 --dataset mosi_Dec --log_scale 0-0-0 "
        "--normalize 0-1-1 --batch_size 128 --num_workers 8 "
        "--d_common 128 --encoders gru --activate gelu --time_len 100 "
        "--d_hiddens 50-3-128=10-3-128 --d_outs 50-3-128=10-3-128 "
        "--dropout_mlp 0.0-0.0-0.0 --dropout 0.1-0.1-0.1-0.1 --bias "
        "--res_project 1-1 --critic_type separate --baseline_type constant "
        "--bound_type infonce --mi_lr_rate 1.0 --cmi_lr_rate 1.0 "
        "--loss_mi_coefficient1 1-1-1-1-1-1-1-1-1-1-1 "
        "--loss_mi_coefficient2 0.01-0.01-0.01-0.01-0.01-0.01-0.01-0.01 "
        "--k_neighbor 2 --radius 1.0 --cmi_last_acticate sigmoid "
        "--stage1_n 2 --seed 0 --loss MAE --gradient_clip 1.5 "
        "--epochs_num 70 --optm Adam --learning_rate 4e-3 --bert_freeze no "
        "--bert_lr_rate 0.01 --weight_decay 0.0 --lr_decrease multi_step "
        "--lr_decrease_iter 9-60 --lr_decrease_rate 0.1 "
        "--save_best_features --parallel"
    ).split()
    cfg = parse_args(argv)
    assert cfg.dataset == "mosi_Dec"
    assert cfg.batch_size == 128
    assert cfg.d_hiddens == [[50, 3, 128], [10, 3, 128]]
    assert cfg.loss_mi_coefficient1 == [1.0] * 11
    assert cfg.loss_mi_coefficient2 == [0.01] * 8
    assert cfg.stage1_n == 2
    assert cfg.gradient_clip == 1.5
    assert cfg.bert_lr_rate == 0.01
    assert cfg.lr_decrease == "multi_step"
    assert cfg.lr_decrease_iter == "9-60"
    assert cfg.normalize == [False, True, True]
    assert cfg.bias and cfg.parallel and cfg.save_best_features


def test_json_roundtrip():
    cfg = MimrlConfig(batch_size=32, bound_type="smile")
    cfg2 = MimrlConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_invalid_values_rejected():
    with pytest.raises(AssertionError):
        MimrlConfig(encoders="transformer")
    with pytest.raises(AssertionError):
        MimrlConfig(bound_type="kl_divergence")
    with pytest.raises(AssertionError):
        MimrlConfig(loss_mi_coefficient1=[0.1] * 10)
    # seq_shard and pipeline parallelism are mutually exclusive (the
    # pipelined path bypasses the constrained layer stack)
    with pytest.raises(AssertionError, match="mutually exclusive"):
        MimrlConfig(seq_shard=True, mesh_pipe=2)
    with pytest.raises(AssertionError, match="moe_topk"):
        MimrlConfig(moe_experts=2, moe_topk=4)


def test_sam_accepted_by_parser():
    # parser accepts SAM (ref: Parameters.py:58); the solver decides
    cfg = parse_args(["--optm", "SAM"])
    assert cfg.optm == "SAM"
