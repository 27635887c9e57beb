#!/usr/bin/env bash
# POM (persuasion-opinion) through the CMU-SDK pickle schema: 16-trait
# regression labels; the solver trains on the confidence column
# (labels[:, 0], ref: Solver.py:289-315) with the POM metric battery
# (MAE/corr/acc-2/F1, ref: Utils.py:178-223).
set -euo pipefail

python -m mimrl_tpu.cli.main \
  --task_name pomSDK --dataset pom_SDK \
  --text text --audio covarep --video facet42 \
  --normalize 0-1-1 --log_scale 0-0-0 --batch_size 64 \
  --d_common 128 --encoders gru --activate gelu --time_len 100 \
  --d_hiddens 50-3-128=10-3-128 --d_outs 50-3-128=10-3-128 \
  --dropout_mlp 0.0-0.0-0.0 --dropout 0.1-0.1-0.1-0.1 --bias \
  --res_project 1-1 \
  --critic_type separate --baseline_type constant --bound_type infonce \
  --loss_mi_coefficient1 1-1-1-1-1-1-1-1-1-1-1 \
  --loss_mi_coefficient2 0.01-0.01-0.01-0.01-0.01-0.01-0.01-0.01 \
  --k_neighbor 2 --stage1_n 2 \
  --seed 0 --loss MAE --gradient_clip 1.5 --epochs_num 50 --optm Adam \
  --learning_rate 2e-3 --bert_freeze no --bert_lr_rate 0.01 \
  --lr_decrease multi_step --lr_decrease_iter 25-45 --lr_decrease_rate 0.1 \
  --parallel "$@"
