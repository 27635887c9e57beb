#!/usr/bin/env bash
# MOSEI-Dec: the larger CMU-MOSEI corpus through the DeclareLab pickle
# schema (7-column labels -> first column, ref:
# DataLoaderCMUDeclareLab.py:388-389). Same two-stage recipe as MOSI
# with a bigger batch to keep the MXU fed on the ~16k-utterance corpus.
set -euo pipefail

python -m mimrl_tpu.cli.main \
  --task_name moseiDec --dataset mosei_Dec \
  --log_scale 0-0-0 --normalize 0-1-1 --batch_size 256 --num_workers 8 \
  --d_common 128 --encoders gru --activate gelu --time_len 100 \
  --d_hiddens 50-3-128=10-3-128 --d_outs 50-3-128=10-3-128 \
  --dropout_mlp 0.0-0.0-0.0 --dropout 0.1-0.1-0.1-0.1 --bias \
  --res_project 1-1 \
  --critic_type separate --baseline_type constant --bound_type infonce \
  --loss_mi_coefficient1 1-1-1-1-1-1-1-1-1-1-1 \
  --loss_mi_coefficient2 0.01-0.01-0.01-0.01-0.01-0.01-0.01-0.01 \
  --k_neighbor 2 --stage1_n 2 \
  --seed 0 --loss MAE --gradient_clip 1.5 --epochs_num 40 --optm Adam \
  --learning_rate 4e-3 --bert_freeze no --bert_lr_rate 0.01 \
  --lr_decrease multi_step --lr_decrease_iter 20-35 --lr_decrease_rate 0.1 \
  --compute_dtype bfloat16 --epoch_scan --parallel "$@"
