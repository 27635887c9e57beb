#!/usr/bin/env bash
# Run2.ipynb cell 22 — mosiDecAll238 (flag-set verbatim from the
# reference notebook; extracted by recipes/generate_sweep.py).
# Usage: recipes/sweep/36_cell22_mosiDecAll238.sh [extra flags...]  (e.g. --data_dir, --bert_vocab)
set -euo pipefail

python -m mimrl_tpu.cli.main \
  --task_name mosiDecAll238 \
  --dataset mosi_Dec \
  --log_scale 0-0-0 \
  --normalize 0-1-1 \
  --batch_size 64 \
  --num_workers 8 \
  --d_common 128 \
  --encoders gru \
  --activate relu \
  --time_len 150 \
  --d_hiddens 50-3-128=20-3-128=10-3-128 \
  --d_outs 50-3-128=20-3-128=10-3-128 \
  --dropout_mlp 0.0-0.0-0.0 \
  --dropout 0.1-0.1-0.1-0.1 \
  --bias \
  --res_project 1-1-1 \
  --critic_type separate \
  --baseline_type constant \
  --bound_type infonce \
  --mi_lr_rate 1.0 \
  --cmi_lr_rate 1.0 \
  --loss_mi_coefficient1 1-1-1-1-1-1-1-1-1-1-1 \
  --loss_mi_coefficient2 0.1-0.1-0.1-0.1-0.1-0.1-0.1-0.1 \
  --k_neighbor 2 \
  --radius 1.0 \
  --cmi_last_acticate sigmoid \
  --stage1_n 2 \
  --seed 6 \
  --loss MAE \
  --gradient_clip 1.5 \
  --epochs_num 70 \
  --optm Adam \
  --learning_rate 1e-3 \
  --bert_freeze no \
  --bert_lr_rate 0.01 \
  --weight_decay 0.0 \
  --lr_decrease multi_step \
  --lr_decrease_iter 50-60 \
  --lr_decrease_rate 0.1 \
  --save_best_features \
  --parallel \
  "$@"
