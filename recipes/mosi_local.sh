#!/usr/bin/env bash
# Dense local-feature MOSI variant (mosi_50: 50-timestep aligned glove/
# covarep/facet tensors via the reconstructed LocalDataset loader,
# ref: DataLoaderUniversal.py:82-92). Text enters as dense glove
# features; the BERT tower is bypassed automatically (no BERT params are
# even created), W_t projects the glove vectors into d_common. The
# reference cannot run this end-to-end (its feature-text path is dead
# code, Customization.py:86); this framework can.
set -euo pipefail

python -m mimrl_tpu.cli.main \
  --task_name mosi50 --dataset mosi_50 \
  --normalize 0-1-1 --log_scale 0-0-0 --batch_size 128 \
  --d_common 128 --encoders gru --activate gelu --time_len 50 \
  --d_hiddens 25-3-128=5-3-128 --d_outs 25-3-128=5-3-128 \
  --dropout_mlp 0.0-0.0-0.0 --dropout 0.1-0.1-0.1-0.1 --bias \
  --res_project 1-1 \
  --critic_type separate --baseline_type constant --bound_type infonce \
  --loss_mi_coefficient1 1-1-1-1-1-1-1-1-1-1-1 \
  --loss_mi_coefficient2 0.01-0.01-0.01-0.01-0.01-0.01-0.01-0.01 \
  --k_neighbor 2 --stage1_n 2 \
  --seed 0 --loss MAE --gradient_clip 1.5 --epochs_num 70 --optm Adam \
  --learning_rate 4e-3 \
  --lr_decrease multi_step --lr_decrease_iter 9-60 --lr_decrease_rate 0.1 \
  --parallel "$@"
