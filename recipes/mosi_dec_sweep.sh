#!/usr/bin/env bash
# MOSI-Dec sweep family (the bulk of Run2.ipynb): vary MI coefficients,
# k_neighbor, stage1_n, bound.  SWEEP=<name> selects a variant.
set -euo pipefail

SWEEP="${SWEEP:-coef2}"
BASE=(--dataset mosi_Dec --normalize 0-1-1 --batch_size 128
  --d_common 128 --encoders gru --activate gelu --time_len 100
  --d_hiddens 50-3-128=10-3-128 --d_outs 50-3-128=10-3-128
  --dropout_mlp 0.0-0.0-0.0 --dropout 0.1-0.1-0.1-0.1 --bias
  --res_project 1-1 --critic_type separate --baseline_type constant
  --k_neighbor 2 --cmi_last_acticate sigmoid
  --seed 0 --loss MAE --gradient_clip 1.5 --epochs_num 70 --optm Adam
  --learning_rate 4e-3 --bert_lr_rate 0.01
  --lr_decrease multi_step --lr_decrease_iter 9-60 --lr_decrease_rate 0.1
  --parallel)

case "$SWEEP" in
  coef2)   # MI pressure sweep on the stage-2 coefficients
    for c in 0.001 0.01 0.1; do
      python -m mimrl_tpu.cli.main "${BASE[@]}" --bound_type infonce \
        --stage1_n 2 --task_name "mosiDec_coef2_${c}" \
        --loss_mi_coefficient1 1-1-1-1-1-1-1-1-1-1-1 \
        --loss_mi_coefficient2 "$c-$c-$c-$c-$c-$c-$c-$c" "$@"
    done ;;
  stage1)  # critic-training intensity
    for n in 1 2 4; do
      python -m mimrl_tpu.cli.main "${BASE[@]}" --bound_type infonce \
        --stage1_n "$n" --task_name "mosiDec_stage1_${n}" \
        --loss_mi_coefficient1 1-1-1-1-1-1-1-1-1-1-1 \
        --loss_mi_coefficient2 0.01-0.01-0.01-0.01-0.01-0.01-0.01-0.01 "$@"
    done ;;
  bound)   # bound family sweep
    for b in infonce nwj js smile dv; do
      python -m mimrl_tpu.cli.main "${BASE[@]}" --bound_type "$b" \
        --stage1_n 2 --task_name "mosiDec_bound_${b}" \
        --loss_mi_coefficient1 1-1-1-1-1-1-1-1-1-1-1 \
        --loss_mi_coefficient2 0.01-0.01-0.01-0.01-0.01-0.01-0.01-0.01 "$@"
    done ;;
  *) echo "unknown SWEEP=$SWEEP" >&2; exit 1 ;;
esac
