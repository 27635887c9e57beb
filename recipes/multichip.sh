#!/usr/bin/env bash
# Multi-chip canonical MOSI: data parallel over all chips, with the
# optional knobs for the other parallelism modes. On a v4-8 / v5e-8
# slice the batch shards over `data`; critic score matrices still see
# the global batch (GSPMD all-gather). Examples:
#
#   recipes/multichip.sh                         # pure DP over all chips
#   recipes/multichip.sh --mesh_data 4 --mesh_model 2 --seq_shard
#                                                # DP x TP + sequence parallel
#   recipes/multichip.sh --mesh_data 2 --mesh_pipe 4 --pipe_microbatches 8
#                                                # DP x pipeline (BERT in 4 stages)
#   recipes/multichip.sh --mesh_data 4 --mesh_model 2 --fusion moe
#                                                # expert-parallel MoE fusion
#
# Multi-host pod slices: add --distributed (jax.distributed.initialize).
set -euo pipefail

recipes/mosi_dec_canonical.sh \
  --compute_dtype bfloat16 --epoch_scan "$@"
