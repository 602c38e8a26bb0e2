#!/usr/bin/env bash
# Multi-host training launcher (reference: tools/multi_node_dist_train.sh).
# Run this same command on every host of the TPU slice; JAX picks up the
# topology from the TPU runtime (jax.distributed auto-init), with
# per-host input sharding handled by the dataloader
# (distillbev_tpu/datasets/builder.py shard_index/num_shards).
CONFIG=$1
shift
python "$(dirname "$0")"/train.py "$CONFIG" "$@"
