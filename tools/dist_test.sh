#!/usr/bin/env bash
# Single-host evaluation launcher (reference: tools/dist_test.sh —
# torch.distributed.launch over N GPU processes).  On TPU one process
# drives every local chip via GSPMD; multi-host eval adds
# jax.distributed coordinator env vars (see multi_node_dist_train.sh).
CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")"/test.py "$CONFIG" "$CHECKPOINT" "$@"
