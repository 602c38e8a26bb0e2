#!/usr/bin/env bash
# Single-host training launcher (reference: tools/dist_train.sh).
# On TPU, one process drives every local chip via GSPMD — no
# per-device process spawn (reference used torch.distributed.launch).
CONFIG=$1
shift
python "$(dirname "$0")"/train.py "$CONFIG" "$@"
