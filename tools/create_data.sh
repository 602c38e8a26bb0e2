#!/usr/bin/env bash
# Dataset preparation under a cluster scheduler (reference:
# tools/create_data.sh — srun wrapper).  Data prep is host-side only;
# no accelerator resources are requested.
set -x
export PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH

PARTITION=$1
CONFIG_DATASET=${2:-nuscenes}
ROOT=${3:-./data/nuscenes}
SRUN_ARGS=${SRUN_ARGS:-""}

if command -v srun >/dev/null 2>&1 && [ -n "$PARTITION" ]; then
    srun -p "${PARTITION}" --job-name=create_data \
        --kill-on-bad-exit=1 ${SRUN_ARGS} \
        python -u "$(dirname "$0")"/create_data.py "${CONFIG_DATASET}" \
            --root-path "${ROOT}" --out-dir "${ROOT}"
else
    python -u "$(dirname "$0")"/create_data.py "${CONFIG_DATASET}" \
        --root-path "${ROOT}" --out-dir "${ROOT}"
fi
