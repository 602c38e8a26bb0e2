#!/usr/bin/env bash
# SLURM multi-host training launcher (reference: tools/slurm_train.sh).
# TPU-native shape: ONE task per host (each task drives all of its
# host's chips via GSPMD); jax.distributed picks the coordinator from
# the SLURM env automatically (jax.distributed.initialize()).
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
HOSTS=${HOSTS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --ntasks="${HOSTS}" \
    --ntasks-per-node=1 \
    --cpus-per-task="${CPUS_PER_TASK}" \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")"/train.py "${CONFIG}" \
        --work-dir="${WORK_DIR}" --distributed ${PY_ARGS}
