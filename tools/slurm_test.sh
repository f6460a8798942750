#!/usr/bin/env bash
# Slurm launcher parity with the reference's tools/slurm_test.sh:1.
# Same per-host task shape as slurm_train.sh; sharded eval collects
# per-host results over the filesystem (gga_tpu/parallel/dist_eval.py).
#
# Usage: ./tools/slurm_test.sh PARTITION JOB_NAME CONFIG CKPT [extra args]

set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
HOSTS=${HOSTS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${HOSTS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    bash -c 'COORD=${COORD:-$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1):8476} \
        NPROC=$SLURM_NTASKS PROC_ID=$SLURM_PROCID \
        python -u tools/test.py '"${CONFIG}"' '"${CHECKPOINT}"' '"${PY_ARGS}"''
