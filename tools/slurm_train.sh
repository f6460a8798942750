#!/usr/bin/env bash
# Slurm launcher parity with the reference's tools/slurm_train.sh:1.
#
# TPU-native shape: one srun TASK PER HOST (not per chip) — a single
# process drives every chip on its host through the pjit data-parallel
# mesh; across hosts jax.distributed wires the DCN axis from the Slurm
# env (gga_tpu/parallel/mesh.py init_distributed reads COORD/NPROC/
# PROC_ID, derived below from SLURM_* variables).
#
# Usage: GPUS/HOSTS env kept for muscle-memory parity:
#   ./tools/slurm_train.sh PARTITION JOB_NAME CONFIG WORK_DIR [extra args]

set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
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
        python -u tools/train.py '"${CONFIG}"' --work-dir='"${WORK_DIR}"' '"${PY_ARGS}"''
