#!/usr/bin/env bash
# Launcher parity with the reference's tools/dist_pseudo.sh (stage 3:
# run the weak-trained detector over trainval and match to 2D GT).
#
# One process drives every local chip through the pjit mesh; the GPUS
# argument of the reference launcher is therefore dropped — shard count
# comes from jax.device_count().
#
#   ./tools/dist_pseudo.sh <matching-config> <checkpoint> [args...]
CONFIG=$1
CKPT=$2
shift 2 || true
exec python "$(dirname "$0")"/generate_pseudo_labels_gga.py \
    "$CONFIG" --checkpoint "$CKPT" "$@"
