#!/usr/bin/env bash
# Launcher parity with the reference's tools/dist_test.sh: single-process
# sharded eval over the local mesh (gga_tpu/parallel/dist_eval.py).
#
#   ./tools/dist_test.sh <config> <checkpoint> [args...]
CONFIG=$1
CKPT=$2
shift 2 || true
exec python "$(dirname "$0")"/test.py "$CONFIG" --checkpoint "$CKPT" "$@"
