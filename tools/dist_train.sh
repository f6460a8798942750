#!/usr/bin/env bash
# Launcher parity with the reference's tools/dist_train.sh.
#
# On TPU there is no torch.distributed-style per-device process group: ONE
# process drives every local chip through the pjit data-parallel mesh
# (gga_tpu/parallel/mesh.py), so single-host "distributed" training is just:
#
#   python tools/train.py "$@"
#
# Multi-host pods: launch this once per host with COORD/NPROC/PROC_ID set;
# gga_tpu.parallel.mesh.init_distributed wires jax.distributed and the mesh
# then spans ICI within hosts and DCN across them.
CONFIG=$1
shift || true
exec python "$(dirname "$0")"/train.py "$CONFIG" "$@"
