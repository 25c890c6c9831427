#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh counterpart).
# On TPU pods there is no torch.distributed.launch: run ONE process per host;
# jax.distributed.initialize() discovers peers from the TPU environment
# (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
CONFIG=$1
shift
exec python "$(dirname "$0")"/train.py "$CONFIG" --distributed "$@"
