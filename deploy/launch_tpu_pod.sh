#!/usr/bin/env bash
# Multi-host TPU pod launch — replaces the reference's SkyPilot/torchrun
# flow (reference: skypilot/config.yaml, README.md:24-37). On TPU pods
# jax.distributed discovers peers automatically; one identical command
# runs on every worker.
#
# Usage: ./launch_tpu_pod.sh <tpu-name> <zone> <config-path>
set -euo pipefail
TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
CONFIG=${3:?config path}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd /workspace && python train.py --config_path $CONFIG"
