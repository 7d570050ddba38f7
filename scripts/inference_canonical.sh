#!/usr/bin/env bash
# Canonical-pose turntable render (reference: scripts/inference_canonical.sh)
set -e
exp_name="${1:?usage: inference_canonical.sh <exp_name>}"
python main.py --stage gs --log.eval_only true --optim.resume true \
    --log.exp_name "${exp_name}" --prompt.scene canonical
