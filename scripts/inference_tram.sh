#!/usr/bin/env bash
# In-the-wild reenactment from TRAM estimates (reference: scripts/inference_tram.sh)
set -e
exp_name="${1:?usage: inference_tram.sh <exp_name> <sequence>}"
seq="${2:?sequence name inside the tram root}"
python main.py --stage gs --log.eval_only true --optim.resume true \
    --log.exp_name "${exp_name}" --prompt.scene "tram,${seq}"
