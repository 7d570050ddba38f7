#!/usr/bin/env bash
# AIST++ dance animation (reference: scripts/inference_aist.sh)
set -e
exp_name="${1:?usage: inference_aist.sh <exp_name>}"
python main.py --stage gs --log.eval_only true --optim.resume true \
    --log.exp_name "${exp_name}" --prompt.scene demo,aist \
    --data.eval_camera_track fixed --data.eval_elevation 90
