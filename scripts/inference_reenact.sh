#!/usr/bin/env bash
# Video reenactment with Motion-X-ReEnact motion + inpainted background
# (reference: scripts/inference_reenact.sh)
set -e
exp_name="${1:?usage: inference_reenact.sh <exp_name> <sequence>}"
seq="${2:?sequence name inside Motion-X-ReEnact}"
python main.py --stage gs --log.eval_only true --optim.resume true \
    --log.exp_name "${exp_name}" --prompt.scene "motionx_reenact,${seq}" \
    --render.use_video_background "${seq}"
