#!/usr/bin/env bash
# NeRF pretrain against SMPL-X depth/mask -> the human template checkpoint
# consumed by stage 1.1 (reference: scripts/pretrain_nerf.sh)
set -e
python main.py \
    --stage nerf \
    --log.pretrain_only true \
    --log.exp_name "pretrain/instant-ngp-adult-neutral" \
    --optim.iters 5000 \
    --data.train_w 512 --data.train_h 512 \
    --prompt.scene canonical
