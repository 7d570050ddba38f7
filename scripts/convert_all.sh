#!/usr/bin/env bash
# Real-weights runbook (VERDICT r2 #9): run this ONCE on a machine that has
# the licensed/public assets, then smoke-train 100 steps before committing
# to a full run. Every step is also documented in README.md "Assets".
#
# Inputs (set the env vars or edit the defaults):
#   HF_SRC   - a flat dir of diffusers/transformers torch weights:
#              unet.safetensors, vae.safetensors, text_encoder.safetensors,
#              controlnet_pose.safetensors [, controlnet_depth...]
#              (collect from the HF repos the reference uses:
#               runwayml/stable-diffusion-v1-5 + lllyasviel/control_v11p_sd15_openpose,
#               reference model cards: core/guidance/basic.py:29-89)
#   SMPLX_NPZ - SMPLX_NEUTRAL_2020.npz (https://smpl-x.is.tue.mpg.de, licensed)
#   EXTERNAL  - asset root (default ./external, see configs/paths.py)
set -euo pipefail
cd "$(dirname "$0")/.."

EXTERNAL="${EXTERNAL:-external}"
HF_SRC="${HF_SRC:?set HF_SRC to the dir of torch safetensors}"
MODEL="${MODEL:-sd15}"
SMPLX_NPZ="${SMPLX_NPZ:-}"
OUT="$EXTERNAL/guidance_jax"
mkdir -p "$OUT" "$EXTERNAL/human_templates/smplx"

echo "== 1/4 convert $MODEL + ControlNet -> $OUT"
# MODEL picks the card (convert.py MODEL_FAMILIES): sd14/sd15, sd20/sd20b/
# sd21/sd21b (SD2.x: OpenCLIP-H text encoder; the 768-v cards load with
# v-prediction), normal-adapted/depth-adapted (HumanNorm). XL: use
# convert_sdxl_from_hf_cache instead.
python - <<EOF
from dreamwaltz_g_tpu.guidance.convert import convert_from_hf_cache
convert_from_hf_cache("$HF_SRC", "$OUT", conditions=("pose", "depth"),
                      model="$MODEL")
EOF
# tokenizer files ride along unconverted
for f in vocab.json merges.txt; do
    [ -f "$HF_SRC/$f" ] && cp "$HF_SRC/$f" "$OUT/"
done
# optional: CLIP vision tower for R-Precision eval
# (clip_vision.safetensors + clip_retrieval_text.safetensors from
#  openai/clip-vit-base-patch32) -> convert_clip_vision / convert_clip_text;
# batch protocol over a rendered set: scripts/eval_r_precision.py
# optional adapters: LoRA safetensors under $OUT/lora/<name> (used via
# --guide.lora_name) and Textual-Inversion learned_embeds.bin under
# $OUT/concepts/<name>/ (used via --guide.concept_name)

echo "== 2/4 SMPL-X template"
if [ -n "$SMPLX_NPZ" ]; then
    cp "$SMPLX_NPZ" "$EXTERNAL/human_templates/smplx/SMPLX_NEUTRAL_2020.npz"
else
    echo "   (skip: SMPLX_NPZ not set — place SMPLX_NEUTRAL_2020.npz under"
    echo "    $EXTERNAL/human_templates/smplx/ manually)"
fi
# optional extras next to the npz: smplx_vert_segmentation.json (semantic
# parts), smplx_kid_template.npy (--prompt.smpl_age kid), VPoser ckpt

echo "== 3/4 converted-weights self-check (check_sd sample export)"
python main.py --stage nerf --guide.text "a photo of a person" \
    --log.exp_root outputs/smoke --log.exp_name checksd \
    --log.check_sd true --optim.iters 1 \
    --log.snapshot_interval 0 --log.evaluate_interval 0 --log.save_interval 0
echo "   inspect outputs/smoke/checksd/check/sd_*.png — they must look like"
echo "   real SD samples of the prompt before you spend hours training"

echo "== 4/4 100-step smoke train (stage 1 then stage 2)"
python main.py --stage nerf --guide.text "a photo of a person" \
    --log.exp_root outputs/smoke --log.exp_name s1 --optim.iters 100 \
    --data.train_w 64 --log.save_interval 100
python main.py --stage gs --guide.text "a photo of a person" \
    --render.from_nerf outputs/smoke/s1 \
    --log.exp_root outputs/smoke --log.exp_name s2 --optim.iters 100 \
    --log.save_interval 100
echo "smoke OK — full runs: scripts/train_w_expr.sh / train_wo_expr.sh"
