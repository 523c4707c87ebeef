#!/bin/bash
# Stage 2 (VQA instruction fine-tune, QLoRA) on a single v5e-8 host.
# TPU-native replacement for the reference launcher (Stage2/run_vqa_train_stage2.sh:73,
# accelerate launch over 3 GPUs + bitsandbytes NF4): one process owns the 8 chips;
# the 8B decoder takes TP over the model mesh axis, the int8/nf4-mirror base replaces
# bitsandbytes (BENCH nf4_dequant_cost_analysis row for the trade-off).
set -euo pipefail

RUN_NAME="stage2_qwen3-8b_qlora"
STAGE1_RUN="./runs/stage1/stage1_qwen3-8b_vitl384"
OUTPUT_DIR="./runs/stage2/${RUN_NAME}"

TRAIN_JSON="/data/cxr/vqa_train.json"   # [{"image", "problem", "normal_caption"}]
VAL_JSON="/data/cxr/vqa_val.json"
IMAGE_ROOT="/data/cxr/images"
IMAGE_ROOT_2=""                          # optional MIMIC-style second root

VISION_MODEL="/models/XraySigLIP__vit-l-16-siglip-384__webli"
LLM_MODEL="/models/Qwen3-8B"

# reference config: bs4 x 3 GPUs x ga8, lr 1e-5, 3 epochs, q<=256/a<=1024, LoRA r16
# (run_vqa_train_stage2.sh:26-53). TP=2 keeps the 8B optimizer+activations per-chip.
BATCH_SIZE=16           # global; sharded over mesh_data=4
GRAD_ACCUM=8
LR=1e-5
EPOCHS=3
RESUME_QLORA_PATH=""    # set to .../checkpoint-epoch_N/language_model to warm-start

exec projectiontrainer-launch --feeder_procs auto stage2 -- \
  --train_json "${TRAIN_JSON}" \
  --val_json "${VAL_JSON}" \
  --image_root "${IMAGE_ROOT}" \
  ${IMAGE_ROOT_2:+--image_root_2 "${IMAGE_ROOT_2}"} \
  --vision_model_name "${VISION_MODEL}" \
  --llm_name "${LLM_MODEL}" \
  --stage1_projector_path "${STAGE1_RUN}" \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size "${BATCH_SIZE}" \
  --gradient_accumulation_steps "${GRAD_ACCUM}" \
  --learning_rate "${LR}" \
  --num_epochs "${EPOCHS}" \
  --warmup_ratio 0.05 \
  --max_q_len 256 --max_a_len 1024 \
  --enable_qlora --quant_method nf4-mirror \
  --lora_r 16 --lora_alpha 32 --lora_dropout 0.05 \
  ${RESUME_QLORA_PATH:+--resume_qlora_adapter_path "${RESUME_QLORA_PATH}"} \
  --mesh_data 4 --mesh_model 2 \
  --wandb_project vqa_stage2 --wandb_run_name "${RUN_NAME}" \
  "$@"
