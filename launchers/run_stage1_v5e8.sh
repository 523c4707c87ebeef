#!/bin/bash
# Stage 1 (projector alignment) on a single v5e-8 host.
# TPU-native replacement for the reference launcher
# (Stage1/run_projection_train_stage1.sh: accelerate launch over 3 GPUs):
# one process owns all 8 chips; DP sharding comes from the (data, model) mesh.
set -euo pipefail

# --- Run --- #
RUN_NAME="stage1_gemma3-1b_vitl384"
OUTPUT_DIR="./runs/stage1/${RUN_NAME}"

# --- Data --- #
TRAIN_JSON="/data/cxr/captions_train.json"       # [{"image": ..., "caption": ...}]
IMAGE_ROOT="/data/cxr/images"
IMAGE_ROOT_2=""                                   # optional MIMIC-style second root

# --- Models (local HF snapshot dirs) --- #
VISION_MODEL="/models/XraySigLIP__vit-l-16-siglip-384__webli"
LLM_MODEL="/models/gemma-3-1b-it"

# --- Hyperparameters (reference defaults: run_projection_train_stage1.sh:6-22) --- #
BATCH_SIZE=8            # per-host global batch is BATCH_SIZE (sharded over the mesh)
GRAD_ACCUM=2
LR=3e-5
EPOCHS=10
WARMUP_RATIO=0.05

exec projectiontrainer-launch --feeder_procs auto stage1 -- \
  --train_json "${TRAIN_JSON}" \
  --image_root "${IMAGE_ROOT}" \
  ${IMAGE_ROOT_2:+--image_root_2 "${IMAGE_ROOT_2}"} \
  --vision_model_name "${VISION_MODEL}" \
  --llm_name "${LLM_MODEL}" \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size "${BATCH_SIZE}" \
  --gradient_accumulation_steps "${GRAD_ACCUM}" \
  --learning_rate "${LR}" \
  --num_epochs "${EPOCHS}" \
  --warmup_ratio "${WARMUP_RATIO}" \
  --enable_qlora \
  --mesh_data -1 --mesh_model 1 \
  --wandb_project projection_stage1 --wandb_run_name "${RUN_NAME}" \
  "$@"
