#!/bin/bash
# Stage 0 (SigLIP contrastive vision-encoder fine-tune) on a single v5e-8 host.
# TPU-native replacement for the reference's torchrun launcher
# (Stage0/run_train_vision_encoder_stage0.sh:62, 3 GPUs + NCCL): one process owns the
# 8 chips, the sigmoid loss uses per-shard negatives (reference DDP semantics).
set -euo pipefail

RUN_NAME="stage0_so400m512"
OUTPUT_DIR="./runs/stage0/${RUN_NAME}"

TRAIN_JSON="/data/cxr/pairs_train.json"          # [{"image": ..., "caption": ...}]
IMAGE_ROOT="/data/cxr/images"

MODEL="/models/siglip2-so400m-patch16-512"

# reference config: bs16 x 3 GPUs x ga4, lr 5e-5, 100 epochs, bf16, augmentation on
# (run_train_vision_encoder_stage0.sh:13-48); per-chip batch stays 16 on v5e.
BATCH_SIZE=128          # global = 16/chip x 8 chips
GRAD_ACCUM=4
LR=5e-5
EPOCHS=100

# stage-0 at 512px is the hungriest host pipeline (~265 img/s for 8 chips): size the
# decode+augment worker pool explicitly instead of the 4/chip auto default.
exec projectiontrainer-launch --feeder_procs 64 stage0 -- \
  --train_json "${TRAIN_JSON}" \
  --image_root "${IMAGE_ROOT}" \
  --model_name "${MODEL}" \
  --output_dir "${OUTPUT_DIR}" \
  --img_size 512 \
  --batch_size "${BATCH_SIZE}" \
  --gradient_accumulation_steps "${GRAD_ACCUM}" \
  --learning_rate "${LR}" \
  --num_epochs "${EPOCHS}" \
  --freeze_text_encoder --freeze_logit_scale \
  --use_online_augmentation \
  --val_split 0.05 \
  --mesh_data -1 --mesh_model 1 \
  --wandb_project siglip_stage0 --wandb_run_name "${RUN_NAME}" \
  "$@"
