#!/bin/bash
# Stage 2 on a MULTI-HOST TPU pod (e.g. v5e-16 = 2 hosts x 8 chips).
#
# Run this same script on EVERY host of the pod, e.g.:
#   gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --worker=all \
#     --command="cd ~/projectiontrainer && bash launchers/run_stage2_pod.sh"
#
# On Cloud TPU the launcher auto-detects the coordinator / process count / process id
# from the TPU runtime metadata (cli/launch.py mode 1); jax.distributed.initialize
# joins the hosts and the (data, model) mesh spans all chips — DP shards ride DCN
# across hosts, TP stays inside each host's ICI. OUTPUT_DIR must be shared storage
# (GCS or NFS): Orbax checkpoint writes are collective.
#
# Dry-run this exact config on one machine with no TPUs:
#   projectiontrainer-launch --simulate 2 --devices_per_host 8 stage2 -- <same args>
set -euo pipefail

RUN_NAME="stage2_qwen3-8b_qlora_pod16"
OUTPUT_DIR="gs://my-bucket/runs/stage2/${RUN_NAME}"

TRAIN_JSON="/data/cxr/vqa_train.json"
VAL_JSON="/data/cxr/vqa_val.json"
IMAGE_ROOT="/data/cxr/images"
VISION_MODEL="/models/XraySigLIP__vit-l-16-siglip-384__webli"
LLM_MODEL="/models/Qwen3-8B"
STAGE1_RUN="gs://my-bucket/runs/stage1/stage1_qwen3-8b_vitl384"

# v5e-16: data=8 x model=2 (TP pairs are ICI neighbors within each host).
# Per-host feeder pool sizes itself (--feeder_procs auto = 4 workers/local chip).
exec projectiontrainer-launch --feeder_procs auto stage2 -- \
  --train_json "${TRAIN_JSON}" \
  --val_json "${VAL_JSON}" \
  --image_root "${IMAGE_ROOT}" \
  --vision_model_name "${VISION_MODEL}" \
  --llm_name "${LLM_MODEL}" \
  --stage1_projector_path "${STAGE1_RUN}" \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size 32 \
  --gradient_accumulation_steps 4 \
  --learning_rate 1e-5 \
  --num_epochs 3 \
  --warmup_ratio 0.05 \
  --max_q_len 256 --max_a_len 1024 \
  --enable_qlora --quant_method nf4-mirror \
  --lora_r 16 --lora_alpha 32 --lora_dropout 0.05 \
  --mesh_data 8 --mesh_model 2 \
  --save_steps 500 --resume \
  --wandb_project vqa_stage2 --wandb_run_name "${RUN_NAME}" \
  "$@"
