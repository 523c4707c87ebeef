#!/bin/bash
# cls_evaluate experiment grid + auto-eval, replacing the reference's bash scheduler
# (cls_evaluate/run_experiments.sh:20-189 and run_distributed_experiments.sh:26-272 —
# round-robin GPU assignment + wait -n throttling). The Python scheduler
# (cli/run_experiments.py -> eval/sweep.py) reproduces the slot/throttle protocol and
# the BEST_RESULT -> all_experiments_summary.tsv aggregation.
set -euo pipefail

DATA_JSON="/data/cxr/cls_labels.json"
IMAGE_ROOT="/data/cxr/images"
VISION_MODEL="/models/XraySigLIP__vit-l-16-siglip-384__webli"
OUT_BASE="./cls_experiments"

# class grids per experiment live in the default 6-experiment grid (or --grid_json)
exec projectiontrainer-run-experiments \
  --data_json "${DATA_JSON}" \
  --image_root "${IMAGE_ROOT}" \
  --vision_model_name "${VISION_MODEL}" \
  --output_base_dir "${OUT_BASE}" \
  --max_concurrent 1 \
  "$@"
