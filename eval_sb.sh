#!/bin/bash
# Shiny Blender benchmark suite (parity: reference eval_sb.sh).
set -e
DATA_ROOT=${DATA_ROOT:-data/refnerf}
for scene in ball car coffee helmet teapot toaster; do
  python scripts/run_pipeline.py --scene "$scene" \
    --dataset_path "$DATA_ROOT/$scene" --resolution 128 --scene_scale 1.05 \
    --eval nvseval
done
