#!/bin/bash
# Synthetic4Relight benchmark suite (parity: reference eval_s4r.sh).
# Runs the 3-stage chain per scene, then relight evaluation.
set -e
DATA_ROOT=${DATA_ROOT:-data/Synthetic4Relight}
for scene in air_baloons chair hotdog jugs; do
  python scripts/run_pipeline.py --scene "$scene" \
    --dataset_path "$DATA_ROOT/$scene" \
    --eval reliteval --skip-nvs --render-rlit --render-albedo
done
