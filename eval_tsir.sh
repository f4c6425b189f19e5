#!/bin/bash
# TensoIR-synthetic benchmark suite (parity: reference eval_tsir.sh).
set -e
DATA_ROOT=${DATA_ROOT:-data/tensoir}
for scene in armadillo ficus hotdog lego; do
  python scripts/run_pipeline.py --scene "$scene" \
    --dataset_path "$DATA_ROOT/$scene" --scene_scale 0.9 \
    --eval reliteval --skip-nvs --render-rlit --render-albedo
done
