#!/bin/bash
# Synthetic4Relight benchmark suite (parity: reference eval_s4r.sh).
# Per scene: stage-1 -> stage-2 -> stage-3 tasks (each resumable, chained by
# export.npz), then standalone relight evaluation.
set -e
DATA_ROOT=${DATA_ROOT:-data/Synthetic4Relight}

latest() { ls -dt outputs/$1/*/ | head -1; }

for scene in air_baloons chair hotdog jugs; do
  data="$DATA_ROOT/$scene"
  python scripts/train_geosplat.py "s4r-$scene" --dataset_path "$data"
  python scripts/train_geosplat_mc.py "s4r-$scene" --dataset_path "$data" \
    --load "$(latest geosplat-s4r-$scene)"
  python scripts/train_geosplat_defer.py "s4r-$scene" --dataset_path "$data" \
    --load "$(latest geosplat-mc-s4r-$scene)"
  python scripts/train_geosplat_defer.py reliteval --dataset_path "$data" \
    --load "$(latest geosplat-defer-s4r-$scene)" --skip_nvs true
done
