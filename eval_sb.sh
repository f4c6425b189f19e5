#!/bin/bash
# Shiny Blender benchmark suite (parity: reference eval_sb.sh).
set -e
DATA_ROOT=${DATA_ROOT:-data/refnerf}

latest() { ls -dt outputs/$1/*/ | head -1; }

for scene in ball car coffee helmet teapot toaster; do
  data="$DATA_ROOT/$scene"
  python scripts/train_geosplat.py "sb-$scene" --dataset_path "$data"
  python scripts/train_geosplat_mc.py "sb-$scene" --dataset_path "$data" \
    --load "$(latest geosplat-sb-$scene)"
  python scripts/train_geosplat_defer.py "sb-$scene" --dataset_path "$data" \
    --load "$(latest geosplat-mc-sb-$scene)"
  python scripts/train_geosplat_defer.py nvseval --dataset_path "$data" \
    --load "$(latest geosplat-defer-sb-$scene)"
done
