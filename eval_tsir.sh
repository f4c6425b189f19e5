#!/bin/bash
# TensoIR-synthetic benchmark suite (parity: reference eval_tsir.sh).
set -e
DATA_ROOT=${DATA_ROOT:-data/tensoir}

latest() { ls -dt outputs/$1/*/ | head -1; }

for scene in armadillo ficus hotdog lego; do
  data="$DATA_ROOT/$scene"
  python scripts/train_geosplat.py "tsir-$scene" --dataset_path "$data"
  python scripts/train_geosplat_mc.py "tsir-$scene" --dataset_path "$data" \
    --load "$(latest geosplat-tsir-$scene)"
  python scripts/train_geosplat_defer.py "tsir-$scene" --dataset_path "$data" \
    --load "$(latest geosplat-mc-tsir-$scene)"
  python scripts/train_geosplat_defer.py reliteval --dataset_path "$data" \
    --load "$(latest geosplat-defer-tsir-$scene)" --skip_nvs true
done
