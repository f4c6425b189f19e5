#!/bin/bash
# Single-scene 3-stage chain (parity: reference eval.sh:1-5): each stage is a
# standalone resumable task; hand-offs go through each run's export.npz.
set -e
SCENE=${1:-hotdog}
DATA=${2:-data/Synthetic4Relight/$SCENE}

latest() { ls -dt outputs/$1/*/ | head -1; }

python scripts/train_geosplat.py "s4r-$SCENE" --dataset_path "$DATA"
python scripts/train_geosplat_mc.py "s4r-$SCENE" --dataset_path "$DATA" \
  --load "$(latest geosplat-s4r-$SCENE)"
python scripts/train_geosplat_defer.py "s4r-$SCENE" --dataset_path "$DATA" \
  --load "$(latest geosplat-mc-s4r-$SCENE)"
python scripts/train_geosplat_defer.py reliteval --dataset_path "$DATA" \
  --load "$(latest geosplat-defer-s4r-$SCENE)"
