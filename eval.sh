#!/bin/bash
# Single-scene 3-stage chain (parity: reference eval.sh:1-5).
set -e
SCENE=${1:-hotdog}
DATA=${2:-data/Synthetic4Relight/$SCENE}
python scripts/run_pipeline.py --scene "$SCENE" --dataset_path "$DATA" --eval reliteval
