#!/usr/bin/env python
"""Production-scale quality benchmark on TPU: trains the 3-stage chain on
the analytic two-sphere PBR scene and reports NVS / relight / albedo PSNR
and roughness MSE. Numbers are recorded in BASELINE.md; the tiny-scale
regression floor lives in tests/test_quality.py.

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/quality_bench.py
Env knobs: QB_RES (img, 128), QB_GRID (48), QB_S1/QB_S2/QB_S3 steps,
QB_ENV_QUALITY (fast|exact — A/B the training-path env sampling).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_geosplatting")

from geosplatting_tpu.bench.quality_chain import run_quality_chain


def main() -> None:
    t0 = time.time()
    r = run_quality_chain(
        img_res=int(os.environ.get("QB_RES", 128)),
        grid_res=int(os.environ.get("QB_GRID", 48)),
        n_train=int(os.environ.get("QB_TRAIN_VIEWS", 24)),
        n_test=int(os.environ.get("QB_TEST_VIEWS", 4)),
        batch=int(os.environ.get("QB_BATCH", 4)),
        s1_steps=int(os.environ.get("QB_S1", 200)),
        s2_steps=int(os.environ.get("QB_S2", 100)),
        s3_steps=int(os.environ.get("QB_S3", 50)),
        gt_spp_x=int(os.environ.get("QB_GT_SPP_X", 16)),
        train_spp_x=int(os.environ.get("QB_TRAIN_SPP_X", 4)),
        light_resolution=int(os.environ.get("QB_LIGHT_RES", 128)),
        tile_capacity=int(os.environ.get("QB_TILE_CAP", 512)),
        seed=int(os.environ.get("QB_SEED", 0)),
        env_quality=os.environ.get("QB_ENV_QUALITY", "fast"),
        fast_metrics=os.environ.get("QB_FAST_METRICS", "1") == "1",
        pairs_budget=(
            int(os.environ["QB_PAIRS_BUDGET"])
            if "QB_PAIRS_BUDGET" in os.environ else None
        ),
        log=lambda m: print(m, flush=True),
    )
    r["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
