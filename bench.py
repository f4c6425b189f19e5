"""Flagship benchmark: stage-1-style training iterations/sec on TPU.

Workload (mirrors the S4R hotdog stage-1 recipe shape, BASELINE.md): 800x800
renders, batch 8 cameras/step, tens of thousands of Gaussians, SSIM+L1 loss,
full forward+backward+Adam update. Until the measured A100 number for the
reference exists, ``vs_baseline`` is computed against an assumed 3.3 it/s
A100 stage-1 throughput (500 steps in ~2.5 min), recorded here explicitly.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "it/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_ITS = 3.3

# bench knobs (env-overridable for quick local runs)
WIDTH = int(os.environ.get("BENCH_WIDTH", 800))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 800))
BATCH = int(os.environ.get("BENCH_BATCH", 8))
NUM_GAUSSIANS = int(os.environ.get("BENCH_GAUSSIANS", 50_000))
TILE_CAPACITY = int(os.environ.get("BENCH_TILE_CAPACITY", 768))
STEPS = int(os.environ.get("BENCH_STEPS", 10))


def main() -> None:
    from geosplatting_tpu.graphics.cameras import Cameras
    from geosplatting_tpu.graphics.splats import Splats
    from geosplatting_tpu.models.gsplatter import GSplatter
    from geosplatting_tpu.train.gsplat_trainer import (
        GSplatTrainer, GSplatTrainerConfig,
    )

    key = jax.random.key(0)
    splats = Splats.random(key, NUM_GAUSSIANS, sh_degree=0, random_scale=0.8)
    splats = splats.replace(opacities=jnp.full_like(splats.opacities, 1.0))
    model = GSplatter(
        sh_degree=0, tile_capacity=TILE_CAPACITY, background_color="black",
        backend=os.environ.get("BENCH_BACKEND", "pallas"),
        pairs_per_gaussian=int(os.environ.get("BENCH_PAIRS", 6)),
        camera_batching=os.environ.get("BENCH_CAMERA_BATCHING", "map"),
    )
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.5, elevation_degrees=15.0,
        num_samples=BATCH, width=WIDTH, height=HEIGHT,
    )
    trainer = GSplatTrainer(
        GSplatTrainerConfig(batch_size=BATCH, warmup_length=10**9),
        model, dataset_size=BATCH,
    )
    state = trainer.init_state(splats)
    gt = jnp.broadcast_to(
        jnp.linspace(0, 1, WIDTH)[None, None, :, None], (BATCH, HEIGHT, WIDTH, 4)
    ).astype(jnp.float32)

    # compile + warmup (the remote-execution pipeline needs several executions
    # before reaching steady state; see .claude/skills/verify/SKILL.md)
    warmup = int(os.environ.get("BENCH_WARMUP", 4))
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, cams, gt, sub, None)
        float(metrics["loss"])  # force full execution + host pull

    t0 = time.time()
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, cams, gt, sub, None)
    final_loss = float(metrics["loss"])  # unambiguous end-of-chain sync
    elapsed = time.time() - t0
    its = STEPS / elapsed
    assert np.isfinite(final_loss), f"non-finite loss: {final_loss}"

    print(json.dumps({
        "metric": f"stage1-style train it/s ({BATCH}x{WIDTH}x{HEIGHT}, {NUM_GAUSSIANS} gaussians)",
        "value": round(its, 4),
        "unit": "it/s",
        "vs_baseline": round(its / A100_REFERENCE_ITS, 4),
    }))


if __name__ == "__main__":
    main()
