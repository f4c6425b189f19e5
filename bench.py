"""Flagship benchmark: REAL stage-1 GeoSplatter production step + the
3DGS-rasterizer training workload, on TPU.

Headline metric (VERDICT r1 #2): the production stage-1 step — FlexiCubes
96^3 grid -> SharedField materials -> split-sum shading -> antialiased
rasterization at 8x800x800, full forward+backward+Adam — in steps/sec.
``extra`` carries the secondary 3DGS metric (8x800x800, 50k gaussians) that
round 1 headlined. Until a measured A100 number for the reference exists,
``vs_baseline`` compares against an assumed 3.3 it/s A100 stage-1
throughput (500 steps in ~2.5 min), recorded here explicitly.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "it/s", "vs_baseline": N, "extra": {...}}
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

WIDTH = int(os.environ.get("BENCH_WIDTH", 800))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 800))
BATCH = int(os.environ.get("BENCH_BATCH", 8))
NUM_GAUSSIANS = int(os.environ.get("BENCH_GAUSSIANS", 50_000))
TILE_CAPACITY = int(os.environ.get("BENCH_TILE_CAPACITY", 768))
STEPS = int(os.environ.get("BENCH_STEPS", 10))
S1_GRID = int(os.environ.get("BENCH_S1_GRID", 96))
S1_STEPS = int(os.environ.get("BENCH_S1_STEPS", 5))
RUN_S1 = os.environ.get("BENCH_STAGE1", "1") == "1"


def bench_gsplat() -> float:
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

    for _ in range(int(os.environ.get("BENCH_WARMUP", 4))):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, cams, gt, sub, None)
        float(metrics["loss"])
    t0 = time.time()
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, cams, gt, sub, None)
    final_loss = float(metrics["loss"])
    its = STEPS / (time.time() - t0)
    assert np.isfinite(final_loss), f"non-finite loss: {final_loss}"
    return its


def bench_stage1() -> tuple[float, dict]:
    from geosplatting_tpu.graphics import images as gimages
    from geosplatting_tpu.graphics.cameras import Cameras
    from geosplatting_tpu.models.geosplat import GeoSplatter
    from geosplatting_tpu.train.geosplat_trainer import (
        GeoSplatTrainer, GeoSplatTrainerConfig,
    )

    key = jax.random.key(0)
    model = GeoSplatter(
        resolution=S1_GRID, scale=0.8,
        # measured-correct budget for this workload (~1.65M live pairs,
        # pair_fill 0.92); without it the buffers size to the 3x-N worst case
        pairs_budget=int(os.environ.get("BENCH_S1_PAIRS_BUDGET", 1_800_000)),
        batched_binning=os.environ.get("BENCH_S1_BATCHED", "0") == "1",
    )
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=BATCH, width=WIDTH, height=HEIGHT,
    )
    origins, dirs = cams.generate_rays()
    b = jnp.sum(origins * dirs, -1)
    c = jnp.sum(origins * origins, -1) - 0.25
    disc = b * b - c
    hit = (disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0)) > 0)
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    n = (origins + t[..., None] * dirs) / 0.5
    shade = jnp.clip(jnp.sum(n * jnp.array([0.577, 0.577, 0.577]), -1), 0.1, 1.0)
    rgb = jnp.where(hit[..., None], shade[..., None] * jnp.ones(3) * 0.8, 0.0)
    a = hit[..., None].astype(jnp.float32)
    gt = jnp.concatenate((gimages.rgb2srgb(rgb) * a, a), -1)

    params = model.init(jax.random.key(1))
    grid = model.make_grid()
    params["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    trainer = GeoSplatTrainer(GeoSplatTrainerConfig(batch_size=BATCH), model)
    state = trainer.init_state(params)

    for step in range(2):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(
            state, cams, gt, sub, jnp.asarray(step, jnp.float32),
            sampling=trainer.sampling_at(200),
        )
    float(m["loss"])
    t0 = time.time()
    for step in range(S1_STEPS):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(
            state, cams, gt, sub, jnp.asarray(step + 200, jnp.float32),
            sampling=trainer.sampling_at(200),
        )
    loss = float(m["loss"])
    dt = (time.time() - t0) / S1_STEPS
    assert np.isfinite(loss), f"non-finite stage-1 loss: {loss}"
    info = {
        "stage1_s_per_step": round(dt, 3),
        "stage1_num_gaussians": int(m["num_gaussians"]),
        "stage1_pair_fill": round(float(m["pair_fill"]), 3),
    }
    return 1.0 / dt, info


def main() -> None:
    extra: dict = {}
    gs_its = bench_gsplat()
    extra["gsplat_50k_its"] = round(gs_its, 3)

    if RUN_S1:
        s1_its, s1_info = bench_stage1()
        extra.update(s1_info)
        headline = s1_its
        metric = (
            f"stage-1 GeoSplatter production step it/s "
            f"({S1_GRID}^3 grid, {BATCH}x{WIDTH}x{HEIGHT})"
        )
    else:
        headline = gs_its
        metric = (
            f"stage1-style train it/s ({BATCH}x{WIDTH}x{HEIGHT}, "
            f"{NUM_GAUSSIANS} gaussians)"
        )

    print(json.dumps({
        "metric": metric,
        "value": round(headline, 4),
        "unit": "it/s",
        "vs_baseline": round(headline / A100_REFERENCE_ITS, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
