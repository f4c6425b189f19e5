"""Profile the stage-1 GeoSplatter train step at production shape on TPU.

Workload: FlexiCubes grid 96^3, 800x800 renders, batch 8 cameras, synthetic
sphere GT — the S4R recipe shape (scripts/train_geosplat.py presets).
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_stage1.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax
import jax.numpy as jnp

from geosplatting_tpu.graphics import images as gimages
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat import GeoSplatter
from geosplatting_tpu.train.geosplat_trainer import (
    GeoSplatTrainer, GeoSplatTrainerConfig,
)

W = H = int(os.environ.get("RES_IMG", 800))
RES = int(os.environ.get("RES_GRID", 96))
BATCH = int(os.environ.get("BATCH", 8))
STEPS = int(os.environ.get("STEPS", 10))


def gt_views(cams):
    origins, dirs = cams.generate_rays()
    b = jnp.sum(origins * dirs, -1)
    c = jnp.sum(origins * origins, -1) - 0.25
    disc = b * b - c
    hit = (disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0)) > 0)
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    p = origins + t[..., None] * dirs
    n = p / 0.5
    shade = jnp.clip(jnp.sum(n * jnp.array([0.577, 0.577, 0.577]), -1), 0.1, 1.0)
    rgb = jnp.where(hit[..., None], shade[..., None] * jnp.ones(3) * 0.8, 0.0)
    a = hit[..., None].astype(jnp.float32)
    return jnp.concatenate((gimages.rgb2srgb(rgb) * a, a), -1)


def main():
    key = jax.random.key(0)
    model = GeoSplatter(
        resolution=RES, scale=0.8,
        backend=os.environ.get("BACKEND", "auto"),
        pairs_budget=(
            int(os.environ["PAIRS_BUDGET"]) if "PAIRS_BUDGET" in os.environ
            else None
        ),
        chunk_size=int(os.environ.get("KC", 128)),
        tile_shape=os.environ.get("TILE_SHAPE", "16"),
        batched_binning=os.environ.get("BATCHED_BINNING", "0") == "1",
        remat_mode=os.environ.get("REMAT_MODE", "shading"),
    )
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=BATCH, width=W, height=H,
    )
    gt = gt_views(cams)
    params = model.init(jax.random.key(1))
    grid = model.make_grid()
    params["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    trainer = GeoSplatTrainer(GeoSplatTrainerConfig(batch_size=BATCH), model)
    state = trainer.init_state(params)

    print("compiling...", flush=True)
    t0 = time.time()
    for step in range(3):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(
            state, cams, gt, sub, jnp.asarray(step, jnp.float32),
            sampling=trainer.sampling_at(200),
        )
    float(m["loss"])
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    times = []
    for step in range(STEPS):
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, m = trainer.train_step(
            state, cams, gt, sub, jnp.asarray(step + 200, jnp.float32),
            sampling=trainer.sampling_at(200),
        )
        loss = float(m["loss"])  # blocks
        times.append(time.time() - t0)
        print(f"  step {step}: {times[-1]:.3f}s loss={loss:.4f}", flush=True)
    times.sort()
    med = times[len(times) // 2]
    print(f"pair_fill {float(m.get('pair_fill', -1)):.3f} face_fill {float(m.get('face_fill', -1)):.3f}")
    print(f"stage1 median {1.0 / med:.3f} it/s ({med * 1000:.0f} ms/step; "
          f"min {times[0] * 1000:.0f} max {times[-1] * 1000:.0f}), "
          f"loss={loss:.4f} gaussians={float(m['num_gaussians']):.0f}")


if __name__ == "__main__":
    main()
