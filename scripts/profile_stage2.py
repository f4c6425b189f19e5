"""Profile the stage-2 GeoSplatterMC train step on TPU.

Workload mirrors the quality-bench stage-2 shape by default (128^2 images,
grid 48, batch 4, 4x spp) — set RES_IMG/RES_GRID/BATCH/MC_SX for other
scales. BATCHED_BINNING=1 A/Bs the vmapped binning front-end.
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_stage2.py
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
from geosplatting_tpu.models.geosplat_mc import GeoSplatterMC
from geosplatting_tpu.train.geosplat_mc_trainer import (
    GeoSplatMCTrainer, GeoSplatMCTrainerConfig,
)

W = H = int(os.environ.get("RES_IMG", 128))
RES = int(os.environ.get("RES_GRID", 48))
BATCH = int(os.environ.get("BATCH", 4))
STEPS = int(os.environ.get("STEPS", 6))


def gt_views(cams):
    origins, dirs = cams.generate_rays()
    b = jnp.sum(origins * dirs, -1)
    c = jnp.sum(origins * origins, -1) - 0.25
    hit = (b * b - c > 0) & (-b - jnp.sqrt(jnp.maximum(b * b - c, 0)) > 0)
    t = -b - jnp.sqrt(jnp.maximum(b * b - c, 0.0))
    n = (origins + t[..., None] * dirs) / 0.5
    shade = jnp.clip(jnp.sum(n * jnp.array([0.577, 0.577, 0.577]), -1), 0.1, 1.0)
    rgb = jnp.where(hit[..., None], shade[..., None] * jnp.ones(3) * 0.8, 0.0)
    a = hit[..., None].astype(jnp.float32)
    return jnp.concatenate((gimages.rgb2srgb(rgb) * a, a), -1)


def main():
    model = GeoSplatterMC(
        resolution=RES, scale=0.8,
        num_samples_x=int(os.environ.get("MC_SX", 4)),
        shadow_steps=int(os.environ.get("SHADOW_STEPS", 24)),
        denoise=os.environ.get("DENOISE", "1") == "1",
        pairs_budget=(
            int(os.environ["PAIRS_BUDGET"]) if "PAIRS_BUDGET" in os.environ
            else None
        ),
        chunk_size=int(os.environ.get("KC", 128)),
        batched_binning=os.environ.get("BATCHED_BINNING", "0") == "1",
        max_render_faces=int(os.environ.get("MAX_FACES", 1 << 18)),
    )
    grid = model.make_grid()
    params = {
        "sdf": jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45,
        "deform": jnp.zeros((grid.num_vertices, 3)),
        "weights": jnp.zeros((grid.num_cubes, 21)),
        "latlng": jnp.full((256, 512, 3), 0.5),
        "exposure": jnp.zeros(1),
        "field": model.field.init(jax.random.key(3)),
    }
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=BATCH, width=W, height=H,
    )
    gt = gt_views(cams)
    trainer = GeoSplatMCTrainer(GeoSplatMCTrainerConfig(batch_size=BATCH), model)
    state = trainer.init_state(params)
    key = jax.random.key(0)

    print(
        f"stage-2 step: grid {RES}^3, {BATCH}x{W}x{H}, "
        f"spp_x={model.num_samples_x}, denoise={model.denoise}, "
        f"batched_binning={model.batched_binning}", flush=True,
    )
    t_c = time.time()
    key, sub = jax.random.split(key)
    state, m = trainer.train_step_accum(state, cams, gt, sub, jnp.asarray(0.0))
    print(f"compile+first step: {time.time() - t_c:.1f} s "
          f"(loss {float(m['loss']):.4f})", flush=True)
    times = []
    for s in range(STEPS):
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, m = trainer.train_step_accum(state, cams, gt, sub, jnp.asarray(float(s + 1)))
        jax.block_until_ready(m["loss"])  # blocked per-step timing (BASELINE.md r3 postmortem)
        times.append(time.time() - t0)
    times.sort()
    dt = times[len(times) // 2]
    print(f"steady-state: {dt:.3f} s/step median ({1.0 / dt:.3f} it/s), "
          f"per-step {[round(t, 3) for t in times]}, "
          f"loss {float(m['loss']):.4f}, "
          f"nonfinite_grads {int(m.get('nonfinite_grads', 0))}", flush=True)


if __name__ == "__main__":
    main()
