"""Profile the stage-3 GeoSplatterDefer train step on TPU.

Builds a synthetic stage-2 export (sphere SDF at RES_GRID, real
GeoSplatterMC.export_model) so the step runs at the true production shape
without a trained checkpoint. Defaults mirror the reference recipe
(tests/model/test_geosplat_defer.py:35-40): 800x800, batch 8, 16 spp.

  PYTHONPATH=/root/.axon_site:/root/repo RES_IMG=800 RES_GRID=96 BATCH=8 \
      python scripts/profile_stage3.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax
import jax.numpy as jnp

from geosplatting_tpu.graphics import images as gimages
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat_defer import GeoSplatterDefer
from geosplatting_tpu.models.geosplat_mc import GeoSplatterMC
from geosplatting_tpu.train.geosplat_defer_trainer import (
    GeoSplatDeferTrainer, GeoSplatDeferTrainerConfig,
)

W = H = int(os.environ.get("RES_IMG", 800))
RES = int(os.environ.get("RES_GRID", 96))
BATCH = int(os.environ.get("BATCH", 8))
STEPS = int(os.environ.get("STEPS", 5))


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
    key = jax.random.key(0)
    mc = GeoSplatterMC(
        resolution=RES, scale=0.8,
        pairs_budget=(
            int(os.environ["PAIRS_BUDGET"]) if "PAIRS_BUDGET" in os.environ
            else None
        ),
        max_render_faces=int(os.environ.get("MAX_FACES", 1 << 18)),
    )
    grid = mc.make_grid()
    mc_params = {
        "sdf": jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45,
        "deform": jnp.zeros((grid.num_vertices, 3)),
        "weights": jnp.zeros((grid.num_cubes, 21)),
        "latlng": jnp.full((256, 512, 3), 0.5),
        "exposure": jnp.zeros(1),
        "field": mc.field.init(jax.random.key(3)),
    }
    t_e = time.time()
    from geosplatting_tpu.models.geosplat_mc import compact_export

    export = jax.jit(mc.export_model)(mc_params, key)
    export = compact_export(jax.device_get(jax.block_until_ready(export)))
    print(f"synthetic stage-2 export: {export['means'].shape[0]} gaussians, "
          f"{time.time() - t_e:.1f} s", flush=True)
    model = GeoSplatterDefer(
        resolution=RES, scale=0.8,
        num_samples_x=int(os.environ.get("SPP_X", 4)),
        shadow_steps=int(os.environ.get("SHADOW_STEPS", 24)),
        pairs_budget=(
            int(os.environ["PAIRS_BUDGET"]) if "PAIRS_BUDGET" in os.environ
            else None
        ),
        chunk_size=int(os.environ.get("KC", 128)),
    )
    params = model.init_from_stage2(export, jax.random.key(1))
    geometry = model.frozen_geometry(export)
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=BATCH, width=W, height=H,
    )
    gt = gt_views(cams)
    trainer = GeoSplatDeferTrainer(
        GeoSplatDeferTrainerConfig(batch_size=BATCH), model
    )
    state = trainer.init_state(params)

    print(f"stage-3 step: grid {RES}^3, {BATCH}x{W}x{H}, "
          f"spp_x={model.num_samples_x}", flush=True)
    t_c = time.time()
    key, sub = jax.random.split(key)
    state, m = trainer.train_step_accum(state, geometry, cams, gt, sub, jnp.asarray(0.0))
    jax.block_until_ready(m["loss"])
    print(f"compile+first step: {time.time() - t_c:.1f} s "
          f"(loss {float(m['loss']):.4f})", flush=True)
    ts = []
    for s in range(STEPS):
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, m = trainer.train_step_accum(
            state, geometry, cams, gt, sub, jnp.asarray(float(s + 1))
        )
        jax.block_until_ready(m["loss"])
        ts.append(time.time() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"steady-state: median {med:.3f} s/step ({1.0 / med:.3f} it/s), "
          f"per-step {['%.2f' % t for t in ts]}, "
          f"loss {float(m['loss']):.4f}, "
          f"nonfinite_grads {int(m.get('nonfinite_grads', 0))}", flush=True)


if __name__ == "__main__":
    main()
