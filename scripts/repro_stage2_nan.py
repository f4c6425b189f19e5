"""Reproduce + localize the stage-2 (MC shading) TPU-only non-finite grads.

Runs a tiny stage-1 train -> export -> stage-2 setup (mirrors
tests/test_pipeline_3stage.py) and reports, per parameter leaf, how many
gradient entries are non-finite BEFORE sanitization. Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/repro_stage2_nan.py
and on CPU:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/repro_stage2_nan.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import images as gimages
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat import GeoSplatter
from geosplatting_tpu.models.geosplat_mc import GeoSplatterMC, export_stage1
from geosplatting_tpu.train.geosplat_trainer import (
    GeoSplatTrainer, GeoSplatTrainerConfig,
)
from geosplatting_tpu.train.geosplat_mc_trainer import (
    GeoSplatMCTrainer, GeoSplatMCTrainerConfig,
)
from geosplatting_tpu.ops import ssim

W = H = int(os.environ.get("RES_IMG", 32))
RES = int(os.environ.get("RES_GRID", 10))
STEPS1 = int(os.environ.get("STEPS1", 6))
STEPS2 = int(os.environ.get("STEPS2", 8))


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
    print("backend:", jax.default_backend())
    key = jax.random.key(0)
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=4, width=W, height=H,
    )
    gt = gt_views(cams)

    s1 = GeoSplatter(resolution=RES, light_resolution=32, scale=1.0,
                     tile_capacity=96, tile_chunk=4, env_num_samples=8)
    p1 = s1.init(jax.random.key(1))
    grid = s1.make_grid()
    p1["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    t1 = GeoSplatTrainer(GeoSplatTrainerConfig(batch_size=2, vertex_sample_warmup=2), s1)
    st1 = t1.init_state(p1)
    for step in range(STEPS1):
        key, sub = jax.random.split(key)
        st1, _ = t1.train_step(
            st1, cams[jnp.array([step % 4, (step + 1) % 4])],
            gt[jnp.array([step % 4, (step + 1) % 4])], sub,
            jnp.asarray(step, jnp.float32), sampling=t1.sampling_at(step),
        )
    export1 = export_stage1(s1, st1["params"])

    s2 = GeoSplatterMC(
        resolution=RES, scale=1.0, tile_capacity=96, tile_chunk=4,
        num_samples_x=int(os.environ.get("MC_SX", 2)),
        denoise=os.environ.get("DENOISE", "0") == "1",
    )
    p2 = s2.init_from_stage1(export1, jax.random.key(2))
    t2 = GeoSplatMCTrainer(GeoSplatMCTrainerConfig(batch_size=2, geometry_warm_up=2), s2)
    c = t2.config
    rw = {
        "sdf": jnp.asarray(0.1), "occ": jnp.asarray(c.occ_weight),
        "kd_grad": jnp.asarray(c.kd_grad_reg), "ks_grad": jnp.asarray(c.ks_grad_reg),
    }

    @jax.jit
    def raw_grads(params, key):
        k_render, k_bg = jax.random.split(key)

        def loss_fn(params):
            rgba, reg, aux = s2.render(
                params, cams[jnp.array([0, 1])], k_render, reg_weights=rw,
                kd_perturb_std=c.kd_perturb_std, ks_perturb_std=c.ks_perturb_std,
            )
            gtb = gt[jnp.array([0, 1])]
            gt_linear = gimages.srgb2rgb(gtb[..., :3])
            mask = gtb[..., 3:]
            bg = jax.random.uniform(k_bg, rgba[..., :3].shape)
            img1 = rgba[..., :3] + (1 - rgba[..., 3:]) * bg
            img2 = gt_linear * mask + (1 - mask) * bg
            return ssim.ssim_l1_loss(img1, img2) + reg

        return jax.grad(loss_fn)(params)

    for trial in range(STEPS2):
        key, sub = jax.random.split(key)
        g = raw_grads(p2, sub)
        leaves = jax.tree_util.tree_flatten_with_path(g)[0]
        bad = {
            jax.tree_util.keystr(k): int(jnp.sum(~jnp.isfinite(v)))
            for k, v in leaves
        }
        tot = sum(bad.values())
        print(f"trial {trial}: nonfinite total={tot} " +
              " ".join(f"{k}={v}" for k, v in bad.items() if v))
    print("done")


if __name__ == "__main__":
    main()
