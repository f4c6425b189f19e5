"""Standalone repro for the stage-2 TPU worker crash at quality-bench scale.

Skips stage-1 training entirely (init + immediate export) and runs the
stage-2 step at the exact quality_chain config (img 128, grid 48,
tile_capacity 512). Toggles bisect which part faults:

  MODE=train|grad|fwd   what to run (default train)
  DENOISE=0|1           bilateral denoiser (default 1, chain default)
  MC_SX=4               sqrt samples (chain: 4)
  SHADOW=1|0            SDF visibility (default 1)
  BACKEND=auto|pallas|jnp  rasterizer backend (default auto)
  RES_IMG=128 RES_GRID=48 TILE_CAP=512 BATCH=4

Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/repro_s2_crash.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from geosplatting_tpu.bench import quality as q
from geosplatting_tpu.models.geosplat import GeoSplatter
from geosplatting_tpu.models.geosplat_mc import GeoSplatterMC, export_stage1
from geosplatting_tpu.train.geosplat_mc_trainer import (
    GeoSplatMCTrainer, GeoSplatMCTrainerConfig,
)

W = H = int(os.environ.get("RES_IMG", 128))
RES = int(os.environ.get("RES_GRID", 48))
TILE_CAP = int(os.environ.get("TILE_CAP", 512))
BATCH = int(os.environ.get("BATCH", 4))
MODE = os.environ.get("MODE", "train")


def main():
    print("backend:", jax.default_backend(), "mode:", MODE, flush=True)
    key = jax.random.key(0)
    cams = q.make_cameras("train", max(BATCH, 4), width=W, height=H)
    if MODE == "train":
        gt = q.render_gt_views(
            cams, q.make_envmap(kind="train"), jax.random.key(7), 2
        )
        print("gt done", flush=True)

    s1 = GeoSplatter(resolution=RES, light_resolution=128, scale=1.0,
                     tile_capacity=TILE_CAP, tile_chunk=4)
    p1 = s1.init(jax.random.key(1))
    grid = s1.make_grid()
    p1["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    export1 = export_stage1(s1, p1)
    print("export done", flush=True)

    s2 = GeoSplatterMC(
        resolution=RES, scale=1.0, tile_capacity=TILE_CAP, tile_chunk=4,
        num_samples_x=int(os.environ.get("MC_SX", 4)),
        denoise=os.environ.get("DENOISE", "1") == "1",
        shadow_scale=float(os.environ.get("SHADOW", "1")),
        backend=os.environ.get("BACKEND", "auto"),
    )
    p2 = s2.init_from_stage1(export1, jax.random.key(2))
    idx = jnp.arange(BATCH)

    if MODE == "fwd":
        rgba, reg, aux = jax.jit(
            lambda p, k: s2.render(p, cams[idx], k)
        )(p2, jax.random.key(3))
        print("fwd ok:", float(rgba.sum()), flush=True)
        return
    if MODE == "grad":
        def loss_fn(p, k):
            rgba, reg, aux = s2.render(p, cams[idx], k)
            return rgba.mean() + reg
        g = jax.jit(jax.grad(loss_fn))(p2, jax.random.key(3))
        tot = sum(int(jnp.sum(~jnp.isfinite(v))) for v in jax.tree.leaves(g))
        print("grad ok: nonfinite", tot, flush=True)
        return

    t2 = GeoSplatMCTrainer(
        GeoSplatMCTrainerConfig(num_steps=4, batch_size=BATCH, geometry_warm_up=2),
        s2,
    )
    st2 = t2.init_state(p2)
    for step in range(2):
        key, sub = jax.random.split(key)
        st2, m2 = t2.train_step(
            st2, cams[idx], gt[idx], sub, jnp.asarray(step, jnp.float32)
        )
        print(f"step {step}: loss={float(m2['loss']):.4f}", flush=True)
    print("train ok", flush=True)


if __name__ == "__main__":
    main()
