#!/usr/bin/env python
"""Localize the production-shape stage-2/3 worker crash (round-5).

The round-4 fused-step crash was diagnosed as a remote-compile cap and fixed
by per-camera dispatch (train_step_accum) — but the round-5 queue's
production profiles crashed the worker INSIDE the first accum step for both
stage 2 (spp 64, unbudgeted pairs) and stage 3 (spp 256). This script splits
the per-camera gradient program into explicit AOT phases so the crash
attributes to trace / remote compile / execute, with every size knob on env:

  RES_IMG RES_GRID BATCH MC_SX SHADOW_STEPS DENOISE PAIRS_BUDGET MAX_FACES
  GRAD=0  -> forward (render) only, no gradient
  APPLY=1 -> also run the full accum step + apply after the AOT probe

  PYTHONPATH=/root/.axon_site:/root/repo RES_IMG=800 RES_GRID=96 \
      PAIRS_BUDGET=1600000 MAX_FACES=131072 python scripts/repro_s2_accum.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax
import jax.numpy as jnp

from geosplatting_tpu.graphics import images as gimages
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat_mc import GeoSplatterMC
from geosplatting_tpu.train.geosplat_mc_trainer import (
    GeoSplatMCTrainer, GeoSplatMCTrainerConfig,
)

W = H = int(os.environ.get("RES_IMG", 800))
RES = int(os.environ.get("RES_GRID", 96))
BATCH = int(os.environ.get("BATCH", 8))


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


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
        num_samples_x=int(os.environ.get("MC_SX", 8)),
        shadow_steps=int(os.environ.get("SHADOW_STEPS", 24)),
        shadow_scale=float(os.environ.get("SHADOW_SCALE", 1.0)),
        denoise=os.environ.get("DENOISE", "1") == "1",
        pairs_budget=(
            int(os.environ["PAIRS_BUDGET"]) if "PAIRS_BUDGET" in os.environ
            else None
        ),
        chunk_size=int(os.environ.get("KC", 128)),
        max_render_faces=int(os.environ.get("MAX_FACES", 1 << 17)),
    )
    say(f"model: grid {RES}^3, {BATCH}x{W}x{H}, spp_x={model.num_samples_x}, "
        f"shadow_steps={model.shadow_steps}, denoise={model.denoise}, "
        f"pairs_budget={model.pairs_budget}, max_faces={model.max_render_faces}")
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
    trainer = GeoSplatMCTrainer(
        GeoSplatMCTrainerConfig(batch_size=BATCH), model)
    key = jax.random.key(0)
    k_render, k_bg = jax.random.split(key)
    bg = jax.random.uniform(k_bg, gt[..., :3].shape)
    sk = jax.random.split(jax.random.fold_in(k_render, 1), BATCH)
    rw = trainer._reg_weights(jnp.asarray(0.0))

    if os.environ.get("GRAD", "1") == "1":
        say("AOT: tracing per-camera GRADIENT program...")
        fn = GeoSplatMCTrainer._cam_grad
    else:
        say("AOT: tracing per-camera FORWARD (loss only)...")
        fn = jax.jit(
            lambda self, p, c_, g_, b_, rw_, kr, sk_: self._local_loss(
                p, c_, g_, b_, rw_, kr, sk_)[0],
            static_argnames=("self",),
        )
    args = (params, cams[0:1], gt[0:1], bg[0:1], rw, k_render, sk[0:1])
    t0 = time.time()
    lowered = fn.lower(trainer, *args)
    say(f"traced+lowered in {time.time() - t0:.1f} s; compiling (remote)...")
    t0 = time.time()
    compiled = lowered.compile()
    say(f"compiled in {time.time() - t0:.1f} s")
    try:
        mem = compiled.memory_analysis()
        say(f"memory analysis: {mem}")
    except Exception as e:  # noqa: BLE001
        say(f"(no memory analysis: {e})")
    t0 = time.time()
    out = compiled(*args)
    jax.block_until_ready(out)
    say(f"executed camera-0 program in {time.time() - t0:.1f} s")

    if os.environ.get("APPLY", "0") == "1":
        state = trainer.init_state(params)
        t0 = time.time()
        state, m = trainer.train_step_accum(
            state, cams, gt, key, jnp.asarray(0.0))
        say(f"full accum step 0 (compile+run): {time.time() - t0:.1f} s, "
            f"loss {float(m['loss']):.4f}")
        t0 = time.time()
        state, m = trainer.train_step_accum(
            state, cams, gt, jax.random.fold_in(key, 9), jnp.asarray(1.0))
        jax.block_until_ready(m["loss"])
        say(f"accum step 1: {time.time() - t0:.2f} s, "
            f"loss {float(m['loss']):.4f}")


if __name__ == "__main__":
    main()
