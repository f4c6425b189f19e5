"""Split the stage-1 step into render-grad vs field/geometry-backward.

Round-4 scan-structure experiment: grad of the 8-camera render w.r.t. the
SPLAT/ATTR arrays is ~1.9-2.1 s, while the full train step is ~4.2 s — this
measures the remainder: differentiating the same render THROUGH the field
(SharedField triplane + heads, chunked/checkpointed evals) + MGAdapter +
FlexiCubes back to the parameter dict, plus the full train_step at the
identical state for the total.

  PYTHONPATH=/root/.axon_site:/root/repo PAIRS_BUDGET=1400000 \
      python scripts/profile_field_chain.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp

from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat import GeoSplatter
from geosplatting_tpu.train.geosplat_trainer import (
    GeoSplatTrainer, GeoSplatTrainerConfig,
)

W = H = int(os.environ.get("RES_IMG", 800))
RES = int(os.environ.get("RES_GRID", 96))
BATCH = int(os.environ.get("BATCH", 8))
REPS = int(os.environ.get("REPS", 3))
BUDGET = int(os.environ.get("PAIRS_BUDGET", 1_400_000))


def timed(name, fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:<44s} {(time.time() - t0) / REPS * 1000:9.1f} ms", flush=True)


def main():
    model = GeoSplatter(resolution=RES, scale=0.8, pairs_budget=BUDGET)
    params = model.init(jax.random.key(1))
    grid = model.make_grid()
    params["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=BATCH, width=W, height=H,
    )
    key = jax.random.key(0)

    # full differentiable render through field+DMC, no loss/trainer
    def render_sum(p):
        rgba, reg, _ = model.render(
            p, cams, key, sampling="face",
            reg_weights={"sdf": 0.1, "occ": 0.0, "light": 0.1,
                         "kd_grad": 0.1, "ks_grad": 0.1},
        )
        return rgba.sum() + reg

    timed("full render fwd", jax.jit(render_sum), params)
    timed("full render fwd+bwd (through field+DMC)",
          jax.jit(jax.grad(render_sum)), params)

    # render WITHOUT jitter encodings (kd/ks perturb off)
    def render_sum_nojit(p):
        rgba, reg, _ = model.render(
            p, cams, key, sampling="face",
            kd_perturb_std=0.0, ks_perturb_std=0.0,
        )
        return rgba.sum() + reg

    timed("render fwd+bwd, no jitter encodings",
          jax.jit(jax.grad(render_sum_nojit)), params)

    # the real train step at the same state
    trainer = GeoSplatTrainer(GeoSplatTrainerConfig(batch_size=BATCH), model)
    state = trainer.init_state(params)
    gt = jnp.zeros((BATCH, H, W, 4))

    def step_fn(state):
        s2, m = trainer.train_step(
            state, cams, gt, jax.random.key(2),
            jnp.asarray(200.0), sampling="face",
        )
        return m["loss"], s2

    # train_step donates; time with a fresh copy each rep
    import copy

    jax.block_until_ready(step_fn(jax.tree.map(jnp.array, state)))
    t0 = time.time()
    for _ in range(REPS):
        out = step_fn(jax.tree.map(jnp.array, state))
    jax.block_until_ready(out)
    print(f"{'full train step (same state)':<44s} "
          f"{(time.time() - t0) / REPS * 1000:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
