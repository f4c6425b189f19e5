"""Isolate the camera-scan composition overhead of the stage-1 step.

Round-4 pieces accounting: 8 x (rasterize fwd+bwd 223 ms + shading 14 ms)
+ loss + optimizer adds to ~2.0 s, but the full train step measures 4.24 s
— the difference lives in how the per-camera renders are COMPOSED
(jax.lax.map + checkpointed shading inside one jit). This times the same
forward+backward under three compositions:

  separate : 8 independent jit dispatches of the 1-camera grad
  scan     : jax.lax.map over the camera axis (the model's structure)
  unroll   : python-for inside one jit (no scan machinery, 8x code)

  PYTHONPATH=/root/.axon_site:/root/repo PAIRS_BUDGET=1400000 \
      python scripts/profile_scan_structure.py
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
from geosplatting_tpu.models.geosplat import (
    GeoSplatter, get_gaussians_from_face, shade_splitsum,
)
from geosplatting_tpu.ops import cubemap as cm

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
    print(f"{name:<40s} {(time.time() - t0) / REPS * 1000:9.1f} ms", flush=True)


def main():
    model = GeoSplatter(resolution=RES, scale=0.8, pairs_budget=BUDGET)
    params = model.init(jax.random.key(1))
    grid = model.make_grid()
    params["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=BATCH, width=W, height=H,
    )

    mesh, _, _ = jax.jit(lambda p: model.get_geometry(p))(params)
    splats, attrs, _, valid = jax.jit(lambda p: get_gaussians_from_face(
        model.field, p["field"], mesh, scale=model.scale,
        initial_guess=model.initial_guess_bias(),
        max_faces=model.max_render_faces,
        eval_chunk=model.field_eval_chunk,
    ))(params)
    attrs = attrs._replace(kd_jitter=None, ks_jitter=None)
    base, mips = jax.jit(lambda c: cm.prefilter_splitsum(
        c, num_samples=model.env_num_samples, method=model.prefilter_method
    ))(params["cubemap"])
    expo = jnp.asarray(1.0)
    print(f"live gaussians {int(valid.sum())}, budget {BUDGET}", flush=True)

    def render_cam(sp, at, b, ms, cam):
        rgba, _ = shade_splitsum(
            sp, at, cam, exposure=expo, env_base=b, env_mips=ms,
            min_roughness=model.min_roughness,
            max_metallic=model.max_metallic,
            tile_capacity=model.tile_capacity,
            pairs_per_gaussian=model.pairs_per_gaussian,
            pairs_budget=BUDGET, chunk_size=model.chunk_size,
            tile_chunk=model.tile_chunk, backend="pairs",
            env_quality=model.env_quality, checkpoint_shading=True,
        )
        return rgba

    g_sep = jax.jit(jax.grad(
        lambda sp, at, b, ms, cam: render_cam(sp, at, b, ms, cam).sum(),
        argnums=(0, 1),
    ))

    def eight_separate(sp, at, b, ms):
        outs = []
        for i in range(BATCH):
            outs.append(g_sep(sp, at, b, ms, cams[i]))
        return outs

    timed("separate (8 jit dispatches)", eight_separate, splats, attrs, base, mips)

    g_scan = jax.jit(jax.grad(
        lambda sp, at, b, ms: jax.lax.map(
            lambda cam: render_cam(sp, at, b, ms, cam), cams
        ).sum(),
        argnums=(0, 1),
    ))
    timed("lax.map scan (model structure)", g_scan, splats, attrs, base, mips)

    g_unroll = jax.jit(jax.grad(
        lambda sp, at, b, ms: sum(
            render_cam(sp, at, b, ms, cams[i]).sum() for i in range(BATCH)
        ),
        argnums=(0, 1),
    ))
    timed("unrolled python-for (one jit)", g_unroll, splats, attrs, base, mips)


if __name__ == "__main__":
    main()
