#!/usr/bin/env python
"""GeoSplatterPrior at its defining scale: >= 1M Gaussians (VERDICT r4 #8).

The reference's prior variant exists for unbounded scenes with user meshes
(rfstudio/model/geosplat_prior.py:63, GOF-extracted meshes of millions of
Gaussians). This demo builds a dense UV-sphere prior mesh (rows x cols x 2
faces, 6 Gaussians/face), trains a few GeoSplatPriorTrainer steps at 800^2
through the production pair kernels with an explicit pairs budget, and
reports blocked per-step times + pair fill.

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/prior_scale_demo.py

Env knobs: PRIOR_ROWS/PRIOR_COLS (mesh density; default 300x280 ->
168k faces -> 1.008M Gaussians), PRIOR_RES (image, 800), PRIOR_BATCH (2),
PRIOR_STEPS (4), PRIOR_SPP_X (4), PRIOR_PAIRS (2500000), PRIOR_SHADOW
(0.95; 0 disables the visibility grid marching).
On the CPU backend it automatically drops to a tiny shape (smoke mode) so
the script itself stays testable without hardware.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def uv_sphere(rows: int, cols: int, radius: float = 0.5):
    """Dense UV-sphere TriangleMesh: 2*rows*cols faces."""
    from geosplatting_tpu.graphics.mesh import TriangleMesh

    th = jnp.linspace(1e-3, np.pi - 1e-3, rows + 1)
    ph = jnp.linspace(0.0, 2 * np.pi, cols, endpoint=False)
    T, P = jnp.meshgrid(th, ph, indexing="ij")
    v = jnp.stack(
        (jnp.sin(T) * jnp.cos(P), jnp.cos(T), jnp.sin(T) * jnp.sin(P)), -1
    ).reshape(-1, 3) * radius
    # face grid: quad (r, c) -> two triangles; wrap in the col direction
    r = jnp.arange(rows)[:, None]
    c = jnp.arange(cols)[None, :]
    c1 = (c + 1) % cols
    i00 = r * cols + c
    i01 = r * cols + c1
    i10 = (r + 1) * cols + c
    i11 = (r + 1) * cols + c1
    f = jnp.concatenate(
        (
            jnp.stack((i00, i10, i01), -1).reshape(-1, 3),
            jnp.stack((i01, i10, i11), -1).reshape(-1, 3),
        )
    ).astype(jnp.int32)
    return TriangleMesh(vertices=v, indices=f)


def gt_sphere_views(cams):
    from geosplatting_tpu.graphics import images as gimages

    origins, dirs = cams.generate_rays()
    r = 0.5
    b = jnp.sum(origins * dirs, -1)
    disc = b * b - (jnp.sum(origins * origins, -1) - r * r)
    hit = (disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0.0)) > 0)
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    n = (origins + t[..., None] * dirs) / r
    shade = jnp.clip(jnp.sum(n * jnp.array([0.577, 0.577, 0.577]), -1), 0.1, 1)
    rgb = jnp.where(hit[..., None], shade[..., None] * jnp.ones(3) * 0.8, 0.0)
    a = hit[..., None].astype(jnp.float32)
    return jnp.concatenate((gimages.rgb2srgb(rgb) * a, a), -1)


def main() -> None:
    from geosplatting_tpu.graphics.cameras import Cameras
    from geosplatting_tpu.models.geosplat_prior import GeoSplatterPrior
    from geosplatting_tpu.train.geosplat_prior_trainer import (
        GeoSplatPriorTrainer, GeoSplatPriorTrainerConfig,
    )

    on_cpu = jax.default_backend() == "cpu"
    rows = int(os.environ.get("PRIOR_ROWS", 6 if on_cpu else 300))
    cols = int(os.environ.get("PRIOR_COLS", 6 if on_cpu else 280))
    res = int(os.environ.get("PRIOR_RES", 24 if on_cpu else 800))
    batch = int(os.environ.get("PRIOR_BATCH", 1 if on_cpu else 2))
    steps = int(os.environ.get("PRIOR_STEPS", 1 if on_cpu else 4))
    spp_x = int(os.environ.get("PRIOR_SPP_X", 2 if on_cpu else 4))
    pairs = int(os.environ.get("PRIOR_PAIRS", 4096 if on_cpu else 2_500_000))
    shadow = float(os.environ.get("PRIOR_SHADOW", 0.0 if on_cpu else 0.95))

    mesh = uv_sphere(rows, cols)
    n_faces = mesh.num_faces
    n_gauss = n_faces * 6
    print(f"prior mesh: {rows}x{cols} -> {n_faces} faces -> "
          f"{n_gauss} gaussians; res={res} batch={batch} spp_x={spp_x} "
          f"pairs_budget={pairs} backend={jax.default_backend()}", flush=True)

    model = GeoSplatterPrior(
        scale=1.0, num_samples_x=spp_x, shadow_scale=shadow,
        visibility_resolution=32 if on_cpu else 64,
        tile_capacity=64 if on_cpu else 1024,
        pairs_budget=pairs, denoise=not on_cpu,
    )
    trainer = GeoSplatPriorTrainer(
        GeoSplatPriorTrainerConfig(batch_size=batch), model
    )
    params = model.init(mesh, jax.random.key(0))
    state = trainer.init_state(params)
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=20.0,
        num_samples=max(batch * 2, 4), width=res, height=res,
    )
    gt = gt_sphere_views(cams)

    times = []
    metrics = {}
    for i in range(steps):
        idx = jnp.arange(batch) + (i * batch) % cams.shape[0]
        idx = idx % cams.shape[0]
        t0 = time.time()
        # per-camera split dispatch: the FUSED step at 1M gaussians dies in
        # remote compile (round-5 BASELINE: response body closed mid-read)
        state, m = trainer.train_step_accum(
            state, mesh, cams[idx], gt[idx], jax.random.key(100 + i),
            jnp.asarray(float(i), jnp.float32),
        )
        jax.block_until_ready(m["loss"])
        dt = time.time() - t0
        times.append(dt)
        metrics = {k: float(v) for k, v in m.items()}
        print(f"step {i}: {dt:.3f}s loss={metrics['loss']:.4f} "
              f"ngauss={metrics['num_gaussians']:.0f} "
              f"pair_fill={metrics['pair_fill']:.3f} "
              f"nonfinite={metrics['nonfinite_grads']:.0f}", flush=True)
    steady = times[1:] or times
    out = {
        "metric": "prior_1m_s_per_step",
        "value": round(float(np.median(steady)), 3),
        "unit": "s/step",
        "num_gaussians": int(metrics.get("num_gaussians", n_gauss)),
        "pair_fill": round(metrics.get("pair_fill", 0.0), 3),
        "steps": [round(t, 3) for t in times],
        "shape": {"rows": rows, "cols": cols, "res": res, "batch": batch,
                  "spp_x": spp_x, "pairs_budget": pairs},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
