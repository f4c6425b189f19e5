"""Decompose stage-1-style train-step time: project / bin / composite fwd / bwd.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_raster.py
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

from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.graphics.splats import Splats
from geosplatting_tpu.graphics import gmath
from geosplatting_tpu.ops.projection import project
from geosplatting_tpu.ops.rasterize import bin_gaussians, rasterize

N = int(os.environ.get("N", 50_000))
W = H = 800
TILE = 16
CAP = int(os.environ.get("CAP", 768))
PAIRS = int(os.environ.get("PAIRS", 6))
BACKEND = os.environ.get("BACKEND", "pallas")


def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:38s} {dt:9.2f} ms")
    return out


def main():
    key = jax.random.key(0)
    splats = Splats.random(key, N, sh_degree=0, random_scale=0.8)
    splats = splats.replace(opacities=jnp.full_like(splats.opacities, 1.0))
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.5, elevation_degrees=15.0,
        num_samples=1, width=W, height=H,
    )
    cam = jax.tree.map(lambda x: x[0], cams)
    means = splats.means
    quats = gmath.safe_normalize(splats.quats)
    scales = jnp.exp(splats.scales)
    ops = jax.nn.sigmoid(splats.opacities[:, 0])
    colors = splats.colors
    viewmat, K = cam.view_matrix, cam.intrinsic_matrix

    pj = jax.jit(lambda: project(means, quats, scales, ops, viewmat, K, W, H))
    proj = timeit("project", pj)

    max_pairs = max(PAIRS * N, 1 << 12)
    if "PAIRS_BUDGET" in os.environ:
        max_pairs = min(max_pairs, int(os.environ["PAIRS_BUDGET"]))
    bn = jax.jit(lambda p: bin_gaussians(
        p, W, H, tile_size=TILE, max_pairs=max_pairs, tile_capacity=CAP))
    bins = timeit("bin (expand+sort+gather)", bn, proj)
    total = int(bins.total_pairs)
    occ = (bins.tile_gid >= 0).sum(axis=1)
    import numpy as np
    occ = np.asarray(occ)
    print(f"  pairs: {total} / budget {max_pairs}; tile occupancy "
          f"mean {occ.mean():.0f} p50 {np.percentile(occ, 50):.0f} "
          f"p90 {np.percentile(occ, 90):.0f} max {occ.max()} cap {CAP}")

    if BACKEND == "pairs":
        from geosplatting_tpu.ops.rasterize_pairs import (
            bin_pairs, composite_pairs_pallas,
        )
        kc = int(os.environ.get("KC", 128))
        bp = jax.jit(lambda p: bin_pairs(
            p, W, H, tile_size=TILE, max_pairs=max_pairs, chunk_size=kc))
        pbins = timeit("bin_pairs", bp, proj)
        tw_ = -(-W // TILE)
        th_ = -(-H // TILE)
        comp = jax.jit(lambda b, p, c: composite_pairs_pallas(
            b, TILE, kc, (tw_, th_), p.means2d, p.conics, p.opacities, c,
            p.depths))
        timeit("composite_pairs fwd (pack+kernel)", comp, pbins, proj, colors)

        def comp_loss(m2d, con, op, c, d):
            o = composite_pairs_pallas(
                pbins, TILE, kc, (tw_, th_), m2d, con, op, c, d)
            return sum(jnp.sum(x) for x in o)
        gcomp = jax.jit(jax.grad(comp_loss, argnums=(0, 1, 2, 3, 4)))
        timeit("composite_pairs fwd+bwd", gcomp, proj.means2d, proj.conics,
               proj.opacities, colors, proj.depths)

    def fwd():
        img, a, _ = rasterize(
            means, quats, scales, ops, colors, viewmat, K, W, H,
            tile_size=TILE, tile_capacity=CAP, pairs_per_gaussian=PAIRS,
            backend=BACKEND)
        return img, a

    timeit("rasterize fwd", jax.jit(fwd))

    def fwd_loss(m, c, o):
        img, a, _ = rasterize(
            m, quats, scales, o, c, viewmat, K, W, H,
            tile_size=TILE, tile_capacity=CAP, pairs_per_gaussian=PAIRS,
            backend=BACKEND)
        return jnp.sum(img) + jnp.sum(a)

    g = jax.jit(jax.grad(fwd_loss, argnums=(0, 1, 2)))
    timeit("rasterize fwd+bwd (sum loss)", g, means, colors, ops)


if __name__ == "__main__":
    main()
