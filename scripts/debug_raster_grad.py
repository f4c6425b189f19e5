"""Localize the unaccounted time in the full rasterize fwd+bwd: time grads
w.r.t. argument subsets and count kernel launches in the lowered module.
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/debug_raster_grad.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from geosplatting_tpu.graphics import gmath
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.ops.rasterize import rasterize

N = int(os.environ.get("N", 1572864))
BUDGET = int(os.environ.get("PAIRS_BUDGET", 1800000))
W = H = 800


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(4):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:<44s} {(time.time() - t0) / 4 * 1000:8.1f} ms", flush=True)


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 5)
    means = (jax.random.uniform(ks[0], (N, 3)) - 0.5) * 1.6
    quats = gmath.safe_normalize(jax.random.normal(ks[1], (N, 4)))
    scales = jnp.exp(jax.random.uniform(ks[2], (N, 3), minval=-7.0, maxval=-5.0))
    ops = jax.random.uniform(ks[3], (N,), minval=0.5, maxval=0.99)
    colors = jax.random.uniform(ks[4], (N, 3))
    cam = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=1, width=W, height=H,
    )[0]
    vm, km = cam.view_matrix, cam.intrinsic_matrix

    def loss(m, q, s, o, c):
        img, a, _ = rasterize(
            m, q, s, o, c, vm, km, W, H, rasterize_mode="antialiased",
            tile_capacity=768, pairs_per_gaussian=3,
            max_pairs_override=BUDGET, backend="pairs",
        )
        return jnp.sum(img) + jnp.sum(a)

    timeit("fwd", jax.jit(loss), means, quats, scales, ops, colors)
    timeit("grad colors only", jax.jit(jax.grad(loss, argnums=(4,))),
           means, quats, scales, ops, colors)
    timeit("grad opacities only", jax.jit(jax.grad(loss, argnums=(3,))),
           means, quats, scales, ops, colors)
    timeit("grad means only", jax.jit(jax.grad(loss, argnums=(0,))),
           means, quats, scales, ops, colors)
    timeit("grad all", jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))),
           means, quats, scales, ops, colors)

    txt = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))).lower(
        means, quats, scales, ops, colors
    ).as_text()
    print("tpu_custom_call count:", txt.count("tpu_custom_call"))
    print("sort count:", txt.count("sort("), " gather count:", txt.count(" gather("))
    print("scatter count:", txt.count("scatter("))


if __name__ == "__main__":
    main()
