"""Micro-benchmark of the pair-centric rasterizer at production scale.

Times bin_pairs and composite fwd / fwd+bwd separately, sweeping the chunk
size (the Pallas grid is one step per chunk, so kc trades per-step overhead
against VMEM window size). Run on TPU:

  PYTHONPATH=/root/.axon_site:/root/repo KC_SWEEP=128,256,512,1024 \
      python scripts/profile_pair_kernels.py

Knobs: N (1572864), RES (800), PAIRS_BUDGET (1800000), REPS (5).

Kernel-variant knobs (read by ops/rasterize_pairs.py at import):
  GEOS_SCAN_IMPL=roll|matmul   in-chunk prefix scan: VPU roll ladder vs one
                               [KC, KC] MXU triangular matmul
  GEOS_SCAN_PREC=highest|default    matmul-scan precision
  GEOS_MOMENT_PREC=highest|default  backward moment-matmul precision
  ('high' is rejected: Mosaic's dot lowering has no Precision.HIGH path)
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
from geosplatting_tpu.ops.projection import project
from geosplatting_tpu.ops.rasterize_pairs import (
    bin_pairs, composite_pairs_pallas, pick_chunk_size,
)

N = int(os.environ.get("N", 1 << 20 | 1 << 19))          # 1572864
W = H = int(os.environ.get("RES", 800))
BUDGET = int(os.environ.get("PAIRS_BUDGET", 1_800_000))
REPS = int(os.environ.get("REPS", 5))
# square int ("16") or rect "WxH" ("16x8") — pairs-backend rect-tile A/B
_t = os.environ.get("TILE", "16")
TILE = tuple(int(v) for v in _t.split("x")) if "x" in _t else int(_t)


def timed(name, fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:<46s} {(time.time() - t0) / REPS * 1000:9.2f} ms", flush=True)
    return out


def main():
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # a production-like cloud: small anisotropic gaussians in the unit box
    means = jax.random.uniform(k1, (N, 3), minval=-0.8, maxval=0.8)
    quats = jax.random.normal(k2, (N, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    scales = jnp.exp(jax.random.uniform(k3, (N, 3), minval=-7.5, maxval=-5.5))
    opac = jax.nn.sigmoid(jax.random.normal(k4, (N,)) + 1.0)
    colors = jnp.abs(jax.random.normal(k1, (N, 3)))
    cam = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=1, width=W, height=H,
    )[0]

    proj = jax.jit(
        lambda m, q, s, o: project(
            m, q, s, o, cam.view_matrix, cam.intrinsic_matrix, W, H,
            rasterize_mode="antialiased",
        )
    )(means, quats, scales, opac)
    jax.block_until_ready(proj)
    from geosplatting_tpu.ops.rasterize_pairs import tile_wh
    tsx, tsy = tile_wh(TILE)
    tw, th = -(-W // tsx), -(-H // tsy)
    total = int(jnp.sum(jnp.where(proj.radii > 0, 1, 0)))
    from geosplatting_tpu.ops import rasterize_pairs as rp
    print(
        f"N={N} visible={total} budget={BUDGET} "
        f"scan={rp._SCAN_IMPL}/{rp._SCAN_PREC} moment={rp._MOMENT_PREC}",
        flush=True,
    )

    for kc0 in [int(x) for x in os.environ.get(
            "KC_SWEEP", "128,256,512,1024").split(",")]:
        kc = pick_chunk_size(BUDGET, tw * th, kc0)
        bp = jax.jit(
            lambda p: bin_pairs(
                p, W, H, tile_size=TILE, max_pairs=BUDGET, chunk_size=kc,
            )
        )
        bins = timed(f"bin_pairs kc={kc}", bp, proj)
        print(f"  total_pairs={int(bins.total_pairs)}", flush=True)

        def fwd(b, p, c):
            r, a, d = composite_pairs_pallas(
                b, TILE, kc, (tw, th), p.means2d, p.conics, p.opacities, c,
                p.depths,
            )
            return r.sum() + a.sum() + d.sum()

        timed(f"composite fwd kc={kc}", jax.jit(fwd), bins, proj, colors)

        def fwdbwd(b, p, c):
            return jax.grad(
                lambda m2, con, op, col: (
                    lambda r: r
                )(fwd(b, p._replace(means2d=m2, conics=con, opacities=op), col)),
                argnums=(0, 1, 2, 3),
            )(p.means2d, p.conics, p.opacities, c)

        grads = timed(
            f"composite fwd+bwd kc={kc}", jax.jit(fwdbwd), bins, proj, colors
        )
        # numerics fingerprint for cross-variant A/B (knobs are read at
        # import, so each variant is its own process): grad norms + optional
        # exact dump for offline comparison via GRAD_DUMP=<path>.npz
        names = ("means2d", "conics", "opacities", "colors")
        print("  grad_norms " + " ".join(
            f"{nm}={float(jnp.linalg.norm(g)):.6e}"
            for nm, g in zip(names, grads)
        ), flush=True)
        if os.environ.get("GRAD_DUMP"):
            import numpy as np
            # suffix the kc so multi-point KC_SWEEP runs don't overwrite
            base = os.environ["GRAD_DUMP"]
            if base.endswith(".npz"):
                base = base[:-4]
            np.savez(f"{base}_kc{kc}.npz",
                     **{nm: np.asarray(g) for nm, g in zip(names, grads)})


if __name__ == "__main__":
    main()
