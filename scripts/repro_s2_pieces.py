"""Bisect the production stage-2 TPU worker crash (round 4).

RES_IMG=800 RES_GRID=96 BATCH=8 MC_SX=8 profile_stage2.py crashes the TPU
worker ("kernel fault") reproducibly. This drives each stage-2-unique piece
standalone at the same N to find the faulting op:
  1. bilateral_denoise on a [1, N, 3] per-gaussian row image
  2. env_shade (MIS + light bank) at N, spp_x, WITH sdf visibility
  3. env_shade without visibility
  4. the fwd+bwd of (2)

  PYTHONPATH=/root/.axon_site:/root/repo N=1572864 MC_SX=8 \
      python scripts/repro_s2_pieces.py
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

from geosplatting_tpu.graphics import gmath
from geosplatting_tpu.ops import envshade as es
from geosplatting_tpu.ops.denoise import bilateral_denoise
from geosplatting_tpu.ops.sdf_visibility import make_sdf_visibility

N = int(os.environ.get("N", 1_572_864))
SX = int(os.environ.get("MC_SX", 8))
GRID = int(os.environ.get("RES_GRID", 96))


def step(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"{name:<44s} ok  {time.time() - t0:8.1f}s", flush=True)
    return out


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    pos = jax.random.uniform(ks[0], (N, 3), minval=-0.6, maxval=0.6)
    nrm = gmath.safe_normalize(jax.random.normal(ks[1], (N, 3)))
    kd = jax.random.uniform(ks[2], (N, 3), minval=0.2, maxval=0.8)
    arm = jnp.concatenate([
        jnp.zeros((N, 1)),
        jax.random.uniform(ks[3], (N, 1), minval=0.1, maxval=0.9),
        jnp.zeros((N, 1)),
    ], -1)
    view = jnp.array([2.0, 1.0, 1.5])
    env = jnp.abs(jax.random.normal(ks[4], (256, 512, 3))) + 0.1
    light = es.compute_light_pdf(env)

    depth = jnp.sum((pos - view) * jnp.array([-0.7, -0.35, -0.52]), -1,
                    keepdims=True)
    step("bilateral_denoise [1, N, 3]",
         jax.jit(lambda d, n_, z: bilateral_denoise(
             d[None], n_[None], z[None], sigma=2.0)[0].sum()),
         kd, nrm, depth)

    sdf = jnp.linalg.norm(
        jax.random.uniform(ks[5], ((GRID + 1) ** 3, 3)) - 0.5, axis=-1
    ) - 0.3
    vis_fn = make_sdf_visibility(sdf, (GRID, GRID, GRID), 0.8, num_steps=24)

    def shade(k, with_vis):
        d, s, r = es.env_shade(
            k, pos, nrm, view, kd, arm, light,
            num_samples_x=SX,
            visibility_fn=vis_fn if with_vis else None,
            shadow_scale=1.0 if with_vis else 0.0,
        )
        return d.sum() + s.sum() + r.sum()

    step("env_shade no-vis fwd", jax.jit(lambda k: shade(k, False)), ks[6])
    step("env_shade with sdf-vis fwd", jax.jit(lambda k: shade(k, True)), ks[6])

    def loss(kd_, arm_, nrm_, k):
        d, s, r = es.env_shade(
            k, pos, gmath.safe_normalize(nrm_), view, kd_, arm_, light,
            num_samples_x=SX, visibility_fn=vis_fn, shadow_scale=1.0,
        )
        return d.sum() + s.sum() + r.sum()

    step("env_shade with vis fwd+bwd",
         jax.jit(jax.grad(loss, argnums=(0, 1, 2))), kd, arm, nrm, ks[7])
    print("all pieces survived", flush=True)


def trace_mode():
    """ENV TRACE=1: profile the no-vis env_shade fwd + fwd+bwd with xprof."""
    import shutil

    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    pos = jax.random.uniform(ks[0], (N, 3), minval=-0.6, maxval=0.6)
    nrm = gmath.safe_normalize(jax.random.normal(ks[1], (N, 3)))
    kd = jax.random.uniform(ks[2], (N, 3), minval=0.2, maxval=0.8)
    arm = jnp.concatenate([
        jnp.zeros((N, 1)),
        jax.random.uniform(ks[3], (N, 1), minval=0.1, maxval=0.9),
        jnp.zeros((N, 1)),
    ], -1)
    view = jnp.array([2.0, 1.0, 1.5])
    env = jnp.abs(jax.random.normal(ks[4], (256, 512, 3))) + 0.1
    light = es.compute_light_pdf(env)

    fn = jax.jit(lambda k: sum(
        x.sum() for x in es.env_shade(
            k, pos, nrm, view, kd, arm, light, num_samples_x=SX,
        )
    ))
    jax.block_until_ready(fn(ks[6]))
    t0 = time.time()
    jax.block_until_ready(fn(ks[7]))
    print(f"steady fwd: {time.time() - t0:.1f}s", flush=True)
    tdir = "/tmp/envshade_trace"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        jax.block_until_ready(fn(ks[6]))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _xprof_util import print_top_ops

    print_top_ops(tdir, top=25)


if os.environ.get("TRACE") == "1":
    main_fn = trace_mode
else:
    main_fn = main


if __name__ == "__main__":
    main_fn()
