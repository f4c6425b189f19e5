"""Soft shadow visibility by sphere-tracing the FlexiCubes SDF grid.

The TPU-native replacement for the reference's OptiX shadow rays
(``_optix/c_src/envsampling/kernel.cu`` ``shadow_test``/``__raygen__rg``):
instead of a triangle BVH we already *have* a signed distance field on a
regular grid — trilinearly-interpolated fixed-step sphere tracing gives a
(soft) visibility factor with pure gather + FMA work, no ray-tracing
hardware and no data-dependent control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_sdf_grid(
    sdf: jnp.ndarray,            # [V] flat grid values
    resolution: tuple[int, int, int],
    scale: float,
    points: jnp.ndarray,         # [..., 3] world positions
) -> jnp.ndarray:
    """Trilinear SDF lookup; outside the grid returns a positive distance."""
    rx, ry, rz = resolution
    res = jnp.asarray([rx, ry, rz], jnp.float32)
    # world [-scale, scale] -> grid coords [0, R]
    g = (points / scale * 0.5 + 0.5) * res
    g0 = jnp.floor(g).astype(jnp.int32)
    frac = g - g0
    g0c = jnp.clip(g0, 0, jnp.asarray([rx - 1, ry - 1, rz - 1]))

    def vid(x, y, z):
        return (z * (ry + 1) + y) * (rx + 1) + x

    x0, y0, z0 = g0c[..., 0], g0c[..., 1], g0c[..., 2]
    vals = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (frac[..., 0] if dx else 1 - frac[..., 0])
                    * (frac[..., 1] if dy else 1 - frac[..., 1])
                    * (frac[..., 2] if dz else 1 - frac[..., 2])
                )
                vals = vals + w * sdf[vid(x0 + dx, y0 + dy, z0 + dz)]
    # outside the box: use distance to the box as a lower bound
    lo = -scale
    hi = scale
    outside = jnp.maximum(jnp.abs(points) - hi, 0.0)
    d_box = jnp.sqrt(jnp.sum(outside * outside, -1) + 1e-12)
    return jnp.where(d_box > 0, vals + d_box, vals)


def make_sdf_visibility(
    sdf: jnp.ndarray,
    resolution: tuple[int, int, int],
    scale: float,
    *,
    num_steps: int = 24,
    softness: float = 8.0,
    t_start: float = 0.02,
):
    """Returns ``vis(origins [M,3], dirs [M,3]) -> [M]`` soft visibility in
    [0, 1] (1 = unoccluded), sphere-traced with a fixed step count."""
    t_max = 4.0 * scale
    sdf = jax.lax.stop_gradient(sdf)

    def vis(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
        def body(carry, _):
            t, v = carry
            p = origins + dirs * t[..., None]
            d = sample_sdf_grid(sdf, resolution, scale, p)
            v = jnp.minimum(v, jnp.clip(softness * d / jnp.maximum(t, 1e-4), 0.0, 1.0))
            t = jnp.minimum(t + jnp.maximum(d, scale / num_steps * 0.5), t_max)
            return (t, v), None

        t0 = jnp.full(origins.shape[:-1], t_start)
        v0 = jnp.ones(origins.shape[:-1])
        (t, v), _ = jax.lax.scan(body, (t0, v0), None, length=num_steps)
        return jnp.clip(v, 0.0, 1.0)

    return vis


def mesh_occupancy_grid(
    mesh,
    key: jax.Array,
    *,
    resolution: int = 64,
    scale: float = 1.0,
    num_samples: int = 1 << 17,
) -> jnp.ndarray:
    """Voxelize a (masked) triangle mesh into a soft occupancy grid [R, R, R]
    by area-weighted surface sampling + nearest-cell deposit + 3^3 dilation.
    The BVH-free analog of the reference's per-step ``optix_build_bvh``
    (``_optix/ops.py:129``) for meshes with no SDF (the prior variant,
    ``geosplat_prior.py:63``)."""
    r = resolution
    pts, _ = mesh.sample_surface(key, num_samples)
    g = jnp.clip((pts / scale * 0.5 + 0.5) * r, 0, r - 1).astype(jnp.int32)
    flat = (g[:, 2] * r + g[:, 1]) * r + g[:, 0]
    occ = jnp.zeros((r * r * r,), jnp.float32).at[flat].add(1.0)
    occ = jnp.clip(occ, 0.0, 1.0).reshape(r, r, r)
    # 3^3 max-pool dilation closes sampling gaps on thin/sparse surfaces
    occ = jax.lax.reduce_window(
        occ, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
    )
    return occ


def make_mesh_visibility(
    mesh,
    key: jax.Array,
    *,
    resolution: int = 64,
    scale: float = 1.0,
    num_steps: int = 32,
    density: float = 24.0,
    t_start: float = 0.05,
):
    """Returns ``vis(origins [M,3], dirs [M,3]) -> [M]`` soft visibility by
    fixed-step transmittance marching through the mesh occupancy grid —
    shadow rays without a BVH (kernel.cu shadow_test replacement for
    mesh-only scenes)."""
    occ = jax.lax.stop_gradient(
        mesh_occupancy_grid(mesh, key, resolution=resolution, scale=scale)
    )
    r = resolution
    t_max = 3.0 * scale
    dt = (t_max - t_start) / num_steps

    def sample_occ(p: jnp.ndarray) -> jnp.ndarray:
        g = (p / scale * 0.5 + 0.5) * r - 0.5
        g0 = jnp.floor(g).astype(jnp.int32)
        frac = g - g0
        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    idx = jnp.clip(g0 + jnp.asarray([dx, dy, dz]), 0, r - 1)
                    w = (
                        (frac[..., 0] if dx else 1 - frac[..., 0])
                        * (frac[..., 1] if dy else 1 - frac[..., 1])
                        * (frac[..., 2] if dz else 1 - frac[..., 2])
                    )
                    # grid layout is [z, y, x] (see mesh_occupancy_grid flat id)
                    out = out + w * occ[idx[..., 2], idx[..., 1], idx[..., 0]]
        inside = jnp.all(jnp.abs(p) < scale, axis=-1)
        return jnp.where(inside, out, 0.0)

    def vis(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
        def body(carry, i):
            tau = carry
            p = origins + dirs * (t_start + dt * (i + 0.5))
            tau = tau + sample_occ(p)
            return tau, None

        tau, _ = jax.lax.scan(
            body, jnp.zeros(origins.shape[:-1]),
            jnp.arange(num_steps, dtype=jnp.float32),
        )
        return jnp.exp(-density * dt * tau)

    return vis
