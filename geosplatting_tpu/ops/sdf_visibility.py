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


def _pack_cells(grid3d: jnp.ndarray) -> jnp.ndarray:
    """[Z+1, Y+1, X+1] vertex grid -> [Z*Y*X, 8] per-cell corner rows.

    Trilinear sampling via one row-gather of a cell's 8 corners instead of
    eight independent 1-D gathers: on TPU, gather cost is per *index*
    (~5-9 ns each, see ops/rasterize_pairs.py header), so fetching a packed
    8-wide row is ~8x cheaper than eight scalar lookups. The table is built
    from 8 shifted views (pure slices, no gathers) and costs 8x the grid's
    memory — negligible next to the per-step gather volume it removes.
    Corner order: index = (dz*2 + dy)*2 + dx.
    """
    z1, y1, x1 = grid3d.shape
    z, y, x = z1 - 1, y1 - 1, x1 - 1
    cs = [
        grid3d[dz:dz + z, dy:dy + y, dx:dx + x]
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]
    return jnp.stack(cs, -1).reshape(z * y * x, 8)


def _trilerp_w8(frac: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] fractional coords -> [..., 8] trilinear corner weights
    (same corner order as ``_pack_cells``)."""
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1 - fx, fx], -1)
    wy = jnp.stack([1 - fy, fy], -1)
    wz = jnp.stack([1 - fz, fz], -1)
    w = wz[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :]
    return w.reshape(frac.shape[:-1] + (8,))


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
    rx, ry, rz = resolution
    res = jnp.asarray([rx, ry, rz], jnp.float32)
    res_hi = jnp.asarray([rx - 1, ry - 1, rz - 1])
    # one row-gather per trace step (the trace runs num_steps x per MC
    # sample x per gaussian — the gather count here dominates the whole
    # stage-2 forward at production scale)
    corners = _pack_cells(sdf.reshape(rz + 1, ry + 1, rx + 1))

    def sample_packed(p: jnp.ndarray) -> jnp.ndarray:
        g = (p / scale * 0.5 + 0.5) * res
        g0 = jnp.floor(g).astype(jnp.int32)
        frac = g - g0
        g0c = jnp.clip(g0, 0, res_hi)
        cell = (g0c[..., 2] * ry + g0c[..., 1]) * rx + g0c[..., 0]
        vals = jnp.sum(corners[cell] * _trilerp_w8(frac), -1)
        outside = jnp.maximum(jnp.abs(p) - scale, 0.0)
        d_box = jnp.sqrt(jnp.sum(outside * outside, -1) + 1e-12)
        return jnp.where(d_box > 0, vals + d_box, vals)

    def vis(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
        def body(carry, _):
            t, v = carry
            p = origins + dirs * t[..., None]
            d = sample_packed(p)
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
    # grid layout is [z, y, x] (see mesh_occupancy_grid flat id); edge-pad by
    # one cell so the packed-cell row-gather reproduces the clamp-to-edge
    # lookup of each corner, then one gather/step replaces eight
    occ_pad = jnp.pad(occ, 1, mode="edge")
    corners = _pack_cells(occ_pad)  # cells (r+1)^3

    def sample_occ(p: jnp.ndarray) -> jnp.ndarray:
        g = (p / scale * 0.5 + 0.5) * r - 0.5
        g0 = jnp.floor(g).astype(jnp.int32)
        frac = g - g0
        b = jnp.clip(g0, -1, r - 1) + 1  # padded-cell base, [0, r]
        cell = (b[..., 2] * (r + 1) + b[..., 1]) * (r + 1) + b[..., 0]
        out = jnp.sum(corners[cell] * _trilerp_w8(frac), -1)
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
