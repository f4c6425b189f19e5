"""Mesh shader library over the tile rasterizer.

Parity target: ``rfstudio/graphics/shaders.py`` — ``PBRShader`` (split-sum
GGX with FG LUT, :55-107), ``NormalShader`` :108, ``DepthShader`` :121,
``PureShader`` :156, ``FlatShader`` :166, ``PrettyShader`` :199 (daylight
studio look), ``WireframeShader`` :236, ``ShadowShader`` :178 (MC shadows),
``SSAOShader`` :135 — each a function from (mesh, camera, materials) to an
RGBA image, built on ops/mesh_raster + the split-sum env machinery."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import cubemap as cm
from ..ops.mesh_raster import RasterOut, interpolate, rasterize_mesh
from ..ops.sdf_visibility import make_sdf_visibility
from . import gmath
from .cameras import Cameras
from .mesh import TriangleMesh


def _raster(mesh: TriangleMesh, camera: Cameras, tile_capacity: int = 256):
    out = rasterize_mesh(mesh, camera, tile_capacity=tile_capacity)
    hit = out.tri_id >= 0
    vn = mesh.vertex_normals()
    normals = gmath.safe_normalize(interpolate(vn, mesh, out))
    pos = interpolate(mesh.vertices, mesh, out)
    return out, hit, normals, pos


def render_normal(mesh: TriangleMesh, camera: Cameras, **kw) -> jnp.ndarray:
    """NormalShader: world normals in [0, 1], alpha channel. [H, W, 4]."""
    out, hit, normals, _ = _raster(mesh, camera, **kw)
    rgb = jnp.where(hit[..., None], normals * 0.5 + 0.5, 0.0)
    return jnp.concatenate((rgb, hit[..., None].astype(jnp.float32)), -1)


def render_depth(mesh: TriangleMesh, camera: Cameras, **kw) -> jnp.ndarray:
    """DepthShader: camera-space z + alpha. [H, W, 2]."""
    out = rasterize_mesh(mesh, camera, **kw)
    hit = (out.tri_id >= 0).astype(jnp.float32)
    return jnp.stack((out.depth, hit), -1)


def render_flat(
    mesh: TriangleMesh, camera: Cameras, color=(0.8, 0.8, 0.8), **kw
) -> jnp.ndarray:
    """FlatShader: unlit constant color."""
    out = rasterize_mesh(mesh, camera, **kw)
    hit = (out.tri_id >= 0)[..., None].astype(jnp.float32)
    return jnp.concatenate((hit * jnp.asarray(color), hit), -1)


def render_pure(
    mesh: TriangleMesh, camera: Cameras, color=(0.8, 0.8, 0.8), **kw
) -> jnp.ndarray:
    """PureShader: N.V-shaded single color (headlight lambert)."""
    out, hit, normals, pos = _raster(mesh, camera, **kw)
    view = gmath.safe_normalize(camera.c2w[:3, 3] - pos)
    ndv = jnp.abs(jnp.sum(normals * view, -1, keepdims=True))
    rgb = jnp.where(hit[..., None], ndv * jnp.asarray(color), 0.0)
    return jnp.concatenate((rgb, hit[..., None].astype(jnp.float32)), -1)


def render_pretty(
    mesh: TriangleMesh, camera: Cameras, base_color=(0.85, 0.82, 0.78), **kw
) -> jnp.ndarray:
    """PrettyShader: daylight-studio look — a warm key light, cool fill, and
    hemisphere ambient (shaders.py:199 behavior class)."""
    out, hit, normals, pos = _raster(mesh, camera, **kw)
    key_dir = gmath.safe_normalize(jnp.array([0.5, 0.4, 0.8]))
    fill_dir = gmath.safe_normalize(jnp.array([-0.6, -0.2, 0.3]))
    key = jnp.maximum(jnp.sum(normals * key_dir, -1, keepdims=True), 0.0)
    fill = jnp.maximum(jnp.sum(normals * fill_dir, -1, keepdims=True), 0.0)
    ambient = 0.5 * (normals[..., 2:3] + 1.0)
    rgb = (
        key * jnp.array([1.0, 0.96, 0.9]) * 0.9
        + fill * jnp.array([0.55, 0.62, 0.75]) * 0.35
        + ambient * jnp.array([0.25, 0.27, 0.3])
    ) * jnp.asarray(base_color)
    rgb = jnp.where(hit[..., None], rgb, 0.0)
    return jnp.concatenate(
        (jnp.clip(rgb, 0, 1), hit[..., None].astype(jnp.float32)), -1
    )


def render_wireframe(
    mesh: TriangleMesh, camera: Cameras, thickness: float = 0.04, **kw
) -> jnp.ndarray:
    """WireframeShader: barycentric edge distance."""
    out = rasterize_mesh(mesh, camera, **kw)
    hit = out.tri_id >= 0
    u, v = out.bary[..., 0], out.bary[..., 1]
    w = 1.0 - u - v
    edge = jnp.minimum(jnp.minimum(u, v), w) < thickness
    rgb = jnp.where((hit & edge)[..., None], 0.05, jnp.where(hit[..., None], 0.9, 0.0))
    return jnp.concatenate(
        (jnp.repeat(rgb[..., :1], 3, -1), hit[..., None].astype(jnp.float32)), -1
    )


def render_pbr(
    mesh: TriangleMesh,
    camera: Cameras,
    *,
    kd: jnp.ndarray,          # [V, 3] vertex albedo
    ks: jnp.ndarray,          # [V, 2] vertex (roughness, metallic)
    env_base: jnp.ndarray,
    env_mips: list,
    min_roughness: float = 0.08,
    **kw,
) -> jnp.ndarray:
    """PBRShader (shaders.py:55-107): split-sum GGX with the FG LUT over
    interpolated vertex materials."""
    out, hit, normals, pos = _raster(mesh, camera, **kw)
    kd_px = interpolate(kd, mesh, out)
    ks_px = interpolate(ks, mesh, out)
    rough = jnp.clip(ks_px[..., 0:1], min_roughness, 1.0)
    metal = jnp.clip(ks_px[..., 1:2], 0.0, 1.0)
    wo = gmath.safe_normalize(camera.c2w[:3, 3] - pos)
    n_dot_v = jnp.clip(jnp.sum(normals * wo, -1, keepdims=True), 1e-6, None)
    fg = cm.sample_fg_lut(n_dot_v, rough)
    refl = 2 * jnp.sum(wo * normals, -1, keepdims=True) * normals - wo
    l_diff, l_spec = cm.sample_splitsum(env_base, env_mips, normals, refl, rough)
    spec_col = 0.04 * (1 - metal) + kd_px * metal
    rgb = l_diff * kd_px * (1 - metal) + l_spec * (
        spec_col * fg[..., 0:1] + fg[..., 1:2]
    )
    rgb = jnp.where(hit[..., None], rgb, 0.0)
    return jnp.concatenate((rgb, hit[..., None].astype(jnp.float32)), -1)


def render_shadow(
    mesh: TriangleMesh,
    camera: Cameras,
    *,
    sdf: jnp.ndarray,
    resolution: tuple[int, int, int],
    scale: float,
    light_dir=(0.5, 0.3, 0.8),
    **kw,
) -> jnp.ndarray:
    """ShadowShader analog: lambert + sphere-traced soft shadows against the
    SDF grid (the reference traces MC shadow rays, shaders.py:178)."""
    out, hit, normals, pos = _raster(mesh, camera, **kw)
    ld = gmath.safe_normalize(jnp.asarray(light_dir, jnp.float32))
    vis = make_sdf_visibility(sdf, resolution, scale)
    flat_pos = pos.reshape(-1, 3)
    v = vis(
        flat_pos + normals.reshape(-1, 3) * 1e-3,
        jnp.broadcast_to(ld, flat_pos.shape),
    ).reshape(pos.shape[:2] + (1,))
    lambert = jnp.maximum(jnp.sum(normals * ld, -1, keepdims=True), 0.0)
    rgb = (lambert * v * 0.85 + 0.15) * jnp.where(hit[..., None], 1.0, 0.0)
    return jnp.concatenate(
        (jnp.repeat(rgb, 3, -1), hit[..., None].astype(jnp.float32)), -1
    )


def render_ssao(
    mesh: TriangleMesh, camera: Cameras, *, key: jax.Array,
    num_samples: int = 16, radius: float = 0.1, **kw,
) -> jnp.ndarray:
    """SSAOShader analog: screen-space ambient occlusion from the depth
    buffer (hemisphere depth comparison)."""
    out, hit, normals, pos = _raster(mesh, camera, **kw)
    samples = gmath.sample_hemisphere_cosine(key, (num_samples,)) * radius
    t, b = gmath.build_tangent_frame(normals)
    occ = jnp.zeros(pos.shape[:2])
    vm = camera.view_matrix
    k = camera.intrinsic_matrix
    for i in range(num_samples):
        sp = (
            pos + t * samples[i, 0] + b * samples[i, 1] + normals * samples[i, 2]
        )
        p_cam = sp @ vm[:3, :3].T + vm[:3, 3]
        z = jnp.maximum(p_cam[..., 2], 1e-6)
        px = jnp.clip(
            (k[0, 0] * p_cam[..., 0] / z + k[0, 2]).astype(jnp.int32), 0,
            camera.width - 1,
        )
        py = jnp.clip(
            (k[1, 1] * p_cam[..., 1] / z + k[1, 2]).astype(jnp.int32), 0,
            camera.height - 1,
        )
        scene_z = out.depth[py, px]
        occluded = (scene_z > 0) & (scene_z < z - 1e-3)
        occ = occ + occluded.astype(jnp.float32)
    ao = 1.0 - occ / num_samples
    rgb = jnp.where(hit[..., None], ao[..., None], 0.0)
    return jnp.concatenate(
        (jnp.repeat(rgb, 3, -1), hit[..., None].astype(jnp.float32)), -1
    )
