"""Classic mesh utility operations: Loop subdivision, TSDF depth fusion and
ambient-occlusion baking.

Parity: ``rfstudio/graphics/_mesh/_triangle_mesh.py`` — ``subdivide``
(:680-744, Loop subdivision with the 7/16|5/8 even-vertex weights and
3/8-1/8 wing weights), ``from_depth_fusion`` (:322, open3d ScalableTSDF ->
here a dense jnp TSDF + marching cubes), ``compute_ambient_occlusion``
(:617-679, depth-peeled rasterized visibility -> here occupancy-grid
transmittance marching, the repo's BVH-free shadow machinery).

Poisson reconstruction lives in ``graphics.dpsr.psr_to_mesh`` (the
differentiable analog of ``from_poisson_reconstruction``, :289-321).
Subdivision runs host-side in numpy (edge dedup is data-dependent — these
are preprocessing ops, same as the reference's open3d path)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cameras import Cameras
from .marching import marching_cubes
from .mesh import TriangleMesh


def subdivide(mesh: TriangleMesh) -> TriangleMesh:
    """One Loop-subdivision step: F -> 4F faces (_triangle_mesh.py:680-744)."""
    v = np.asarray(mesh.vertices)
    f = np.asarray(mesh.indices)
    nv, nf = v.shape[0], f.shape[0]

    # even (existing) vertices: w*v + (1-w)*mean(neighbors)
    edges = f[:, [1, 2, 2, 0, 0, 1]].reshape(nf * 3, 2)
    sum_nb = np.zeros_like(v)
    np.add.at(sum_nb, edges[:, 0], v[edges[:, 1]])
    cnt_nb = np.zeros((nv, 1))
    np.add.at(cnt_nb, f.reshape(-1), 1.0)
    cnt_nb = np.maximum(cnt_nb, 1.0)
    w = np.where(cnt_nb == 3, 7 / 16, 5 / 8)
    updated = w * v + (1 - w) * (sum_nb / cnt_nb)

    # odd (inserted) vertices: 3/8 (a+b) + 1/8 (c1+c2) per unique edge
    edge_code = np.stack((edges.min(1), edges.max(1)), axis=-1)
    unique_edges, inverse = np.unique(edge_code, axis=0, return_inverse=True)
    ne = unique_edges.shape[0]
    tri = v[f.reshape(-1)].reshape(nf, 3, 3)
    wing = 3.0 * tri.sum(-2, keepdims=True) - tri        # [F, 3, 3]
    inserted = np.zeros((ne, 3))
    np.add.at(inserted, inverse, wing.reshape(nf * 3, 3) / 16.0)
    boundary = np.zeros(ne)
    np.add.at(boundary, inverse, 1.0)
    # non-manifold/boundary edges (1 adjacent face): plain midpoint
    mid = (v[unique_edges[:, 0]] + v[unique_edges[:, 1]]) / 2.0
    inserted = np.where((boundary == 2)[:, None], inserted, mid)

    expanded = np.concatenate((f, inverse.reshape(nf, 3) + nv), axis=-1)
    new_f = expanded[:, [0, 5, 4, 4, 3, 2, 3, 4, 5, 5, 1, 3]].reshape(nf * 4, 3)
    return TriangleMesh(
        vertices=jnp.asarray(
            np.concatenate((updated, inserted)), jnp.float32
        ),
        indices=jnp.asarray(new_f, jnp.int32),
    )


def tsdf_fusion(
    depths: jnp.ndarray,        # [N, H, W] or [N, H, W, 2] (depth, alpha)
    cameras: Cameras,           # [N]
    *,
    resolution: int = 128,
    scale: float = 1.0,
    sdf_trunc: float | None = None,
    depth_trunc: float = 1e6,
    alpha_trunc: float = 0.5,
) -> TriangleMesh:
    """TSDF-fuse depth maps into a mesh (from_depth_fusion, :322-380):
    project every voxel into each camera, accumulate the truncated signed
    distance (sampled depth - voxel depth) weighted by view validity, and
    extract the zero level set with marching cubes."""
    depths = jnp.asarray(depths)
    if depths.ndim == 3:
        depths = jnp.concatenate(
            (depths[..., None], jnp.ones_like(depths[..., None])), -1
        )
    n, h, w_img = depths.shape[:3]
    trunc = sdf_trunc if sdf_trunc is not None else 4.0 * scale / resolution

    r = resolution
    xs = (jnp.arange(r + 1) / r * 2.0 - 1.0) * scale
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.stack((gx, gy, gz), -1).reshape(-1, 3)      # [V, 3]

    def one_view(carry, args):
        tsdf, weight = carry
        viewmat, fx, fy, cx, cy, dmap = args
        p_cam = pts @ viewmat[:3, :3].T + viewmat[:3, 3]
        z = p_cam[:, 2]
        px = fx * p_cam[:, 0] / jnp.maximum(z, 1e-6) + cx
        py = fy * p_cam[:, 1] / jnp.maximum(z, 1e-6) + cy
        ix = jnp.clip(px.astype(jnp.int32), 0, w_img - 1)
        iy = jnp.clip(py.astype(jnp.int32), 0, h - 1)
        samp = dmap[iy, ix]                               # [V, 2]
        d_s, a_s = samp[:, 0], samp[:, 1]
        valid = (
            (z > 1e-4) & (px >= 0) & (px < w_img) & (py >= 0) & (py < h)
            & (a_s > alpha_trunc) & (d_s > 0) & (d_s < depth_trunc)
        )
        sdf = jnp.clip(d_s - z, -trunc, trunc) / trunc
        # only integrate near the surface and in front of it
        upd = valid & (d_s - z > -trunc)
        wgt = upd.astype(jnp.float32)
        return (tsdf + sdf * wgt, weight + wgt), None

    view_args = (
        cameras.view_matrix, cameras.fx, cameras.fy, cameras.cx, cameras.cy,
        depths,
    )
    (tsdf, weight), _ = jax.lax.scan(
        one_view, (jnp.zeros(pts.shape[0]), jnp.zeros(pts.shape[0])), view_args
    )
    # fused value = mean(d_sampled - z_voxel): positive in front of the
    # surface, negative behind — already the sdf<0-inside marching
    # convention. Unobserved voxels count as outside (+1).
    sdf_grid = jnp.where(weight > 0, tsdf / jnp.maximum(weight, 1e-6), 1.0)
    sdf_grid = sdf_grid.reshape(r + 1, r + 1, r + 1)
    return marching_cubes(sdf_grid, r, scale)


def ambient_occlusion(
    mesh: TriangleMesh,
    key: jax.Array,
    *,
    num_samples: int = 64,
    resolution: int = 96,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Per-face ambient occlusion in [0, 1] (1 = fully open) — the
    compute_ambient_occlusion analog (:617-679) via cosine-hemisphere rays
    through the occupancy-grid transmittance marcher (no BVH)."""
    from ..graphics import gmath
    from ..ops.sdf_visibility import make_mesh_visibility

    k_vox, k_dirs = jax.random.split(key)
    vis = make_mesh_visibility(mesh, k_vox, resolution=resolution, scale=scale)
    normals, areas = mesh.face_normals_and_areas()
    fv = mesh.face_vertices()
    centers = fv.mean(-2)
    eps = 2.0 * scale / resolution
    origins = centers + normals * eps

    t, bt = gmath.build_tangent_frame(normals)

    def one_sample(acc, k):
        local = gmath.sample_hemisphere_cosine(k, (centers.shape[0],))
        dirs = (
            local[:, 0:1] * t + local[:, 1:2] * bt + local[:, 2:3] * normals
        )
        return acc + vis(origins, dirs), None

    acc, _ = jax.lax.scan(
        one_sample, jnp.zeros(centers.shape[0]),
        jax.random.split(k_dirs, num_samples),
    )
    return acc / num_samples
