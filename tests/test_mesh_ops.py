"""Mesh utility ops: Loop subdivision, TSDF depth fusion, AO bake."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.graphics.marching import marching_cubes
from geosplatting_tpu.graphics.mesh import TriangleMesh
from geosplatting_tpu.graphics.mesh_ops import (
    ambient_occlusion, subdivide, tsdf_fusion,
)


def _sphere_mesh(res=20, r=0.5):
    xs = jnp.linspace(-1, 1, res + 1)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    sdf = jnp.sqrt(gx**2 + gy**2 + gz**2) - r
    return marching_cubes(sdf, res, 1.0)


def _compact(mesh):
    mask = np.asarray(mesh.face_mask_or_ones()).astype(bool)
    return TriangleMesh(
        vertices=mesh.vertices, indices=mesh.indices[np.nonzero(mask)[0]]
    )


def _octahedron():
    v = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    )
    f = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
        np.int32,
    )
    return TriangleMesh(vertices=jnp.asarray(v), indices=jnp.asarray(f))


def _edge_face_counts(indices):
    e = indices[:, [1, 2, 2, 0, 0, 1]].reshape(-1, 2)
    e = np.stack((e.min(1), e.max(1)), -1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


def test_loop_subdivision_octahedron():
    mesh = _octahedron()
    sub = subdivide(mesh)
    assert sub.num_faces == 4 * mesh.num_faces
    # stays a closed manifold: every edge shared by exactly 2 faces
    assert (_edge_face_counts(np.asarray(sub.indices)) == 2).all()
    # inserted vertex on edge (x+, y+): 3/8 (a+b) + 1/8 (z+ + z-)
    verts = np.asarray(sub.vertices)
    target = np.array([0.375, 0.375, 0.0], np.float32)
    d = np.linalg.norm(verts - target, axis=-1)
    assert d.min() < 1e-6, d.min()
    # Loop smoothing pulls toward a round limit surface: radii tighten
    sub2 = subdivide(sub)
    used = np.unique(np.asarray(sub2.indices).reshape(-1))
    r = np.linalg.norm(np.asarray(sub2.vertices)[used], axis=-1)
    assert r.std() < np.linalg.norm(np.asarray(mesh.vertices), axis=-1).std() + 0.05
    assert 0.3 < r.mean() < 1.0
    assert (_edge_face_counts(np.asarray(sub2.indices)) == 2).all()


def test_tsdf_fusion_recovers_sphere():
    # render analytic depth maps of a sphere from an orbit, fuse, compare
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=20.0,
        num_samples=12, width=64, height=64,
    )
    origins, dirs = cams.generate_rays()
    b = jnp.sum(origins * dirs, -1)
    c = jnp.sum(origins * origins, -1) - 0.25
    disc = b * b - c
    hit = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    # z-depth along the camera forward axis (not ray length)
    fwd = -cams.c2w[:, :, 2]
    zdepth = t * jnp.sum(dirs * fwd[:, None, None, :], -1)
    depth = jnp.where(hit, zdepth, 0.0)
    dmap = jnp.stack((depth, hit.astype(jnp.float32)), -1)

    mesh = tsdf_fusion(dmap, cams, resolution=48, scale=0.8)
    mask = np.asarray(mesh.face_mask_or_ones()).astype(bool)
    used = np.unique(np.asarray(mesh.indices)[mask].reshape(-1))
    r = np.linalg.norm(np.asarray(mesh.vertices)[used], axis=-1)
    assert len(used) > 100
    assert abs(r.mean() - 0.5) < 0.05, r.mean()
    assert r.std() < 0.05


def test_ambient_occlusion_sphere_vs_crevice():
    # a lone sphere is unoccluded everywhere; two touching spheres shade the
    # crevice between them
    mesh = _compact(_sphere_mesh())
    ao = ambient_occlusion(mesh, jax.random.key(0), num_samples=16)
    assert float(jnp.median(ao)) > 0.7

    v = np.asarray(mesh.vertices)
    f = np.asarray(mesh.indices)
    off = np.array([0.0, 0.0, 1.0], np.float32)
    pair = TriangleMesh(
        vertices=jnp.asarray(np.concatenate([v - off / 2, v + off / 2])),
        indices=jnp.asarray(np.concatenate([f, f + v.shape[0]])),
    )
    ao2 = ambient_occlusion(pair, jax.random.key(0), num_samples=16, scale=1.5)
    centers = np.asarray(pair.face_vertices().mean(-2))
    # faces pointing into the gap between the spheres are occluded
    gap = np.abs(centers[:, 2]) < 0.35
    assert float(np.asarray(ao2)[gap].mean()) < float(np.asarray(ao2)[~gap].mean()) - 0.1
