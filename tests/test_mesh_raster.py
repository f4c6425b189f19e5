"""Mesh rasterizer golden tests: hit coverage vs analytic ray-sphere,
barycentric interpolation exactness, depth correctness, gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import flexicubes as fc
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.graphics.mesh import TriangleMesh
from geosplatting_tpu.ops.mesh_raster import interpolate, rasterize_mesh

W = H = 64


def camera():
    return Cameras.from_lookat(
        jnp.array([0.0, 2.2, 0.0]), jnp.zeros(3), up=jnp.array([0.0, 0.0, 1.0]),
        width=W, height=H, fov_degrees=45.0,
    )


def sphere_mesh(res=20, radius=0.5):
    grid = fc.make_grid(res, scale=1.0)
    v = grid.base_vertices()
    out = fc.extract(grid, jnp.linalg.norm(v, axis=-1) - radius)
    return out.mesh


def test_single_triangle_bary_exact():
    # triangle in the z=0 plane seen from +y axis camera
    mesh = TriangleMesh(
        vertices=jnp.array([[-0.5, 0.0, -0.5], [0.5, 0.0, -0.5], [0.0, 0.0, 0.5]]),
        indices=jnp.array([[0, 1, 2]], jnp.int32),
    )
    out = rasterize_mesh(mesh, camera(), tile_capacity=16)
    hit = np.asarray(out.tri_id) >= 0
    assert hit.sum() > 50
    # interpolated positions must satisfy the plane equation y=0 and match
    # the analytic ray-plane intersection
    pos = interpolate(mesh.vertices, mesh, out)
    np.testing.assert_allclose(np.asarray(pos[..., 1])[hit], 0.0, atol=1e-4)
    # barycentric coordinates sum to one within the triangle
    u, v = np.asarray(out.bary[..., 0]), np.asarray(out.bary[..., 1])
    assert ((u[hit] >= -1e-4) & (v[hit] >= -1e-4) & (u[hit] + v[hit] <= 1 + 1e-4)).all()
    # depth equals camera-space distance (camera on +y looking down -y)
    np.testing.assert_allclose(np.asarray(out.depth)[hit], 2.2, atol=1e-3)


def test_sphere_silhouette_matches_analytic():
    mesh = sphere_mesh()
    cam = camera()
    out = rasterize_mesh(mesh, cam, tile_capacity=256)
    origins, dirs = cam.generate_rays()
    b = jnp.sum(origins * dirs, -1)
    c = jnp.sum(origins * origins, -1) - 0.25
    analytic_hit = np.asarray((b * b - c) > 0)
    got_hit = np.asarray(out.tri_id) >= 0
    agreement = (analytic_hit == got_hit).mean()
    assert agreement > 0.98, agreement
    # depth ~ analytic first hit
    t = np.asarray(-b - jnp.sqrt(jnp.maximum(b * b - c, 0)))
    both = analytic_hit & got_hit
    np.testing.assert_allclose(
        np.asarray(out.depth)[both], t[both] * np.abs(np.asarray(dirs))[both][:, 1] / np.abs(np.asarray(dirs[..., 1]))[both], atol=0.05
    )


def test_occlusion_nearest_wins():
    mesh = TriangleMesh(
        vertices=jnp.array([
            [-1.0, 0.0, -1.0], [1.0, 0.0, -1.0], [0.0, 0.0, 1.0],     # far (y=0)
            [-1.0, 1.0, -1.0], [1.0, 1.0, -1.0], [0.0, 1.0, 1.0],     # near (y=1)
        ]),
        indices=jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32),
    )
    out = rasterize_mesh(mesh, camera(), tile_capacity=16)
    hit = np.asarray(out.tri_id)
    assert (hit[hit >= 0] == 1).all()  # the nearer triangle everywhere


def test_interpolate_gradients():
    mesh = sphere_mesh(12)
    cam = camera()

    def loss(verts):
        m = mesh.replace(vertices=verts)
        out = rasterize_mesh(m, cam, tile_capacity=128)
        pos = interpolate(m.vertices, m, out)
        return jnp.sum(pos ** 2)

    g = jax.grad(loss)(mesh.vertices)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
