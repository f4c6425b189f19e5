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


def test_antialias_edge_gradients():
    """The dr.antialias analog: silhouette pixels blend, and coverage
    gradients w.r.t. vertex positions appear (hard rasterization has none)
    and match finite differences of the blended total."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geosplatting_tpu.graphics.cameras import Cameras
    from geosplatting_tpu.graphics.mesh import TriangleMesh
    from geosplatting_tpu.ops.mesh_raster import antialias, rasterize_mesh

    cam = Cameras.from_lookat(
        jnp.array([[0.15, 0.3, 2.0]]), jnp.zeros((1, 3)), width=32, height=32,
    )[0]

    def render_total(s):
        # scale the triangle: d(coverage)/ds = 2 * screen_area, a nonzero
        # analytic target (translation would be coverage-invariant)
        verts = jnp.array(
            [[-0.6, -0.6, 0.0], [0.6, -0.6, 0.0], [0.0, 0.7, 0.0]]
        ) * (1.0 + s)
        mesh = TriangleMesh(
            vertices=verts, indices=jnp.array([[0, 1, 2]], jnp.int32)
        )
        rast = rasterize_mesh(mesh, cam, tile_capacity=16)
        color = jnp.where(
            (rast.tri_id >= 0)[..., None], jnp.ones(3), jnp.zeros(3)
        )
        aa = antialias(color, mesh, cam, rast)
        return jnp.sum(aa), (color, aa)

    total, (color, aa) = render_total(0.0)
    # blended values strictly between fg and bg exist on the silhouette
    vals = np.asarray(aa[..., 0])
    assert ((vals > 0.05) & (vals < 0.95)).sum() > 5

    grad = float(jax.grad(lambda s: render_total(s)[0])(0.0))
    # hard rasterization alone would give exactly zero
    assert abs(grad) > 1.0

    # analytic: hard coverage (pixels) ~ screen area; d/ds = 2A per channel
    area_px = float(np.asarray(color[..., 0]).sum())
    target = 2.0 * area_px * 3.0
    assert abs(grad - target) < 0.4 * target, (grad, target)

    eps = 0.01
    fd = (float(render_total(eps)[0]) - float(render_total(-eps)[0])) / (2 * eps)
    assert abs(grad - fd) < 0.5 * max(abs(fd), 1.0), (grad, fd)
