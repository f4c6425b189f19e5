"""Marching tets / marching cubes / DPSR golden tests."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import gmath
from geosplatting_tpu.graphics.marching import (
    kuhn_tet_grid, marching_cubes, marching_tets,
)
from geosplatting_tpu.graphics.dpsr import dpsr_solve, point_rasterize, psr_to_mesh


def test_tet_grid_shapes():
    g = kuhn_tet_grid(4)
    assert g.vertices.shape == (125, 3)
    assert g.tets.shape == (4**3 * 6, 4)
    # all tets have positive volume ordering consistency (nonzero volume)
    v = np.asarray(g.vertices)[np.asarray(g.tets)]
    vol = np.einsum(
        "ti,ti->t",
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]),
        v[:, 3] - v[:, 0],
    )
    assert (np.abs(vol) > 1e-9).all()


def test_marching_cubes_sphere():
    r = 20
    grid = kuhn_tet_grid(r, 1.0)
    sdf = jnp.linalg.norm(grid.vertices, axis=-1) - 0.6
    mesh = marching_tets(grid.vertices, sdf, grid.tets)
    mask = np.asarray(mesh.face_mask)
    assert mask.sum() > 200
    fv = np.asarray(mesh.vertices).reshape(-1, 3, 3)[mask]
    radii = np.linalg.norm(fv.reshape(-1, 3), axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.01)
    assert radii.std() < 0.02
    # orientation: normals point outward
    n = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    center = fv.mean(1)
    frac = (np.sum(n * center, -1) > 0).mean()
    assert frac > 0.99, frac


def test_marching_is_differentiable():
    r = 8
    grid = kuhn_tet_grid(r, 1.0)

    def loss(sdf):
        mesh = marching_tets(grid.vertices, sdf, grid.tets)
        return jnp.where(
            jnp.repeat(mesh.face_mask, 3)[:, None], mesh.vertices, 0.0
        ).sum()

    sdf = jnp.linalg.norm(grid.vertices, axis=-1) - 0.5
    g = jax.grad(loss)(sdf)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_point_rasterize_mass():
    pts = jax.random.uniform(jax.random.key(0), (100, 3))
    vals = jnp.ones((100, 1))
    grid = point_rasterize(pts, vals, 8)
    np.testing.assert_allclose(float(grid.sum()), 100.0, rtol=1e-5)


def test_dpsr_sphere():
    key = jax.random.key(1)
    d = gmath.safe_normalize(jax.random.normal(key, (2000, 3)))
    pts = d * 0.3 + 0.5          # sphere of radius .3 centered at (.5,.5,.5)
    chi = dpsr_solve(pts, d, resolution=32)
    assert np.isfinite(np.asarray(chi)).all()
    # indicator: inside (center) and outside (corner) have opposite signs
    inside = float(chi[16, 16, 16])
    outside = float(chi[2, 2, 2])
    assert inside * outside < 0, (inside, outside)
    mesh = psr_to_mesh(pts, d, resolution=32)
    assert int(mesh.face_mask.sum()) > 50
