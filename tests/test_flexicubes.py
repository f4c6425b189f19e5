"""FlexiCubes golden tests: table derivation invariants, sphere extraction
quality (watertight, outward normals, radius accuracy), differentiability,
and budget-overflow accounting."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import flexicubes as fc


def test_dmc_table_invariants():
    table, num_vd, max_vd, max_e = fc._build_dmc_tables()
    assert table.shape[0] == 256
    assert num_vd[0] == 0 and num_vd[255] == 0
    # single corner inside: one dual vertex with exactly 3 edges
    for corner in range(8):
        case = 1 << corner
        assert num_vd[case] == 1
        edges = table[case, 0]
        assert (edges >= 0).sum() == 3
    # complement symmetry: same edge sets
    for case in range(256):
        a = sorted(e for vd in table[case] for e in vd if e >= 0)
        b = sorted(e for vd in table[255 - case] for e in vd if e >= 0)
        assert a == b
    assert max_vd <= 4


def sphere_sdf(grid, radius=0.55):
    v = grid.base_vertices()
    return jnp.linalg.norm(v, axis=-1) - radius


def test_sphere_extraction():
    grid = fc.make_grid(24, scale=1.0)
    out = fc.extract(grid, sphere_sdf(grid))
    mesh = out.mesh
    mask = np.asarray(mesh.face_mask)
    assert mask.sum() > 100
    assert int(out.num_surf_cubes) <= grid.max_surf_cubes
    assert int(out.num_surf_edges) <= grid.max_surf_edges

    verts = np.asarray(mesh.vertices)
    faces = np.asarray(mesh.indices)[mask]
    used = np.unique(faces)
    r = np.linalg.norm(verts[used], axis=-1)
    np.testing.assert_allclose(r.mean(), 0.55, atol=0.01)
    assert r.std() < 0.02

    # watertight: every edge of the valid faces is shared by exactly 2 faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), f"non-manifold edge counts: {np.unique(counts)}"

    # outward orientation: face normal aligned with radial direction
    fv = verts[faces]
    n = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    center = fv.mean(axis=1)
    frac_outward = (np.sum(n * center, -1) > 0).mean()
    assert frac_outward > 0.99, f"outward fraction {frac_outward}"


def test_extraction_is_differentiable():
    grid = fc.make_grid(12, scale=1.0)

    def loss(sdf, deform):
        out = fc.extract(grid, sdf, deform)
        mask = out.mesh.face_mask
        fv = out.mesh.vertices[out.mesh.indices]
        cr = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        area = jnp.sqrt(jnp.sum(cr * cr, axis=-1) + 1e-20)
        return jnp.where(mask, area, 0.0).sum() + out.l_dev

    sdf = sphere_sdf(grid, 0.5)
    deform = jnp.zeros((grid.num_vertices, 3))
    g_sdf, g_def = jax.grad(loss, argnums=(0, 1))(sdf, deform)
    assert np.isfinite(np.asarray(g_sdf)).all()
    assert np.isfinite(np.asarray(g_def)).all()
    assert np.abs(np.asarray(g_sdf)).sum() > 0
    assert np.abs(np.asarray(g_def)).sum() > 0


def test_weights_affect_output():
    grid = fc.make_grid(8, scale=1.0)
    sdf = sphere_sdf(grid, 0.5)
    f = grid.num_cubes
    out0 = fc.extract(grid, sdf)
    key = jax.random.key(0)
    out1 = fc.extract(
        grid, sdf,
        alpha=jax.random.normal(key, (f, 8)),
        beta=jax.random.normal(key, (f, 12)),
        gamma=jax.random.normal(key, (f, 1)),
    )
    mask = np.asarray(out0.mesh.face_mask)
    assert mask.sum() > 0
    d = np.abs(np.asarray(out0.mesh.vertices) - np.asarray(out1.mesh.vertices))
    assert d.max() > 1e-4


def test_entropy_positive_on_noise():
    grid = fc.make_grid(8)
    sdf = jax.random.normal(jax.random.key(1), (grid.num_vertices,))
    e = fc.sdf_entropy(grid, sdf)
    assert float(e) > 0


def test_extract_under_jit():
    grid = fc.make_grid(10)
    f = jax.jit(lambda s: fc.extract(grid, s).mesh.vertices)
    v = f(sphere_sdf(grid, 0.5))
    assert np.isfinite(np.asarray(v)).all()
