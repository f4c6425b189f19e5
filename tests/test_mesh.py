"""Mesh container + regularizer tests (mesh_edge_loss / normal consistency /
uniform Laplacian parity targets: geosplat_prior.py:123-136)."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics.mesh import (
    TriangleMesh, mesh_edge_loss, mesh_normal_consistency,
    uniform_laplacian_smoothing,
)


def tetra():
    v = jnp.array([
        [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
    ])
    f = jnp.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], jnp.int32)
    return TriangleMesh(vertices=v, indices=f)


def test_face_normals_and_vertex_normals():
    m = tetra()
    n, a = m.face_normals_and_areas()
    assert np.allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(a[0]), 0.5, atol=1e-6)
    vn = m.vertex_normals()
    assert np.allclose(np.linalg.norm(np.asarray(vn), axis=-1), 1.0, atol=1e-5)


def test_masked_faces_contribute_nothing():
    m = tetra()
    padded = TriangleMesh(
        vertices=m.vertices,
        indices=jnp.concatenate([m.indices, jnp.zeros((3, 3), jnp.int32)]),
        face_mask=jnp.array([True] * 4 + [False] * 3),
    )
    n1 = m.vertex_normals()
    n2 = padded.vertex_normals()
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-6)
    assert abs(float(mesh_edge_loss(m)) - float(mesh_edge_loss(padded))) < 1e-6


def test_normal_consistency_flat_vs_bent():
    # two coplanar triangles sharing an edge -> loss ~0
    v = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0.0]])
    f = jnp.array([[0, 1, 2], [2, 1, 3]], jnp.int32)
    flat = float(mesh_normal_consistency(TriangleMesh(vertices=v, indices=f)))
    vb = v.at[3, 2].set(1.0)
    bent = float(mesh_normal_consistency(TriangleMesh(vertices=vb, indices=f)))
    assert flat < 1e-5
    assert bent > 0.1


def test_laplacian_zero_for_symmetric():
    m = tetra()
    val = float(uniform_laplacian_smoothing(m))
    assert np.isfinite(val) and val > 0


def test_surface_sampling():
    m = tetra()
    pos, fid = m.sample_surface(jax.random.key(0), 256)
    assert pos.shape == (256, 3)
    assert np.isfinite(np.asarray(pos)).all()
    assert int(fid.max()) <= 3
