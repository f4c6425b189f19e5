"""Triangle mesh pytree with padded static buffers and masked-face semantics.

Parity target: ``rfstudio/graphics/_mesh/_triangle_mesh.py:274`` (fields
vertices/indices/normals/face_normals, normals computation :557-616,
subdivision :680). TPU-first difference: meshes produced by differentiable
isosurfacing have **static capacities** with a ``face_mask`` — every op here
is mask-aware so padded entries contribute nothing and everything jits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.tensorclass import TensorClass, static_field
from . import gmath


class TriangleMesh(TensorClass):
    vertices: jnp.ndarray            # [V, 3]
    indices: jnp.ndarray             # [F, 3] int32
    face_mask: jnp.ndarray | None = None  # [F] bool; None = all valid

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_faces(self) -> int:
        return self.indices.shape[0]

    def face_mask_or_ones(self) -> jnp.ndarray:
        if self.face_mask is None:
            return jnp.ones((self.num_faces,), bool)
        return self.face_mask

    def face_vertices(self) -> jnp.ndarray:
        """[F, 3, 3] gathered corner positions (padded faces give garbage —
        always combine with the mask)."""
        return self.vertices[self.indices]

    def face_normals_and_areas(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Unit face normals [F, 3] and areas [F]; masked faces -> 0."""
        fv = self.face_vertices()
        cross = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        # guarded norm: padded faces have cross == 0 and a bare norm would
        # emit NaN cotangents even through the masked branch
        area2 = jnp.sqrt(jnp.sum(cross * cross, axis=-1) + 1e-20)
        mask = self.face_mask_or_ones()
        n = cross / area2[:, None]
        return (
            jnp.where(mask[:, None], n, 0.0),
            jnp.where(mask, 0.5 * area2, 0.0),
        )

    def vertex_normals(self) -> jnp.ndarray:
        """Area-weighted vertex normals [V, 3] via segment-sum over faces
        (the angle/area-weighted accumulation of _triangle_mesh.py:557-616)."""
        fv = self.face_vertices()
        cross = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])  # ~2*area*n
        mask = self.face_mask_or_ones()
        contrib = jnp.where(mask[:, None], cross, 0.0)
        acc = jnp.zeros_like(self.vertices)
        for k in range(3):
            acc = acc.at[self.indices[:, k]].add(contrib)
        # vertices untouched by valid faces get a unit default instead of a
        # zero normal — keeps downstream shading backward bounded
        degenerate = jnp.sum(acc * acc, axis=-1, keepdims=True) < 1e-16
        acc = jnp.where(degenerate, jnp.array([0.0, 0.0, 1.0]), acc)
        return gmath.safe_normalize(acc)

    def sample_surface(self, key: jax.Array, num_samples: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Area-weighted surface samples: (positions [S,3], face ids [S])."""
        _, areas = self.face_normals_and_areas()
        k1, k2 = jax.random.split(key)
        fid = jax.random.categorical(k1, jnp.log(areas + 1e-20), shape=(num_samples,))
        uv = jax.random.uniform(k2, (num_samples, 2))
        su = jnp.sqrt(uv[:, 0:1])
        b0 = 1 - su
        b1 = uv[:, 1:2] * su
        b2 = 1 - b0 - b1
        fv = self.face_vertices()[fid]
        return b0 * fv[:, 0] + b1 * fv[:, 1] + b2 * fv[:, 2], fid


def mesh_edge_loss(mesh: TriangleMesh, target_length: float = 0.0) -> jnp.ndarray:
    """pytorch3d-style mean squared edge length (geosplat_prior.py:127-135)."""
    fv = mesh.face_vertices()
    mask = mesh.face_mask_or_ones().astype(fv.dtype)
    e = jnp.stack(
        (fv[:, 0] - fv[:, 1], fv[:, 1] - fv[:, 2], fv[:, 2] - fv[:, 0]), axis=1
    )
    # guarded norm: padded/degenerate faces have zero-length edges
    l = jnp.sqrt(jnp.sum(e * e, axis=-1) + 1e-20)  # noqa: E741
    per = (l - target_length) ** 2 * mask[:, None]
    return per.sum() / jnp.maximum(mask.sum() * 3, 1.0)


def uniform_laplacian_smoothing(mesh: TriangleMesh) -> jnp.ndarray:
    """Mean |L x| with uniform weights over mesh edges (the reference's
    uniform-Laplacian regularizer, geosplat_prior.py:32-60)."""
    idx = mesh.indices
    mask = mesh.face_mask_or_ones().astype(mesh.vertices.dtype)
    acc = jnp.zeros_like(mesh.vertices)
    deg = jnp.zeros((mesh.num_vertices,), mesh.vertices.dtype)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        va, vb = idx[:, a], idx[:, b]
        w = mask[:, None]
        acc = acc.at[va].add(mesh.vertices[vb] * w)
        acc = acc.at[vb].add(mesh.vertices[va] * w)
        deg = deg.at[va].add(mask)
        deg = deg.at[vb].add(mask)
    lap = acc / jnp.maximum(deg, 1.0)[:, None] - jnp.where(
        (deg > 0)[:, None], mesh.vertices, 0.0
    )
    # guarded norm: unconnected (padded) vertices have lap == 0 exactly and a
    # bare norm would poison gradients
    lap_norm = jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-20)
    lap_norm = jnp.where(deg > 0, lap_norm, 0.0)
    return lap_norm.sum() / jnp.maximum((deg > 0).sum(), 1)


def mesh_normal_consistency(mesh: TriangleMesh) -> jnp.ndarray:
    """pytorch3d ``mesh_normal_consistency`` analog: 1 - cos between normals
    of faces sharing an edge, averaged. Uses a sort-based adjacency (static
    shape: 3F half-edges)."""
    f = mesh.indices
    mask = mesh.face_mask_or_ones()
    normals, _ = mesh.face_normals_and_areas()
    v = mesh.num_vertices
    # undirected edge key per half-edge
    ea = jnp.stack((f[:, 0], f[:, 1], f[:, 2]), 1).reshape(-1)
    eb = jnp.stack((f[:, 1], f[:, 2], f[:, 0]), 1).reshape(-1)
    lo = jnp.minimum(ea, eb).astype(jnp.int32)
    hi = jnp.maximum(ea, eb).astype(jnp.int32)
    fid = jnp.repeat(jnp.arange(f.shape[0], dtype=jnp.int32), 3)
    valid = jnp.repeat(mask, 3)
    big = jnp.int32(2**31 - 1)
    lo = jnp.where(valid, lo, big)
    hi = jnp.where(valid, hi, big)
    lo_s, hi_s, fid_s = jax.lax.sort((lo, hi, fid), num_keys=2)
    # adjacent in sorted order with equal key => two faces sharing the edge
    same = (lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1]) & (lo_s[1:] < big)
    n1 = normals[fid_s[:-1]]
    n2 = normals[fid_s[1:]]
    cos = jnp.sum(n1 * n2, axis=-1)
    loss = jnp.where(same, 1.0 - cos, 0.0)
    return loss.sum() / jnp.maximum(same.sum(), 1)
