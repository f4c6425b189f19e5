"""Marching tetrahedra / marching cubes — the DMTet and IsoCubes parity ops.

Parity targets: ``rfstudio/graphics/_mesh/_dmtet.py:86`` (DMTet: marching
tetrahedra over predefined tet grids) and ``_isocubes.py:323`` (classic
256-case marching cubes). TPU-first design: one static-shape marching-tets
core; the tet table (16 cases, <=2 triangles) is generated programmatically
at import; cube grids are handled through the Kuhn 6-tet decomposition —
the same consistent space triangulation used to derive the FlexiCubes
tables — so no 256-case table is transcribed anywhere. Output is a padded
TriangleMesh with per-triangle validity masks (each triangle owns its three
crossing vertices; no global dedup pass, which only affects vertex-normal
smoothing at seams).
"""
from __future__ import annotations

import functools
from itertools import permutations
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import TriangleMesh

# tet corner pairs: the 6 edges of a tetrahedron (local corner ids 0..3)
TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)


@functools.lru_cache(maxsize=1)
def _tet_table() -> tuple[np.ndarray, np.ndarray]:
    """16-case marching-tets table, generated: tri_table [16, 2, 3] of local
    tet-edge indices (-1 padded) + num_tris [16]. Winding: triangles face the
    positive-SDF (outside) region."""
    edge_of = {tuple(sorted(e)): i for i, e in enumerate(TET_EDGES.tolist())}
    table = np.full((16, 2, 3), -1, np.int32)
    num = np.zeros(16, np.int32)
    for case in range(16):
        inside = [v for v in range(4) if (case >> v) & 1]
        outside = [v for v in range(4) if not ((case >> v) & 1)]
        if len(inside) in (0, 4):
            continue
        if len(inside) == 1 or len(inside) == 3:
            flip = len(inside) == 3
            v = inside[0] if not flip else outside[0]
            others = [u for u in range(4) if u != v]
            e = [edge_of[tuple(sorted((v, u)))] for u in others]
            table[case, 0] = e if not flip else [e[0], e[2], e[1]]
            num[case] = 1
        else:
            a, b = inside
            c, d = outside
            e_ac = edge_of[tuple(sorted((a, c)))]
            e_ad = edge_of[tuple(sorted((a, d)))]
            e_bc = edge_of[tuple(sorted((b, c)))]
            e_bd = edge_of[tuple(sorted((b, d)))]
            table[case, 0] = [e_ac, e_ad, e_bd]
            table[case, 1] = [e_ac, e_bd, e_bc]
            num[case] = 2
    return table, num




def marching_tets(
    vertices: jnp.ndarray,   # [V, 3]
    sdf: jnp.ndarray,        # [V]
    tets: jnp.ndarray,       # [T, 4] int32 vertex ids
) -> TriangleMesh:
    """Differentiable marching tetrahedra (DMTet core, _dmtet.py:179).
    Returns a padded mesh: [T*2*3] vertices, [T*2, 3] faces + mask."""
    table_np, num_np = _tet_table()
    occ = (sdf < 0).astype(jnp.int32)
    t_occ = occ[tets]  # [T, 4]
    case = (
        t_occ[:, 0] + 2 * t_occ[:, 1] + 4 * t_occ[:, 2] + 8 * t_occ[:, 3]
    )
    tri_e = jnp.asarray(table_np)[case]            # [T, 2, 3] local edges
    n_tris = jnp.asarray(num_np)[case]             # [T]

    edges = jnp.asarray(TET_EDGES)                 # [6, 2]
    ea = tets[:, edges[:, 0]]                      # [T, 6]
    eb = tets[:, edges[:, 1]]
    sa = sdf[ea]
    sb = sdf[eb]
    denom = sa - sb
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    w = jnp.clip(sa / denom, 0.0, 1.0)[..., None]
    crossing = vertices[ea] * (1 - w) + vertices[eb] * w   # [T, 6, 3]

    e_idx = jnp.maximum(tri_e, 0)                  # [T, 2, 3]
    tri_pts = jnp.take_along_axis(
        crossing[:, None, :, :].repeat(2, 1), e_idx[..., None].repeat(3, -1), axis=2
    )  # [T, 2, 3, 3]
    # orient per triangle at runtime (Kuhn tets have mixed parity, so no
    # static case winding exists): flip when the normal opposes the tet's
    # linear SDF gradient, which points toward the outside
    tet_pos = vertices[tets]                       # [T, 4, 3]
    tet_sdf = sdf[tets]                            # [T, 4]
    # exact gradient of the linear interpolant: E g = ds with E the edge matrix
    e_mat = tet_pos[:, 1:] - tet_pos[:, 0:1]       # [T, 3, 3]
    ds = tet_sdf[:, 1:] - tet_sdf[:, 0:1]          # [T, 3]
    grad = jnp.linalg.solve(e_mat, ds[..., None])[..., 0]  # [T, 3]
    n = jnp.cross(
        tri_pts[:, :, 1] - tri_pts[:, :, 0], tri_pts[:, :, 2] - tri_pts[:, :, 0]
    )  # [T, 2, 3]
    flip = jnp.sum(n * jax.lax.stop_gradient(grad)[:, None, :], -1) < 0  # [T, 2]
    tri_pts = jnp.where(
        flip[..., None, None],
        tri_pts[:, :, jnp.array([0, 2, 1]), :],
        tri_pts,
    )
    t = tets.shape[0]
    valid = (
        jnp.arange(2)[None, :] < n_tris[:, None]
    )  # [T, 2]
    # drop zero-area slivers (crossings collapsing onto grid vertices)
    area_sq = jnp.sum(n * n, -1)
    valid = valid & (area_sq > 1e-20)
    verts = tri_pts.reshape(t * 2 * 3, 3)
    faces = jnp.arange(t * 2 * 3, dtype=jnp.int32).reshape(t * 2, 3)
    mask = valid.reshape(t * 2)
    return TriangleMesh(
        vertices=jnp.where(jnp.repeat(mask, 3)[:, None], verts, 0.0),
        indices=faces,
        face_mask=mask,
    )


class TetGrid(NamedTuple):
    vertices: jnp.ndarray  # [V, 3]
    tets: jnp.ndarray      # [T, 4]


def kuhn_tet_grid(resolution: int, scale: float = 1.0) -> TetGrid:
    """Regular tet grid by Kuhn-subdividing the cube lattice (replaces the
    reference's {32,64}_tets.npz assets, _dmtet.py tet grids)."""
    r = resolution
    idx = np.arange((r + 1) ** 3)
    x = idx % (r + 1)
    y = (idx // (r + 1)) % (r + 1)
    z = idx // ((r + 1) ** 2)
    verts = (np.stack([x, y, z], -1) / r * 2.0 - 1.0) * scale

    def vid(cx, cy, cz):
        return (cz * (r + 1) + cy) * (r + 1) + cx

    cube = np.arange(r**3)
    cx = cube % r
    cy = (cube // r) % r
    cz = cube // (r * r)
    tets = []
    for p in permutations(range(3)):
        corners = [np.zeros(3, np.int32)]
        acc = np.zeros(3, np.int32)
        for axis in p:
            acc = acc.copy()
            acc[axis] = 1
            corners.append(acc)
        ids = [
            vid(cx + c[0], cy + c[1], cz + c[2]) for c in corners
        ]
        tets.append(np.stack(ids, -1))
    tets = np.concatenate(tets, axis=0).astype(np.int32)
    return TetGrid(vertices=jnp.asarray(verts, jnp.float32), tets=jnp.asarray(tets))


def marching_cubes(
    sdf_grid: jnp.ndarray,   # [R+1, R+1, R+1] or flat
    resolution: int,
    scale: float = 1.0,
) -> TriangleMesh:
    """IsoCubes parity (classic isosurface from a dense grid) via marching
    tets over the Kuhn decomposition."""
    grid = kuhn_tet_grid(resolution, scale)
    return marching_tets(grid.vertices, sdf_grid.reshape(-1), grid.tets)
