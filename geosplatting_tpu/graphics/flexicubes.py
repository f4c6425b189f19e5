"""FlexiCubes — differentiable isosurface extraction, TPU-native.

Capability parity with ``rfstudio/graphics/_mesh/_flexicubes.py:369``
(``dual_marching_cubes`` :559-714, L_dev :727, SDF entropy :715-726,
gamma-weighted quad fan triangulation :743-802, ``from_resolution`` :398),
re-designed for XLA's static-shape world:

- **No dynamic shapes.** Surface cubes/edges are compacted into fixed
  capacity buffers with ``jnp.nonzero(size=...)``; the mesh comes out as
  padded vertex/face buffers with a ``face_mask``.
- **No `torch.unique`.** The grid is regular, so every grid edge has an
  analytic global id (direction * num_verts + base_vertex) and the 4 cubes
  around an interior edge are found analytically — replacing the
  reference's sort/unique machinery with O(1) index math.
- **No transcribed topology tables.** The 256-case dual-marching-cubes
  edge-grouping tables are *derived at import time* from first principles:
  marching tetrahedra over the Kuhn 6-tet decomposition of the cube gives a
  globally consistent (crack-free) isosurface per case; connected components
  of its crossings define the dual-vertex edge groups. This also resolves
  face ambiguities consistently across neighboring cubes (the role of the
  reference's C16/C19 check table) because the Kuhn triangulation of space
  is itself consistent.
"""
from __future__ import annotations

import functools
from itertools import permutations
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import TriangleMesh

# --- canonical cube topology -------------------------------------------------
# corner index c has coords (c & 1, (c >> 1) & 1, (c >> 2) & 1)
CUBE_CORNERS = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], np.int32
)
# 12 canonical edges: 4 per axis direction, (base corner, base | bit(dir))
EDGE_CA = np.array([0, 2, 4, 6, 0, 1, 4, 5, 0, 1, 2, 3], np.int32)
EDGE_DIR = np.array([0] * 4 + [1] * 4 + [2] * 4, np.int32)
EDGE_CB = EDGE_CA | (1 << EDGE_DIR)


@functools.lru_cache(maxsize=1)
def _build_dmc_tables() -> tuple[np.ndarray, np.ndarray, int, int]:
    """Derive the 256-case dual-vertex edge-group tables from marching
    tetrahedra over the Kuhn decomposition. Returns (dmc_table
    [256, MAX_VD, MAX_E] local-edge ids padded with -1, num_vd [256],
    MAX_VD, MAX_E)."""
    tets = [
        (0, 1 << p0, (1 << p0) | (1 << p1), 7)
        for (p0, p1, p2) in permutations(range(3))
    ]
    edge_of_pair = {
        frozenset((int(a), int(b))): e
        for e, (a, b) in enumerate(zip(EDGE_CA, EDGE_CB))
    }

    groups_all: list[list[list[int]]] = []
    for case in range(256):
        occ = [(case >> i) & 1 for i in range(8)]
        parent: dict[frozenset, frozenset] = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(nodes):
            for n in nodes:
                parent.setdefault(n, n)
            roots = [find(n) for n in nodes]
            for r in roots[1:]:
                parent[r] = roots[0]

        for tet in tets:
            inside = [v for v in tet if occ[v]]
            k = len(inside)
            if k in (0, 4):
                continue
            if k in (1, 3):
                v = inside[0] if k == 1 else [u for u in tet if not occ[u]][0]
                others = [u for u in tet if u != v]
                union([frozenset((v, u)) for u in others])
            else:
                a, b = inside
                c, d = [u for u in tet if not occ[u]]
                union([
                    frozenset((a, c)), frozenset((a, d)),
                    frozenset((b, c)), frozenset((b, d)),
                ])

        comps: dict[frozenset, list] = {}
        for n in parent:
            comps.setdefault(find(n), []).append(n)
        groups = []
        for nodes in comps.values():
            edges = sorted(edge_of_pair[n] for n in nodes if n in edge_of_pair)
            if edges:
                groups.append(edges)
        # sanity: each sign-change cube edge appears exactly once
        flat = [e for g in groups for e in g]
        expect = [
            e for e in range(12)
            if occ[int(EDGE_CA[e])] != occ[int(EDGE_CB[e])]
        ]
        assert sorted(flat) == expect, (case, groups, expect)
        groups_all.append(sorted(groups))

    max_vd = max(len(g) for g in groups_all)
    max_e = max((len(e) for g in groups_all for e in g), default=1)
    table = np.full((256, max_vd, max_e), -1, np.int32)
    num_vd = np.zeros((256,), np.int32)
    for case, groups in enumerate(groups_all):
        num_vd[case] = len(groups)
        for i, g in enumerate(groups):
            table[case, i, : len(g)] = g
    return table, num_vd, max_vd, max_e


@functools.lru_cache(maxsize=1)
def _build_local_edge_slot() -> np.ndarray:
    """[3, 2, 2] -> local edge index: for an edge in direction d, the cube at
    perpendicular offsets (o1, o2) in {-1,0}^2 sees it as this local edge."""
    edge_of = {
        (int(EDGE_CA[e]), int(EDGE_DIR[e])): e for e in range(12)
    }
    out = np.zeros((3, 2, 2), np.int32)
    for d in range(3):
        p1, p2 = [p for p in range(3) if p != d]
        for i1, o1 in enumerate((-1, 0)):
            for i2, o2 in enumerate((-1, 0)):
                coords = [0, 0, 0]
                coords[p1] = -o1
                coords[p2] = -o2
                corner = coords[0] | (coords[1] << 1) | (coords[2] << 2)
                out[d, i1, i2] = edge_of[(corner, d)]
    return out


class FlexiCubesGrid(NamedTuple):
    """Static grid description (reference's FlexiCubes.from_resolution)."""

    resolution: tuple[int, int, int]
    scale: float
    max_surf_cubes: int
    max_surf_edges: int

    @property
    def num_vertices(self) -> int:
        rx, ry, rz = self.resolution
        return (rx + 1) * (ry + 1) * (rz + 1)

    @property
    def num_cubes(self) -> int:
        rx, ry, rz = self.resolution
        return rx * ry * rz

    def base_vertices(self) -> jnp.ndarray:
        """[V, 3] undeformed grid vertex positions in [-scale, scale]^3."""
        rx, ry, rz = self.resolution
        idx = np.arange(self.num_vertices)
        x = idx % (rx + 1)
        y = (idx // (rx + 1)) % (ry + 1)
        z = idx // ((rx + 1) * (ry + 1))
        v = np.stack((x / rx, y / ry, z / rz), -1).astype(np.float32)
        return jnp.asarray((2 * v - 1) * self.scale)

    def deform_step(self) -> float:
        """Max per-axis deformation (geosplat.py:757: 0.5*scale/resolution)."""
        return 0.5 * self.scale / max(self.resolution)


def make_grid(
    resolution: int | tuple[int, int, int],
    *,
    scale: float = 1.0,
    surf_cube_budget: float = 8.0,
    surf_edge_budget: float = 16.0,
) -> FlexiCubesGrid:
    res = (resolution,) * 3 if isinstance(resolution, int) else tuple(resolution)
    r2 = max(res) ** 2
    return FlexiCubesGrid(
        resolution=res,
        scale=scale,
        max_surf_cubes=min(int(surf_cube_budget * r2), int(np.prod(res))),
        max_surf_edges=int(surf_edge_budget * r2),
    )


class ExtractedMesh(NamedTuple):
    mesh: TriangleMesh          # padded: [4*S+E, 3] verts, [4*E, 3] faces + mask
    l_dev: jnp.ndarray          # [] masked mean of the per-edge-group deviation
    num_surf_cubes: jnp.ndarray # [] int32 actual count (budget-overflow check)
    num_surf_edges: jnp.ndarray # [] int32 actual count


def _vertex_id(grid: FlexiCubesGrid, x, y, z):
    rx, ry, _ = grid.resolution
    return (z * (ry + 1) + y) * (rx + 1) + x


def extract(
    grid: FlexiCubesGrid,
    sdf: jnp.ndarray,                 # [V]
    deform: jnp.ndarray | None = None,  # [V, 3] raw (tanh'ed here)
    alpha: jnp.ndarray | None = None,   # [F, 8] raw
    beta: jnp.ndarray | None = None,    # [F, 12] raw
    gamma: jnp.ndarray | None = None,   # [F, 1] raw
    *,
    weight_scale: float = 0.99,
    sdf_eps: float | None = None,
) -> ExtractedMesh:
    """Differentiable dual marching cubes (geosplat get_geometry semantics,
    geosplat.py:751-769 + _flexicubes.py:559-714)."""
    dmc_table_np, num_vd_np, MAX_VD, MAX_E = _build_dmc_tables()
    local_slot_np = _build_local_edge_slot()
    rx, ry, rz = grid.resolution
    V = grid.num_vertices
    F = grid.num_cubes
    S = grid.max_surf_cubes
    E = grid.max_surf_edges

    vertices = grid.base_vertices()
    if deform is not None:
        vertices = vertices + jnp.tanh(deform) * grid.deform_step()
    sdf = sdf.reshape(V)
    occ = sdf < 0

    # --- per-cube corner ids and case ids (dense over all cubes) -------------
    cidx = jnp.arange(F, dtype=jnp.int32)
    cx = cidx % rx
    cy = (cidx // rx) % ry
    cz = cidx // (rx * ry)
    corners = jnp.asarray(CUBE_CORNERS)  # [8, 3]
    corner_vid = _vertex_id(
        grid,
        cx[:, None] + corners[None, :, 0],
        cy[:, None] + corners[None, :, 1],
        cz[:, None] + corners[None, :, 2],
    )  # [F, 8]
    cocc = occ[corner_vid]  # [F, 8]
    case_ids = jnp.sum(
        cocc.astype(jnp.int32) * (1 << jnp.arange(8, dtype=jnp.int32))[None, :], axis=1
    )
    occ_sum = cocc.sum(axis=1)
    surf_mask = (occ_sum > 0) & (occ_sum < 8)
    num_surf_cubes = surf_mask.sum()

    (sc,) = jnp.nonzero(surf_mask, size=S, fill_value=F)
    sc_valid = sc < F
    sc_safe = jnp.minimum(sc, F - 1)
    case_s = jnp.where(sc_valid, case_ids[sc_safe], 0)

    # --- weights (geosplat defaults: learnable, squashed) ---------------------
    ws = weight_scale
    alpha_s = (
        jnp.tanh(alpha[sc_safe]) * ws + 1.0 if alpha is not None else jnp.ones((S, 8))
    )
    beta_s = (
        jnp.tanh(beta[sc_safe]) * ws + 1.0 if beta is not None else jnp.ones((S, 12))
    )
    gamma_s = (
        jax.nn.sigmoid(gamma[sc_safe][:, 0]) * ws + (1 - ws) / 2
        if gamma is not None
        else jnp.ones((S,))
    )

    # --- surface edges (dense analytic ids, then compaction) ------------------
    # global edge id = d * V + base_vertex_id; stride to the other endpoint:
    strides = jnp.asarray([1, rx + 1, (rx + 1) * (ry + 1)], jnp.int32)
    vidx = jnp.arange(V, dtype=jnp.int32)
    vx = vidx % (rx + 1)
    vy = (vidx // (rx + 1)) % (ry + 1)
    vz = vidx // ((rx + 1) * (ry + 1))
    in_bounds = jnp.stack((vx < rx, vy < ry, vz < rz), axis=0)  # [3, V]
    other = jnp.minimum(vidx[None, :] + strides[:, None], V - 1)  # [3, V]
    edge_sign_change = in_bounds & (occ[None, :] != occ[other])  # [3, V]
    edge_surf = edge_sign_change.reshape(-1)  # [3V]
    num_surf_edges = edge_surf.sum()

    (se,) = jnp.nonzero(edge_surf, size=E, fill_value=3 * V)
    se_valid = se < 3 * V
    se_safe = jnp.minimum(se, 3 * V - 1)
    # compact lookup: global edge id -> [0, E) (or E for non-surf)
    edge_compact = jnp.full((3 * V + 1,), E, jnp.int32).at[se_safe].set(
        jnp.arange(E, dtype=jnp.int32), mode="drop"
    )

    se_dir = se_safe // V
    se_a = se_safe % V
    se_b = jnp.minimum(se_a + strides[se_dir], V - 1)
    sa = sdf[se_a]
    sb = sdf[se_b]

    def lerp(sa, sb, xa, xb):
        denom = sa - sb
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)  # padded edges
        w_b = sa / denom
        if sdf_eps is not None:
            w_b = (1 - sdf_eps) * w_b + sdf_eps / 2
        return xb * w_b[..., None] + xa * (1 - w_b)[..., None]

    zero_x = lerp(sa, sb, vertices[se_a], vertices[se_b])  # [E, 3]

    # --- dual vertices: [S, MAX_VD, MAX_E] batched over every surf cube -------
    dmc = jnp.asarray(dmc_table_np)[case_s]  # [S, VD, K] local edge or -1
    num_vd = jnp.asarray(num_vd_np)[case_s]  # [S]
    entry_valid = (dmc >= 0) & sc_valid[:, None, None]
    e_local = jnp.maximum(dmc, 0)  # [S, VD, K]

    # global edge id for each (cube, local edge): base corner -> base vertex
    ca = jnp.asarray(EDGE_CA)[e_local]  # [S, VD, K]
    ed = jnp.asarray(EDGE_DIR)[e_local]
    cc = jnp.asarray(CUBE_CORNERS)[ca]  # [S, VD, K, 3]
    base_vid = _vertex_id(
        grid,
        cx[sc_safe][:, None, None] + cc[..., 0],
        cy[sc_safe][:, None, None] + cc[..., 1],
        cz[sc_safe][:, None, None] + cc[..., 2],
    )
    geid = ed * V + base_vid  # [S, VD, K]
    ceid = edge_compact[jnp.where(entry_valid, geid, 3 * V)]  # [S, VD, K] in [0,E]
    ceid_safe = jnp.minimum(ceid, E - 1)

    # alpha-weighted zero crossing per cube-edge use (_flexicubes.py:682-686)
    a_of = jnp.take_along_axis(
        alpha_s[:, None, :].repeat(MAX_VD, 1), jnp.asarray(EDGE_CA)[e_local], axis=2
    )
    b_of = jnp.take_along_axis(
        alpha_s[:, None, :].repeat(MAX_VD, 1), jnp.asarray(EDGE_CB)[e_local], axis=2
    )
    sa_g = sa[ceid_safe] * a_of
    sb_g = sb[ceid_safe] * b_of
    # scatter-free backward: the vertex-position cotangent accumulation was
    # the #5/#6 op of the round-4 stage-1 trace (107 ms each per step as a
    # [912k, 3] scatter-add from 2.65M rows at ~0.9 GiB/s)
    from ..ops.segment_rows import gather_rows

    xa_g = gather_rows(vertices.shape[0], vertices, se_a[ceid_safe])
    xb_g = gather_rows(vertices.shape[0], vertices, se_b[ceid_safe])
    ue = lerp(sa_g, sb_g, xa_g, xb_g)  # [S, VD, K, 3]
    ue = jnp.where(entry_valid[..., None], ue, 0.0)

    bw = jnp.take_along_axis(beta_s[:, None, :].repeat(MAX_VD, 1), e_local, axis=2)
    bw = jnp.where(entry_valid, bw, 0.0)  # [S, VD, K]
    bw_sum = jnp.maximum(bw.sum(-1, keepdims=True), 1e-12)
    vd = (ue * bw[..., None]).sum(-2) / bw_sum[..., None][:, :, 0, :]  # [S, VD, 3]

    # L_dev (Eq. 8, _flexicubes.py:727-741): mean absolute deviation of
    # per-edge crossings from their dual vertex
    zc_g = zero_x[ceid_safe]  # [S, VD, K, 3]
    diff = zc_g - vd[:, :, None, :]
    # guarded norm: padded entries are exactly 0 and a bare norm would emit
    # NaN cotangents through the masked branch
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-20)
    cnt = jnp.maximum(entry_valid.sum(-1), 1)
    mean_l2 = jnp.where(entry_valid, dist, 0.0).sum(-1) / cnt  # [S, VD]
    mad = jnp.abs(dist - mean_l2[..., None])
    mad = jnp.where(entry_valid, mad, 0.0)
    l_dev = mad.sum() / jnp.maximum(entry_valid.sum(), 1)

    # map (cube, local edge) -> vd slot, for the quad step
    slot_ids = jnp.arange(MAX_VD, dtype=jnp.int32)[None, :, None]
    vd_slot_of_edge = jnp.zeros((S, 12), jnp.int32)
    onehot = jax.nn.one_hot(
        jnp.where(entry_valid, e_local, 12), 13, dtype=jnp.int32
    )  # [S, VD, K, 13]
    vd_slot_of_edge = (
        (onehot[..., :12] * (slot_ids[..., None] + 1)).max(axis=(1, 2))
    ) - 1  # [S, 12]; -1 where no vd uses the edge

    # --- quads: one per interior surf edge (analytic 4-cube adjacency) --------
    ax = vx[se_a]
    ay = vy[se_a]
    az = vz[se_a]
    coords = jnp.stack((ax, ay, az), -1)  # [E, 3]
    perp = jnp.asarray([[1, 2], [0, 2], [0, 1]], jnp.int32)[se_dir]  # [E, 2]
    # Z-ordered offsets (ascending cube linear index): (o1, o2) over (p1, p2)
    offs = jnp.asarray([[-1, -1], [0, -1], [-1, 0], [0, 0]], jnp.int32)  # [4, 2]
    ccoords = jnp.repeat(coords[:, None, :], 4, axis=1)  # [E, 4, 3]
    ccoords = ccoords.at[
        jnp.arange(E)[:, None], perp[:, None, 0], ...
    ].add(offs[None, :, 0]) if False else ccoords
    # (scatter-free form)
    o1 = offs[None, :, 0]
    o2 = offs[None, :, 1]
    delta = (
        jax.nn.one_hot(perp[:, 0], 3, dtype=jnp.int32)[:, None, :] * o1[..., None]
        + jax.nn.one_hot(perp[:, 1], 3, dtype=jnp.int32)[:, None, :] * o2[..., None]
    )  # [E, 4, 3]
    ccoords = coords[:, None, :] + delta
    res_arr = jnp.asarray([rx, ry, rz], jnp.int32)
    cube_ok = ((ccoords >= 0) & (ccoords < res_arr[None, None, :])).all(-1)  # [E, 4]
    quad_ok = cube_ok.all(-1) & se_valid  # [E]
    ccoords_c = jnp.clip(ccoords, 0, res_arr[None, None, :] - 1)
    clin = (ccoords_c[..., 2] * ry + ccoords_c[..., 1]) * rx + ccoords_c[..., 0]

    # cube -> compact surf index
    cube_compact = jnp.full((F + 1,), S, jnp.int32).at[sc_safe].set(
        jnp.arange(S, dtype=jnp.int32), mode="drop"
    )
    qcube = cube_compact[jnp.where(quad_ok[:, None], clin, F)]  # [E, 4]
    quad_ok = quad_ok & (qcube < S).all(-1)
    qcube_safe = jnp.minimum(qcube, S - 1)

    lslot = jnp.asarray(local_slot_np)  # [3, 2, 2]
    le = lslot[se_dir[:, None], offs[None, :, 0] + 1, offs[None, :, 1] + 1]  # [E, 4]
    vslot = vd_slot_of_edge[qcube_safe, le]  # [E, 4]
    quad_ok = quad_ok & (vslot >= 0).all(-1)
    qvd = qcube_safe * MAX_VD + jnp.maximum(vslot, 0)  # [E, 4] into flat vd

    # winding: the Z-pattern cyclic order [0,1,3,2] is CCW about +d for
    # d in {0,2} but CW for d=1 (since e0 x e2 = -e1); the face normal must
    # point to the positive-SDF side, i.e. along +d when sdf[a] < 0.
    fwd = jnp.logical_xor(sa < 0, se_dir == 1)
    z_idx = jnp.asarray([[0, 1, 3, 2], [2, 3, 1, 0]], jnp.int32)
    cyc = z_idx[jnp.where(fwd, 0, 1)]  # [E, 4]
    quad = jnp.take_along_axis(qvd, cyc, axis=1)  # [E, 4] cyclic order

    # gamma-weighted center (Sec 4.3; _flexicubes.py:779-800)
    vd_flat = vd.reshape(S * MAX_VD, 3)
    gam_flat = jnp.repeat(gamma_s, MAX_VD)
    qv = vd_flat[quad]  # [E, 4, 3]
    qg = gam_flat[quad]  # [E, 4]
    g02 = qg[:, 0] * qg[:, 2]
    g13 = qg[:, 1] * qg[:, 3]
    v02 = 0.5 * (qv[:, 0] + qv[:, 2])
    v13 = 0.5 * (qv[:, 1] + qv[:, 3])
    center = (v02 * g02[:, None] + v13 * g13[:, None]) / (g02 + g13 + 1e-8)[:, None]

    # assemble padded mesh: [S*MAX_VD] dual verts + [E] centers
    all_verts = jnp.concatenate((vd_flat, center), axis=0)
    center_idx = S * MAX_VD + jnp.arange(E, dtype=jnp.int32)
    quad_roll = jnp.roll(quad, -1, axis=1)
    faces = jnp.stack(
        (quad, quad_roll, jnp.repeat(center_idx[:, None], 4, axis=1)), axis=-1
    ).reshape(E * 4, 3)
    face_mask = jnp.repeat(quad_ok, 4)
    faces = jnp.where(face_mask[:, None], faces, 0)

    mesh = TriangleMesh(vertices=all_verts, indices=faces, face_mask=face_mask)
    return ExtractedMesh(
        mesh=mesh,
        l_dev=l_dev,
        num_surf_cubes=num_surf_cubes,
        num_surf_edges=num_surf_edges,
    )


def sdf_entropy(grid: FlexiCubesGrid, sdf: jnp.ndarray) -> jnp.ndarray:
    """BCE consistency of SDF logits across sign-change edges
    (_flexicubes.py:715-726)."""
    rx, ry, rz = grid.resolution
    V = grid.num_vertices
    sdf = sdf.reshape(V)
    occ = sdf < 0
    vidx = jnp.arange(V, dtype=jnp.int32)
    vx = vidx % (rx + 1)
    vy = (vidx // (rx + 1)) % (ry + 1)
    vz = vidx // ((rx + 1) * (ry + 1))
    in_bounds = jnp.stack((vx < rx, vy < ry, vz < rz), axis=0)
    # neighbor values via SHIFTED SLICES, not a gather: sdf[vidx + stride]
    # is a contiguous shift, and the [3V] single-element-row gather ran at
    # 0.43 GiB/s (143 ms/step) in the round-4 op trace
    shift = lambda s: jnp.concatenate(
        [sdf[s:], jnp.broadcast_to(sdf[-1], (s,))]
    )
    sb = jnp.stack([shift(int(s)) for s in (1, rx + 1, (rx + 1) * (ry + 1))])
    change = in_bounds & (occ[None, :] != (sb < 0))

    sa = jnp.broadcast_to(sdf[None, :], (3, V))

    def bce_logits(x, t):
        return jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))

    per = bce_logits(sa, (sb > 0).astype(sdf.dtype)) + bce_logits(
        sb, (sa > 0).astype(sdf.dtype)
    )
    cnt = jnp.maximum(change.sum(), 1)
    return jnp.where(change, per, 0.0).sum() / cnt
