"""Differentiable triangle rasterization — the nvdiffrast replacement.

Covers the reference's uses of ``dr.rasterize``/``DepthPeeler`` (first layer
only, ``geosplat_defer.py:194-209``, ``_triangle_mesh.py:517-549``) and
``dr.interpolate`` (``_triangle_mesh.py:84-107``): z-buffer triangle raster
producing perspective-correct barycentrics + triangle ids, and attribute
interpolation with gradients into vertices and attributes.

TPU-native shape: the same static tile-binning frontend as the Gaussian
rasterizer (triangles bin by screen bbox, one lexicographic sort), then a
dense per-tile edge-function test with an argmin-by-depth z-resolve — no
per-pixel loops, no atomics. Gradients flow through the barycentric math of
the winning triangle (winner index is stop-gradient, as in nvdiffrast).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..graphics.cameras import Cameras
from ..graphics.mesh import TriangleMesh


class RasterOut(NamedTuple):
    tri_id: jnp.ndarray   # [H, W] int32, -1 = background
    bary: jnp.ndarray     # [H, W, 2] perspective-correct (u, v); w = 1-u-v
    depth: jnp.ndarray    # [H, W] camera-space z (0 at background)


def _project_vertices(mesh: TriangleMesh, camera: Cameras):
    vm = camera.view_matrix
    v_cam = mesh.vertices @ vm[:3, :3].T + vm[:3, 3]
    z = v_cam[:, 2]
    k = camera.intrinsic_matrix
    rz = 1.0 / jnp.maximum(z, 1e-8)
    px = k[0, 0] * v_cam[:, 0] * rz + k[0, 2]
    py = k[1, 1] * v_cam[:, 1] * rz + k[1, 2]
    return jnp.stack((px, py), -1), z


def rasterize_mesh(
    mesh: TriangleMesh,
    camera: Cameras,
    *,
    tile_size: int = 16,
    tile_capacity: int = 256,
    pairs_per_triangle: int = 16,
    tile_chunk: int = 8,
    cull_backface: bool = False,
) -> RasterOut:
    width, height = camera.width, camera.height
    xy, z = _project_vertices(mesh, camera)
    faces = mesh.indices
    fmask = mesh.face_mask_or_ones()
    f = faces.shape[0]

    p0, p1, p2 = xy[faces[:, 0]], xy[faces[:, 1]], xy[faces[:, 2]]
    z0, z1, z2 = z[faces[:, 0]], z[faces[:, 1]], z[faces[:, 2]]
    front = (z0 > camera.near) & (z1 > camera.near) & (z2 > camera.near)
    valid = fmask & front

    area2 = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (
        p1[:, 1] - p0[:, 1]
    ) * (p2[:, 0] - p0[:, 0])
    if cull_backface:
        valid = valid & (area2 < 0)  # +z-forward/y-down: CCW world faces wind negative
    valid = valid & (jnp.abs(area2) > 1e-12)

    # --- bin triangles by bbox, near-depth-sorted within a tile -------------
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    num_tiles = tw * th
    bx0 = jnp.minimum(jnp.minimum(p0[:, 0], p1[:, 0]), p2[:, 0])
    by0 = jnp.minimum(jnp.minimum(p0[:, 1], p1[:, 1]), p2[:, 1])
    bx1 = jnp.maximum(jnp.maximum(p0[:, 0], p1[:, 0]), p2[:, 0])
    by1 = jnp.maximum(jnp.maximum(p0[:, 1], p1[:, 1]), p2[:, 1])
    tx0 = jnp.clip(jnp.floor(bx0 / tile_size), 0, tw).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(by0 / tile_size), 0, th).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil(bx1 / tile_size), 0, tw).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil(by1 / tile_size), 0, th).astype(jnp.int32)
    bw = jnp.maximum(tx1 - tx0, 0)
    bh = jnp.maximum(ty1 - ty0, 0)
    ntiles = jnp.where(valid, bw * bh, 0)

    max_pairs = max(int(pairs_per_triangle) * f, 1 << 12)
    offsets = jnp.cumsum(ntiles)
    total = offsets[-1]
    starts = offsets - ntiles
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    fid = jnp.searchsorted(offsets, slot, side="right", method="sort").astype(
        jnp.int32
    )
    fid = jnp.minimum(fid, f - 1)
    local = slot - starts[fid]
    w_g = jnp.maximum(bw[fid], 1)
    tile = (ty0[fid] + local // w_g) * tw + (tx0[fid] + local % w_g)
    in_range = slot < jnp.minimum(total, max_pairs)
    tile = jnp.where(in_range, tile, num_tiles)
    zmin = jnp.minimum(jnp.minimum(z0, z1), z2)
    depth_key = jnp.where(
        in_range,
        jax.lax.bitcast_convert_type(zmin[fid], jnp.int32),
        jnp.iinfo(jnp.int32).max,
    )
    s_tile, _, s_fid = jax.lax.sort((tile, depth_key, fid), dimension=0, num_keys=2)
    tr = jnp.arange(num_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(s_tile, tr, side="left", method="sort")
    counts = jnp.searchsorted(s_tile, tr, side="right", method="sort") - seg_start
    kk = jnp.arange(tile_capacity, dtype=jnp.int32)
    idx = seg_start[:, None] + kk[None, :]
    in_seg = kk[None, :] < counts[:, None]
    tile_fid = jnp.where(
        in_seg, s_fid[jnp.clip(idx, 0, max_pairs - 1)], -1
    ).astype(jnp.int32)  # [T, K]

    # --- per-tile z-resolve ---------------------------------------------------
    r = jnp.arange(tile_size, dtype=jnp.float32) + 0.5
    pyg, pxg = jnp.meshgrid(r, r, indexing="ij")
    pix_local = jnp.stack((pxg.reshape(-1), pyg.reshape(-1)), -1)  # [P, 2]
    ty, tx = jnp.meshgrid(jnp.arange(th), jnp.arange(tw), indexing="ij")
    tile_origin = jnp.stack(
        (tx.reshape(-1) * tile_size, ty.reshape(-1) * tile_size), -1
    ).astype(jnp.float32)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_fn(args):
        fids, origin = args                     # [C, K], [C, 2]
        safe = jnp.maximum(fids, 0)
        live = fids >= 0
        a = p0[safe]                             # [C, K, 2]
        b = p1[safe]
        c = p2[safe]
        za, zb, zc = z0[safe], z1[safe], z2[safe]
        pix = origin[:, None, :] + pix_local[None, :, :]  # [C, P, 2]

        def edge(q0, q1):
            return (
                (q1[..., None, 0] - q0[..., None, 0])
                * (pix[:, None, :, 1] - q0[..., None, 1])
                - (q1[..., None, 1] - q0[..., None, 1])
                * (pix[:, None, :, 0] - q0[..., None, 0])
            )  # [C, K, P]

        w0 = edge(b, c)   # weight for vertex a
        w1 = edge(c, a)   # for b
        w2 = edge(a, b)   # for c
        det = w0 + w1 + w2
        inside = (
            ((w0 >= 0) & (w1 >= 0) & (w2 >= 0))
            | ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
        ) & (jnp.abs(det) > 1e-12) & live[:, :, None]
        det_safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        l0 = w0 / det_safe
        l1 = w1 / det_safe
        l2 = w2 / det_safe
        # perspective-correct: interpolate 1/z linearly in screen space
        inv_z = (
            l0 / jnp.maximum(za[:, :, None], 1e-8)
            + l1 / jnp.maximum(zb[:, :, None], 1e-8)
            + l2 / jnp.maximum(zc[:, :, None], 1e-8)
        )
        zpix = 1.0 / jnp.maximum(inv_z, 1e-12)
        zkey = jnp.where(inside, zpix, jnp.inf)
        best = jnp.argmin(zkey, axis=1)          # [C, P]
        best_sg = jax.lax.stop_gradient(best)
        take = lambda arr: jnp.take_along_axis(arr, best_sg[:, None, :], axis=1)[:, 0]  # noqa: E731
        hit = take(inside)
        # perspective-correct barycentrics of the winner
        li0, li1 = take(l0), take(l1)
        li2 = 1.0 - li0 - li1
        zz0, zz1, zz2 = take(za[..., None] * jnp.ones_like(l0)), take(
            zb[..., None] * jnp.ones_like(l0)
        ), take(zc[..., None] * jnp.ones_like(l0))
        d0 = li0 / jnp.maximum(zz0, 1e-8)
        d1 = li1 / jnp.maximum(zz1, 1e-8)
        d2 = li2 / jnp.maximum(zz2, 1e-8)
        denom = jnp.maximum(d0 + d1 + d2, 1e-12)
        u = d0 / denom
        v = d1 / denom
        zp = take(zpix)
        tri = jnp.take_along_axis(jnp.maximum(fids, 0)[:, :, None] * jnp.ones_like(best_sg)[:, None, :], best_sg[:, None, :], axis=1)[:, 0]
        tri = jnp.where(hit, tri, -1)
        return (
            tri.astype(jnp.int32),
            jnp.where(hit[..., None], jnp.stack((u, v), -1), 0.0),
            jnp.where(hit, zp, 0.0),
        )

    pad = (-num_tiles) % tile_chunk
    fid_p = jnp.concatenate(
        [tile_fid, -jnp.ones((pad, tile_capacity), jnp.int32)]
    )
    org_p = jnp.concatenate([tile_origin, jnp.zeros((pad, 2))])
    tri_t, bary_t, z_t = jax.lax.map(
        chunk_fn,
        (
            fid_p.reshape(-1, tile_chunk, tile_capacity),
            org_p.reshape(-1, tile_chunk, 2),
        ),
    )
    flat = lambda x: x.reshape((-1,) + x.shape[2:])[:num_tiles]  # noqa: E731

    def to_img(tiles):
        ch = tiles.shape[-1] if tiles.ndim == 3 else None
        t2 = tiles.reshape(th, tw, tile_size, tile_size, -1)
        img = t2.transpose(0, 2, 1, 3, 4).reshape(
            th * tile_size, tw * tile_size, -1
        )[:height, :width]
        return img if ch else img[..., 0]

    return RasterOut(
        tri_id=to_img(flat(tri_t)),
        bary=to_img(flat(bary_t)),
        depth=to_img(flat(z_t)),
    )


def interpolate(
    attrs: jnp.ndarray,     # [V, C]
    mesh: TriangleMesh,
    out: RasterOut,
) -> jnp.ndarray:
    """Per-pixel attribute interpolation (dr.interpolate): [H, W, C]."""
    safe_tri = jnp.maximum(out.tri_id, 0)
    fv = mesh.indices[safe_tri]                # [H, W, 3]
    a0 = attrs[fv[..., 0]]
    a1 = attrs[fv[..., 1]]
    a2 = attrs[fv[..., 2]]
    u = out.bary[..., 0:1]
    v = out.bary[..., 1:2]
    val = a0 * u + a1 * v + a2 * (1.0 - u - v)
    return jnp.where((out.tri_id >= 0)[..., None], val, 0.0)


def antialias(
    color: jnp.ndarray,        # [H, W, C] rendered colors (bg already blended)
    mesh: TriangleMesh,
    camera: Cameras,
    rast: RasterOut,
) -> jnp.ndarray:
    """Analytic edge antialiasing — the ``dr.antialias`` analog
    (_triangle_mesh.py:553-556).

    At every horizontally/vertically adjacent pixel pair whose triangle ids
    differ (a silhouette or occlusion boundary), find where the nearer
    triangle's screen-space edge crosses the segment between the two pixel
    centers and blend the colors by the crossing position. The blend weight
    is differentiable in the projected vertex positions, which is the whole
    point: hard rasterization has zero gradient through coverage, and this
    term restores it for mesh-silhouette optimization.

    Approximation notes vs nvdiffrast: all three edges of the nearer
    triangle are tested and the crossing closest to the midpoint is used
    (nvdiffrast picks the true silhouette edge via adjacency); pairs whose
    edges don't cross the segment are left unblended.
    """
    xy, _ = _project_vertices(mesh, camera)            # [V, 2]
    h, w = rast.tri_id.shape
    tri = rast.tri_id

    def edge_blend(axis: int, img: jnp.ndarray) -> jnp.ndarray:
        # pixel pair (p, q) = (i, i+1) along `axis`
        sl_p = (slice(None), slice(0, -1)) if axis == 1 else (slice(0, -1),)
        sl_q = (slice(None), slice(1, None)) if axis == 1 else (slice(1, None),)
        t_p, t_q = tri[sl_p], tri[sl_q]
        d_p, d_q = rast.depth[sl_p], rast.depth[sl_q]
        boundary = t_p != t_q
        # nearer triangle owns the edge (background depth 0 counts as far)
        dp_eff = jnp.where(t_p >= 0, d_p, jnp.inf)
        dq_eff = jnp.where(t_q >= 0, d_q, jnp.inf)
        p_nearer = dp_eff <= dq_eff
        own = jnp.where(p_nearer, t_p, t_q)
        own = jnp.maximum(own, 0)
        fv = mesh.indices[own]                          # [..., 3]
        v0, v1, v2 = xy[fv[..., 0]], xy[fv[..., 1]], xy[fv[..., 2]]

        # pixel-center coordinates of p; q is +1 along `axis`
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32) + 0.5,
            jnp.arange(w, dtype=jnp.float32) + 0.5, indexing="ij",
        )
        px, py = xs[sl_p], ys[sl_p]
        # crossing parameter t in [0, 1] along p->q for each triangle edge
        coord = 0 if axis == 1 else 1        # moving coordinate
        fixed = 1 - coord
        pf = py if axis == 1 else px         # fixed coordinate value
        pm = px if axis == 1 else py         # moving coordinate value

        def crossing(a, b):
            # edge a->b crossing the line fixed-coord == pf. Only edges
            # steeper along the fixed axis blend in this pass (the other
            # pass owns shallow edges) — otherwise slanted edges would be
            # corrected twice.
            af, bf = a[..., fixed], b[..., fixed]
            am, bm = a[..., coord], b[..., coord]
            denom = bf - af
            steep = jnp.abs(denom) >= jnp.abs(bm - am)
            s = (pf - af) / jnp.where(jnp.abs(denom) > 1e-8, denom, 1e-8)
            hits = (s >= 0.0) & (s <= 1.0) & (jnp.abs(denom) > 1e-8) & steep
            x = am + s * (bm - am)
            t = x - pm                        # 0 at p-center, 1 at q-center
            return jnp.where(hits & (t >= 0.0) & (t <= 1.0), t, jnp.nan)

        ts = jnp.stack(
            [crossing(v0, v1), crossing(v1, v2), crossing(v2, v0)], axis=0
        )
        # the crossing closest to the pair midpoint wins
        score = jnp.where(jnp.isnan(ts), jnp.inf, jnp.abs(ts - 0.5))
        pick = jnp.argmin(score, axis=0)
        t_edge = jnp.take_along_axis(ts, pick[None], axis=0)[0]
        has_edge = boundary & jnp.isfinite(t_edge)
        t_edge = jnp.where(has_edge, t_edge, 0.5)

        # coverage transfer: the pixel whose half-segment the edge crosses
        # mixes in the neighbor's color by the encroached fraction
        # (nvdiffrast's alpha in [-0.5, 0.5])
        c_p, c_q = img[sl_p], img[sl_q]
        w_pq = jnp.clip(0.5 - t_edge, -0.5, 0.5)[..., None]
        blend_p = jnp.where(
            has_edge[..., None] & (w_pq > 0), w_pq * (c_q - c_p), 0.0
        )
        blend_q = jnp.where(
            has_edge[..., None] & (w_pq < 0), (-w_pq) * (c_p - c_q), 0.0
        )
        if axis == 1:
            out = img + jnp.pad(blend_p, ((0, 0), (0, 1), (0, 0))) \
                + jnp.pad(blend_q, ((0, 0), (1, 0), (0, 0)))
        else:
            out = img + jnp.pad(blend_p, ((0, 1), (0, 0), (0, 0))) \
                + jnp.pad(blend_q, ((1, 0), (0, 0), (0, 0)))
        return out

    out = edge_blend(1, color)
    out = edge_blend(0, out)
    return out
