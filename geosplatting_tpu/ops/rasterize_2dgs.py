"""2D Gaussian Splatting rasterization (ray-splat intersection).

Functional replacement for gsplat's ``rasterization_2dgs`` as consumed at
``rfstudio/model/gsplat.py:216-261``: each Gaussian is a flat oriented disk;
instead of EWA-projecting a 3D covariance, every pixel ray is intersected
with the splat plane and the Gaussian is evaluated at the intersection's
(u, v) splat coordinates (Huang et al., "2D Gaussian Splatting", 2024).
Outputs: color (+ expected depth), alpha, rendered normals, depth-derived
pseudo normals, a per-pixel distortion loss map, and median depth — plus the
screen-space densification gradient hook (``info['gradient_2dgs']`` analog).

TPU-first shape: the splat-to-pixel transform is computed as 9 per-Gaussian
[N] columns (batched [N, 3, 3] matrix algebra lane-pads badly on TPU — see
ops/projection.py), binning reuses the shared (tile, depth) sort frontend
from ``rasterize.py``, and compositing is a dense per-tile [K, P] evaluation
with an exclusive log-transmittance cumsum, differentiated by XLA autodiff
(2DGS is a secondary model family; the hot stage-1/2/3 paths use the
hand-written pair kernels in ``rasterize_pairs.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..graphics import gmath
from .projection import Projected
from .rasterize import (
    MAX_ALPHA, MIN_ALPHA, TRANSMITTANCE_EPS, _tile_pixel_grid, _tiles_to_image,
    bin_gaussians,
)

# screen-space low-pass: rho2d = FILTER_INV_SQUARE * |pix - mean2d|^2,
# the official 2DGS kernel's degenerate-view guard
FILTER_INV_SQUARE = 2.0
# truncation: alpha >= MIN_ALPHA can extend to sqrt(-2 ln(1/255)) ~ 3.33
# sigma for opacity 1, so bound the screen AABB at 3.4 sigma (golden tests
# compare against an untruncated brute force)
SIGMA_BOUND = 3.4
# low-pass support: FILTER_INV_SQUARE * d^2 = -2 ln(MIN_ALPHA) at d ~ 2.36 px
LOWPASS_RADIUS = 2.4


def project_2dgs(
    means: jnp.ndarray,      # [N, 3]
    quats: jnp.ndarray,      # [N, 4] wxyz (normalized)
    scales: jnp.ndarray,     # [N, >=2] linear; first two are the disk axes
    viewmat: jnp.ndarray,    # [4, 4] world->camera (+z forward)
    K: jnp.ndarray,          # [3, 3]
    width: int,
    height: int,
    *,
    near: float = 0.01,
    far: float = 1e10,
):
    """Returns (record [N, 17], center2d [N, 2], depths [N], radii [N] int32).

    record columns: T rows (9) | z-row (3) | camera-space normal (3) |
    center2d (2). T maps splat-plane homogeneous (u, v, 1) to pixel
    homogeneous coordinates; the z-row gives camera depth at (u, v)."""
    rw = viewmat[:3, :3]
    tvec = viewmat[:3, 3]
    r = gmath.quat2rot(quats)                    # [N, 3, 3] columns = axes
    # camera-space tangent axes and normal (columns of view_R @ R)
    m1 = (r[:, :, 0] @ rw.T) * scales[:, 0:1]    # [N, 3]
    m2 = (r[:, :, 1] @ rw.T) * scales[:, 1:2]
    n_cam = r[:, :, 2] @ rw.T                    # [N, 3]
    m3 = means @ rw.T + tvec                     # [N, 3] center in camera
    z = m3[:, 2]

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    # T rows (pixel-homog = T @ (u, v, 1)); per-column math, no [N,3,3] algebra
    t00 = fx * m1[:, 0] + cx * m1[:, 2]
    t01 = fx * m2[:, 0] + cx * m2[:, 2]
    t02 = fx * m3[:, 0] + cx * m3[:, 2]
    t10 = fy * m1[:, 1] + cy * m1[:, 2]
    t11 = fy * m2[:, 1] + cy * m2[:, 2]
    t12 = fy * m3[:, 1] + cy * m3[:, 2]
    t20 = m1[:, 2]
    t21 = m2[:, 2]
    t22 = m3[:, 2]

    # screen AABB from the dual conic of the SIGMA_BOUND-sigma disk boundary:
    # D = T diag(1, 1, -1/s^2) T^T; tangent verticals at
    # x = (D02 +- sqrt(D02^2 - D00 D22)) / D22
    s2 = SIGMA_BOUND * SIGMA_BOUND
    d22 = t20 * t20 + t21 * t21 - t22 * t22 / s2
    d02 = t00 * t20 + t01 * t21 - t02 * t22 / s2
    d12 = t10 * t20 + t11 * t21 - t12 * t22 / s2
    d00 = t00 * t00 + t01 * t01 - t02 * t02 / s2
    d11 = t10 * t10 + t11 * t11 - t12 * t12 / s2
    bounded = d22 < -1e-9                        # ellipse fully in front
    d22_safe = jnp.where(bounded, d22, -1.0)
    ctr_x = d02 / d22_safe
    ctr_y = d12 / d22_safe
    half_x = jnp.sqrt(jnp.maximum(d02 * d02 - d00 * d22_safe, 0.0)) / -d22_safe
    half_y = jnp.sqrt(jnp.maximum(d12 * d12 - d11 * d22_safe, 0.0)) / -d22_safe

    # projected splat center (low-pass anchor + densification statistic)
    t22_safe = jnp.where(jnp.abs(t22) > 1e-8, t22, 1e-8)
    mean2d = jnp.stack((t02 / t22_safe, t12 / t22_safe), axis=-1)

    # the binning box must cover the 3.4-sigma ellipse AND the low-pass disk
    # around the projected mean
    center2d = jnp.stack((ctr_x, ctr_y), axis=-1)
    shift = jnp.max(jnp.abs(center2d - mean2d), axis=-1)
    radius = jnp.ceil(
        jnp.maximum(jnp.maximum(half_x, half_y), shift + LOWPASS_RADIUS)
    )
    inside = (
        (ctr_x + radius > 0) & (ctr_x - radius < width)
        & (ctr_y + radius > 0) & (ctr_y - radius < height)
    )
    valid = bounded & (z > near) & (z < far) & inside & (radius > 0)
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)

    # orient the splat normal toward the viewer (camera at origin): the
    # normal loss compares it against depth-derived pseudo normals which are
    # always viewer-facing
    facing_away = jnp.sum(n_cam * m3, axis=-1, keepdims=True) > 0
    n_cam = jnp.where(facing_away, -n_cam, n_cam)

    record = jnp.stack(
        (t00, t01, t02, t10, t11, t12, t20, t21, t22,
         m1[:, 2], m2[:, 2], m3[:, 2]),
        axis=-1,
    )
    record = jnp.concatenate((record, n_cam, mean2d), axis=-1)  # [N, 17]
    return record, center2d, z, radii


def composite_tiles_2dgs(
    tile_gid: jnp.ndarray,     # [T, K]
    tile_origin: jnp.ndarray,  # [T, 2]
    record: jnp.ndarray,       # [N, 17]
    opacities: jnp.ndarray,    # [N]
    colors: jnp.ndarray,       # [N, C]
    offset2d: jnp.ndarray,     # [N, 2] densification gradient hook (zeros)
    *,
    near: float,
    tile_size: int,
    tile_chunk: int = 4,
):
    """Per-tile composite. Returns dict of [T, P, ...] accumulations."""
    pix_local = _tile_pixel_grid(tile_size)  # [P, 2]
    packed = jnp.concatenate(
        (record, opacities[:, None], offset2d, colors), axis=-1
    )                                        # [N, 20 + C]

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_fn(args):
        gid, origin = args                   # [Ct, K], [Ct, 2]
        safe = jnp.maximum(gid, 0)
        live = gid >= 0                      # [Ct, K]
        rec = packed[safe]                   # [Ct, K, 20 + C]
        t0 = rec[..., 0:3]                   # rows of T
        t1 = rec[..., 3:6]
        t2 = rec[..., 6:9]
        zrow = rec[..., 9:12]
        n_cam = rec[..., 12:15]
        c2d = rec[..., 15:17]
        op = rec[..., 17]
        off = rec[..., 18:20]
        col = rec[..., 20:]

        pix = origin[:, None, :] + pix_local[None, :, :]      # [Ct, P, 2]
        # shifting the splat by +off on screen == evaluating at pix - off
        px = pix[:, None, :, 0] - off[:, :, None, 0]          # [Ct, K, P]
        py = pix[:, None, :, 1] - off[:, :, None, 1]

        # ray-splat intersection via homogeneous plane cross product:
        # h_u = T0 - px T2, h_v = T1 - py T2, s = h_u x h_v, (u,v) = s.xy/s.z
        hu = t0[:, :, None, :] - px[..., None] * t2[:, :, None, :]
        hv = t1[:, :, None, :] - py[..., None] * t2[:, :, None, :]
        sx = hu[..., 1] * hv[..., 2] - hu[..., 2] * hv[..., 1]
        sy = hu[..., 2] * hv[..., 0] - hu[..., 0] * hv[..., 2]
        sz = hu[..., 0] * hv[..., 1] - hu[..., 1] * hv[..., 0]
        sz_safe = jnp.where(jnp.abs(sz) > 1e-9, sz, 1e-9)
        u = sx / sz_safe
        v = sy / sz_safe
        rho3d = u * u + v * v
        dx2 = pix[:, None, :, 0] - c2d[:, :, None, 0] - off[:, :, None, 0]
        dy2 = pix[:, None, :, 1] - c2d[:, :, None, 1] - off[:, :, None, 1]
        rho2d = FILTER_INV_SQUARE * (dx2 * dx2 + dy2 * dy2)
        rho = jnp.minimum(rho3d, rho2d)

        zdep = zrow[..., 0:1] * u + zrow[..., 1:2] * v + zrow[..., 2:3]

        alpha = jnp.minimum(op[..., None] * jnp.exp(-0.5 * rho), MAX_ALPHA)
        keep = (alpha >= MIN_ALPHA) & (zdep > near) & live[:, :, None]
        alpha = jnp.where(keep, alpha, 0.0)

        log_t = jnp.cumsum(jnp.log1p(-alpha), axis=1)         # inclusive
        t_excl = jnp.exp(log_t - jnp.log1p(-alpha))
        w = alpha * t_excl
        w = jnp.where(t_excl > TRANSMITTANCE_EPS, w, 0.0)

        out_c = jnp.einsum("tkp,tkc->tpc", w, col)
        out_a = jnp.sum(w, axis=1)
        out_d = jnp.sum(w * zdep, axis=1)
        out_n = jnp.einsum("tkp,tkc->tpc", w, n_cam)

        # distortion (Mip-NeRF-360 pairwise |m_i - m_j|, front-to-back form):
        # 2 * sum_i w_i (m_i A_{i-1} - D_{i-1}), m = NDC-ish depth in [0, 1)
        m = jnp.where(keep, 1.0 - near / jnp.maximum(zdep, near), 0.0)
        a_incl = jnp.cumsum(w, axis=1)
        d_incl = jnp.cumsum(w * m, axis=1)
        out_dist = jnp.sum(
            2.0 * w * (m * (a_incl - w) - (d_incl - w * m)), axis=1
        )

        # median depth: z of the first pair whose inclusive weight crosses 0.5
        reached = a_incl >= 0.5
        first = reached & jnp.logical_not(
            jnp.pad(reached[:, :-1], ((0, 0), (1, 0), (0, 0)))
        )
        out_med = jnp.sum(jnp.where(first, zdep, 0.0), axis=1)
        return out_c, out_a, out_d, out_n, out_dist, out_med

    num_tiles = tile_gid.shape[0]
    pad = (-num_tiles) % tile_chunk
    gid_p = jnp.concatenate(
        [tile_gid, -jnp.ones((pad,) + tile_gid.shape[1:], jnp.int32)]
    )
    org_p = jnp.concatenate([tile_origin, jnp.zeros((pad, 2))])
    outs = jax.lax.map(
        chunk_fn,
        (
            gid_p.reshape(-1, tile_chunk, tile_gid.shape[1]),
            org_p.reshape(-1, tile_chunk, 2),
        ),
    )
    flat = lambda x: x.reshape((-1,) + x.shape[2:])[:num_tiles]  # noqa: E731
    return tuple(flat(o) for o in outs)


def depth_to_camera_normals(
    depth: jnp.ndarray, alpha: jnp.ndarray, K: jnp.ndarray
) -> jnp.ndarray:
    """Pseudo-normals [H, W, 3] from an expected-depth map by finite
    differences of back-projected camera-space positions (the
    ``render_normals_from_depth`` output of gsplat's 2DGS)."""
    h, w = depth.shape[:2]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = depth[..., 0]
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 - cx) / fx
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 - cy) / fy
    p = jnp.stack(
        (xs[None, :] * z, ys[:, None] * z, z), axis=-1
    )                                              # [H, W, 3] camera space
    ddx = jnp.roll(p, -1, axis=1) - jnp.roll(p, 1, axis=1)
    ddy = jnp.roll(p, -1, axis=0) - jnp.roll(p, 1, axis=0)
    n = jnp.cross(ddx, ddy)
    n = gmath.safe_normalize(n)
    # orient toward the viewer (camera at origin, +z forward => n.z < 0)
    n = jnp.where(jnp.sum(n * p, -1, keepdims=True) > 0, -n, n)
    return jnp.where(alpha > 1e-3, n, 0.0)


def rasterize_2dgs(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,       # linear scales (already exp'ed)
    opacities: jnp.ndarray,    # [N] in [0, 1]
    colors: jnp.ndarray,       # [N, C] or [N, K_sh, 3] with sh_degree
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    *,
    near: float = 0.01,
    far: float = 1e10,
    sh_degree: int | None = None,
    tile_size: int = 16,
    tile_capacity: int = 1024,
    pairs_per_gaussian: int = 8,
    render_mode: str = "RGB+ED",
    offset2d: jnp.ndarray | None = None,
    tile_chunk: int = 4,
):
    """gsplat ``rasterization_2dgs`` contract (rfstudio/model/gsplat.py:216).

    Returns (render [H,W,C(+1)], alpha [H,W,1], normals [H,W,3],
    normals_from_depth [H,W,3], distort [H,W,1], median_depth [H,W,1], info).
    Gradients w.r.t. ``offset2d`` (zeros, [N, 2]) are the screen-space
    densification signal (``info['gradient_2dgs']``)."""
    n = means.shape[0]
    record, center2d, depths, radii = project_2dgs(
        means, quats, scales, viewmat, K, width, height, near=near, far=far
    )
    if offset2d is None:
        offset2d = jnp.zeros((n, 2), means.dtype)

    if sh_degree is not None:
        campos = -viewmat[:3, :3].T @ viewmat[:3, 3]
        viewdir = gmath.safe_normalize(means - campos)
        colors = jnp.maximum(gmath.eval_sh(sh_degree, colors, viewdir) + 0.5, 0.0)

    max_pairs = max(int(pairs_per_gaussian) * n, 1 << 12)
    proj = Projected(
        means2d=center2d, depths=depths, conics=jnp.zeros((n, 3)),
        opacities=opacities, radii=radii,
    )
    bins = bin_gaussians(
        proj, width, height, tile_size=tile_size, max_pairs=max_pairs,
        tile_capacity=tile_capacity, near=near, far=far,
    )
    tw, th = bins.num_tiles_xy
    ty, tx = jnp.meshgrid(jnp.arange(th), jnp.arange(tw), indexing="ij")
    tile_origin = jnp.stack(
        (tx.reshape(-1) * tile_size, ty.reshape(-1) * tile_size), axis=-1
    ).astype(jnp.float32)

    tiles = composite_tiles_2dgs(
        bins.tile_gid, tile_origin, record, opacities, colors, offset2d,
        near=near, tile_size=tile_size, tile_chunk=tile_chunk,
    )
    t_c, t_a, t_d, t_n, t_dist, t_med = tiles
    img_c = _tiles_to_image(t_c, tw, th, tile_size, height, width)
    img_a = _tiles_to_image(t_a[..., None], tw, th, tile_size, height, width)
    img_d = _tiles_to_image(t_d[..., None], tw, th, tile_size, height, width)
    img_n = _tiles_to_image(t_n, tw, th, tile_size, height, width)
    img_dist = _tiles_to_image(t_dist[..., None], tw, th, tile_size, height, width)
    img_med = _tiles_to_image(t_med[..., None], tw, th, tile_size, height, width)

    ed = img_d / jnp.maximum(img_a, 1e-10)
    if render_mode == "RGB":
        render = img_c
    elif render_mode in ("ED", "D"):
        render = ed if render_mode == "ED" else img_d
    elif render_mode in ("RGB+ED", "RGB+D"):
        render = jnp.concatenate(
            [img_c, ed if render_mode == "RGB+ED" else img_d], -1
        )
    else:
        raise ValueError(f"unknown render_mode: {render_mode}")

    normals_from_depth = depth_to_camera_normals(ed, img_a, K)
    info = {
        "means2d": record[:, 15:17],
        "center2d": center2d,
        "radii": radii,
        "depths": depths,
        "total_pairs": bins.total_pairs,
        "max_pairs": max_pairs,
    }
    return render, img_a, img_n, normals_from_depth, img_dist, img_med, info
