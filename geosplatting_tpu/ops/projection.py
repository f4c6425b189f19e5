"""3D Gaussian -> 2D screen-space projection (EWA splatting) for the rasterizer.

Replicates the projection stage of gsplat's ``rasterization`` (the contract
consumed at ``rfstudio/model/gsplat.py:129-183``): world->camera transform,
perspective projection of means, EWA 2D covariance with a 0.3px low-pass,
'antialiased' opacity compensation, eigenvalue-based screen radius, and
frustum culling. Pure jnp; batched over all N Gaussians at once (MXU-sized
matmuls, no per-Gaussian control flow).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..graphics import gmath

LOWPASS = 0.3
ALPHA_CUTOFF = 0.999
MIN_ALPHA = 1.0 / 255.0


class Projected(NamedTuple):
    means2d: jnp.ndarray   # [N, 2] pixel coords
    depths: jnp.ndarray    # [N]
    conics: jnp.ndarray    # [N, 3] inverse cov2d (a, b, c) for axx+2bxy+cyy
    opacities: jnp.ndarray # [N] post-compensation opacities
    radii: jnp.ndarray     # [N] int32 screen radius (0 = culled)
    # Opacity-aware tight bounds (None when constructed by callers that only
    # have a circular radius, e.g. 2DGS — binning then falls back to radii).
    # extents: per-axis half-widths of the alpha >= MIN_ALPHA region, clipped
    # to the canonical 3-sigma radius. prune_r: sound circular bound on the
    # same region (NOT clipped — the 3-sigma *square*'s corners reach
    # sqrt(2) x radius and do contribute when opacity is high). Everything a
    # tile-rect test or a center-distance test discards against these bounds
    # is provably below the rasterizer's MIN_ALPHA keep-cutoff, so tighter
    # binning is bit-exact with radius binning.
    extents: jnp.ndarray | None = None  # [N, 2] float32 px
    prune_r: jnp.ndarray | None = None  # [N] float32 px


def project(
    means: jnp.ndarray,       # [N, 3]
    quats: jnp.ndarray,       # [N, 4] wxyz
    scales: jnp.ndarray,      # [N, 3] linear (already exp'ed)
    opacities: jnp.ndarray,   # [N]
    viewmat: jnp.ndarray,     # [4, 4] world->camera (+z forward)
    K: jnp.ndarray,           # [3, 3]
    width: int,
    height: int,
    *,
    near: float = 0.01,
    far: float = 1e10,
    rasterize_mode: str = "classic",
    radius_clip: float = 0.0,
    lim_override: tuple | None = None,
) -> Projected:
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = means @ R.T + t                      # [N, 3]
    z = p_cam[:, 2]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    rz = 1.0 / jnp.maximum(jnp.abs(z), 1e-8) * jnp.sign(z + 1e-30)
    mean2d = jnp.stack(
        (fx * p_cam[:, 0] * rz + cx, fy * p_cam[:, 1] * rz + cy), axis=-1
    )

    # EWA: cov2d = J W Cov3d W^T J^T — fully unrolled [N]-column math.
    # [N, 3, 3] batched einsums are poison on TPU (3-wide trailing dims pad to
    # 128 lanes and the batch matmuls don't tile onto the MXU); per-entry
    # vectors keep everything in dense fused VPU ops.
    q = gmath.safe_normalize(quats)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    rot = ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))
    # B = W @ R_q per gaussian (W = world->cam rotation, scalar entries)
    B = tuple(
        tuple(
            R[i, 0] * rot[0][j] + R[i, 1] * rot[1][j] + R[i, 2] * rot[2][j]
            for j in range(3)
        )
        for i in range(3)
    )
    s2 = (scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2)

    def sig(i, k):  # Σ_cam[i, k] = Σ_j B[i,j] B[k,j] s_j²
        return sum(B[i][j] * B[k][j] * s2[j] for j in range(3))

    # clamp the tangent-plane coords to slightly outside the frustum (gsplat);
    # image-sharded rendering overrides with the full-image limits so bands
    # reproduce the single-device result exactly
    if lim_override is not None:
        lim_x, lim_y = lim_override
    else:
        lim_x = 1.3 * (0.5 * width / fx + jnp.abs(cx / fx - 0.5 * width / fx))
        lim_y = 1.3 * (0.5 * height / fy + jnp.abs(cy / fy - 0.5 * height / fy))
    tx = z * jnp.clip(p_cam[:, 0] * rz, -lim_x, lim_x)
    ty = z * jnp.clip(p_cam[:, 1] * rz, -lim_y, lim_y)

    u = fx * rz
    v = fy * rz
    pu = -fx * tx * rz * rz
    pv = -fy * ty * rz * rz
    a = u * u * sig(0, 0) + 2 * u * pu * sig(0, 2) + pu * pu * sig(2, 2)
    b = (
        u * v * sig(0, 1) + u * pv * sig(0, 2)
        + pu * v * sig(1, 2) + pu * pv * sig(2, 2)
    )
    c = v * v * sig(1, 1) + 2 * v * pv * sig(1, 2) + pv * pv * sig(2, 2)
    det_orig = a * c - b * b
    a_b = a + LOWPASS
    c_b = c + LOWPASS
    det = a_b * c_b - b * b

    if rasterize_mode == "antialiased":
        # clamp (not just floor at 0): sqrt has an unbounded backward at 0,
        # which perfectly-flat Gaussians (det_orig ~ 0) would turn into NaNs;
        # clamping blocks their gradient instead
        ratio = jnp.clip(det_orig / jnp.maximum(det, 1e-12), 1e-10, 1.0)
        comp = jnp.sqrt(ratio)
        op = opacities * comp
    elif rasterize_mode == "classic":
        op = opacities
    else:
        raise ValueError(f"unknown rasterize_mode: {rasterize_mode}")

    inv_det = 1.0 / jnp.maximum(det, 1e-12)
    conic = jnp.stack((c_b * inv_det, -b * inv_det, a_b * inv_det), axis=-1)

    # screen radius from max eigenvalue of the blurred cov2d
    mid = 0.5 * (a_b + c_b)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    # opacity-aware tight bounds: alpha = op * exp(-sigma) clears MIN_ALPHA
    # only where sigma <= log(op / MIN_ALPHA) =: t. The bbox of the level set
    # {0.5 d^T conic d <= t} has per-axis half-widths sqrt(2t * cov_xx|yy)
    # (cov = blurred cov2d = conic^-1), and sigma >= |d|^2 / (2 lam) bounds
    # the whole set inside a circle of radius sqrt(2t * lam). Low-opacity /
    # anisotropic Gaussians shrink far below the circular 3-sigma rect, which
    # directly cuts (tile, gaussian) pair volume — the step-time driver.
    t2 = 2.0 * jnp.log(jnp.maximum(op, 1e-8) * (1.0 / MIN_ALPHA))  # 2t
    t2 = jnp.maximum(t2, 0.0)
    # +0.01px pad: the bounds are tight exactly at the MIN_ALPHA level set,
    # so a float-rounding sliver there could otherwise prune a pair whose
    # kernel alpha lands a hair above the cutoff
    ext_x = jnp.minimum(jnp.sqrt(t2 * a_b) + 0.01, radius)
    ext_y = jnp.minimum(jnp.sqrt(t2 * c_b) + 0.01, radius)
    prune_r = jnp.sqrt(t2 * lam) + 0.01

    valid = (
        (z > near)
        & (z < far)
        & (det > 1e-12)
        & (op > MIN_ALPHA)
        & (mean2d[:, 0] + ext_x > 0)
        & (mean2d[:, 0] - ext_x < width)
        & (mean2d[:, 1] + ext_y > 0)
        & (mean2d[:, 1] - ext_y < height)
        & (radius > radius_clip)
    )
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    keep = valid.astype(jnp.float32)
    return Projected(
        means2d=mean2d, depths=z, conics=conic, opacities=op, radii=radii,
        extents=jnp.stack((ext_x * keep, ext_y * keep), axis=-1),
        prune_r=prune_r * keep,
    )
