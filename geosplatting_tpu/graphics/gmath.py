"""Core graphics math: quaternions, rotations, spherical harmonics, sampling.

Capability parity with the reference ``rfstudio/graphics/math.py`` (quat/rot
conversions at math.py:246,281; sh<->rgb :10-45; safe_normalize :119;
rotation-from-vectors :159; slerp :298), rewritten as pure jnp functions.
Quaternions are **wxyz** (r, i, j, k) throughout, matching the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def reflect(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return 2.0 * dot(n, x) * n - x


def rgb2sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / SH_C0


def sh2rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * SH_C0 + 0.5


def quat2rot(quats: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion(s) -> rotation matrix [..., 3, 3]."""
    r, i, j, k = jnp.moveaxis(quats, -1, 0)
    two_s = 2.0 / jnp.sum(quats * quats, axis=-1)
    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(quats.shape[:-1] + (3, 3))


def rot2quat(rots: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> wxyz quaternion, best-conditioned branch."""
    batch = rots.shape[:-2]
    m = rots.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    # floor keeps sqrt's backward finite for degenerate (e.g. padded) inputs;
    # valid rotations always have max(q) >= 1 so the selected branch is exact
    q_abs = jnp.sqrt(jnp.maximum(q, 1e-12))

    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    cand = cand / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        (
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ),
        axis=-1,
    )


def random_quaternion(key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
    q = jax.random.normal(key, shape + (4,))
    return safe_normalize(q)


def rotation_from_relative_vectors(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Minimal rotation matrix taking unit vector(s) src to dst. [..., 3, 3]."""
    src = safe_normalize(src)
    dst = safe_normalize(dst)
    v = jnp.cross(src, dst)
    c = dot(src, dst)[..., 0]
    vx, vy, vz = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(vx)
    k = jnp.stack(
        (zero, -vz, vy, vz, zero, -vx, -vy, vx, zero), axis=-1
    ).reshape(v.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    scale = (1.0 / jnp.maximum(1.0 + c, 1e-8))[..., None, None]
    r = eye + k + (k @ k) * scale
    # antiparallel fallback: 180-degree flip around any orthogonal axis
    flip = -eye
    return jnp.where((c < -1.0 + 1e-8)[..., None, None], flip, r)


def sample_sphere(key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
    u = jax.random.normal(key, shape + (3,))
    return safe_normalize(u)


def sample_hemisphere_cosine(key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample around +z. [..., 3]."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape)
    u2 = jax.random.uniform(k2, shape)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    return jnp.stack(
        (r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))),
        axis=-1,
    )


def build_tangent_frame(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless orthonormal tangent/bitangent for normal(s) n (Frisvad)."""
    sign = jnp.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    t = jnp.concatenate(
        (1.0 + sign * n[..., 0:1] ** 2 * a, sign * b, -sign * n[..., 0:1]), axis=-1
    )
    bt = jnp.concatenate((b, sign + n[..., 1:2] ** 2 * a, -n[..., 1:2]), axis=-1)
    return t, bt


def slerp_quat(qa: jnp.ndarray, qb: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    cos = jnp.sum(qa * qb, axis=-1)
    neg = cos < 0
    cos = jnp.where(neg, -cos, cos)
    qa = jnp.where(neg[..., None], -qa, qa)
    angle = jnp.arccos(jnp.clip(cos, -1.0, 1.0 - 1e-7))
    angle = jnp.maximum(angle, 1e-8)
    isin = 1.0 / jnp.sin(angle)
    return (
        qa * (jnp.sin((1 - w) * angle) * isin)[..., None]
        + qb * (jnp.sin(w * angle) * isin)[..., None]
    )


# --- spherical harmonics evaluation (real SH, degrees 0..3, 3DGS convention) ---
_SH_C1 = 0.4886025119029199
_SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396)
_SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate real SH with coefficients sh [..., (deg+1)^2, C] at unit dirs [..., 3]."""
    result = SH_C0 * sh[..., 0, :]
    if deg >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (
            result
            - _SH_C1 * y * sh[..., 1, :]
            + _SH_C1 * z * sh[..., 2, :]
            - _SH_C1 * x * sh[..., 3, :]
        )
        if deg >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + _SH_C2[0] * xy * sh[..., 4, :]
                + _SH_C2[1] * yz * sh[..., 5, :]
                + _SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + _SH_C2[3] * xz * sh[..., 7, :]
                + _SH_C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg >= 3:
                result = (
                    result
                    + _SH_C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
                    + _SH_C3[1] * xy * z * sh[..., 10, :]
                    + _SH_C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
                    + _SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
                    + _SH_C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
                    + _SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + _SH_C3[6] * x * (xx - 3 * yy) * sh[..., 15, :]
                )
    return result


def sh_deg2dim(deg: int) -> int:
    return (deg + 1) ** 2


def sh_dim2deg(dim: int) -> int:
    deg = int(round(dim ** 0.5)) - 1
    assert sh_deg2dim(deg) == dim, f"invalid sh dim {dim}"
    return deg


def latlng_dir(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """(theta in [0,pi] from +y pole, phi in [-pi,pi) with 0 at -z) -> unit
    direction, y-up. Matches the reference's _tc_to_dir with phi = (u-0.5)*2pi."""
    sin_t = jnp.sin(theta)
    return jnp.stack(
        (sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)), axis=-1
    )


def dir_to_latlng_uv(d: jnp.ndarray) -> jnp.ndarray:
    """Unit direction -> equirect uv in [0,1]^2 (u: phi with -z at u=0.5,
    v: theta) — the reference's _dir_to_tc convention (kernel.cu:124-129)."""
    d = safe_normalize(d)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    u = jnp.arctan2(d[..., 0], -d[..., 2]) / (2.0 * jnp.pi) + 0.5
    return jnp.stack((u, theta / jnp.pi), axis=-1)
