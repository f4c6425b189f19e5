"""Cubemap sampling, mip chains, and split-sum environment prefiltering.

TPU-native replacement for the reference's in-repo CUDA split-sum kernels
(``rfstudio/graphics/_mesh/_splitsum/c_src/cubemap.cu``: diffuse cosine
integral :110-180, GGX specular integral with NDF bounds :181-349) and for
nvdiffrast's ``dr.texture(..., boundary_mode='cube')``:

- **diffuse_prefilter** — exact dense cosine-hemisphere integral over all
  base-resolution texels, expressed as one [6R^2, 6R^2] matmul (MXU), fully
  differentiable; identical math to the CUDA kernel (weight =
  max(cos,0) * texel_solid_angle / pi).
- **specular_prefilter** — GGX-filtered importance sampling with statically
  mip-matched lookups into the downsample chain (the real-time-graphics
  standard), replacing the CUDA per-texel bounded integral: a fixed
  Hammersley/GGX sample pattern per roughness is rotated into each output
  texel's frame; each sample reads the mip whose texel solid angle matches
  the sample's pdf. Differentiable through the gathers and the (average
  pooled) mip chain.
- **sample_splitsum** — trilinear roughness->miplevel lookup mirroring
  ``TextureSplitSum.sample`` (``_texture.py:571-614``).
- **fg_lut** — the Karis split-sum BRDF LUT computed numerically at first
  use (replaces the reference's binary asset ``bsdf_256_256.bin``,
  ``shaders.py:19-26``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..graphics import gmath

# --- cube face geometry -------------------------------------------------------
# face order: +x, -x, +y, -y, +z, -z (OpenGL convention)


def cube_dir(face: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(face, u, v) with u,v in [-1,1] -> unnormalized direction [..., 3]."""
    one = jnp.ones_like(u)
    dirs = jnp.stack(
        [
            jnp.stack((one, -v, -u), -1),
            jnp.stack((-one, -v, u), -1),
            jnp.stack((u, one, v), -1),
            jnp.stack((u, -one, -v), -1),
            jnp.stack((u, -v, one), -1),
            jnp.stack((-u, -v, -one), -1),
        ],
        axis=0,
    )  # [6, ..., 3]
    return jnp.take_along_axis(
        dirs, face[None, ..., None].astype(jnp.int32), axis=0
    )[0] if face.ndim else dirs[face]


def dir_to_cube_uv(d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Direction [..., 3] -> (face, u, v) with u,v in [-1,1]."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    ).astype(jnp.int32)
    # unit inputs always have major-axis magnitude >= 1/sqrt(3); a generous
    # floor keeps the backward bounded for degenerate (zero-padded) inputs
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-3)
    u = jnp.where(
        is_x, jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    ) / ma
    v = jnp.where(is_y, jnp.where(y > 0, z, -z) / ma, -y / ma)
    return face, u, v


def texel_directions(resolution: int) -> jnp.ndarray:
    """[6, R, R, 3] unit direction at each texel center."""
    t = (jnp.arange(resolution) + 0.5) / resolution * 2.0 - 1.0
    v, u = jnp.meshgrid(t, t, indexing="ij")  # [R, R]
    faces = jnp.stack(
        [cube_dir(jnp.asarray(f), u, v) for f in range(6)], axis=0
    )
    return gmath.safe_normalize(faces)


def texel_solid_angles(resolution: int) -> jnp.ndarray:
    """[6, R, R] solid angle of each texel (exact corner integral)."""

    def area(x, y):
        return jnp.arctan2(x * y, jnp.sqrt(x * x + y * y + 1.0))

    edges = jnp.arange(resolution + 1) / resolution * 2.0 - 1.0
    gy, gx = jnp.meshgrid(edges, edges, indexing="ij")
    a = area(gx, gy)
    sa = a[1:, 1:] - a[:-1, 1:] - a[1:, :-1] + a[:-1, :-1]
    return jnp.broadcast_to(sa[None], (6, resolution, resolution))


from .segment_rows import gather_rows  # noqa: E402  (scatter-free bwd)


def sample_cubemap(data: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear cubemap lookup: data [6, R, R, C], dirs [..., 3] -> [..., C].

    Edge handling is clamp-to-face (the sub-texel seam error is negligible
    for the prefiltered environment use-case)."""
    r = data.shape[1]
    face, u, v = dir_to_cube_uv(gmath.safe_normalize(dirs))
    fu = (u * 0.5 + 0.5) * r - 0.5
    fv = (v * 0.5 + 0.5) * r - 0.5
    x0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, r - 1)
    y0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, r - 1)
    x1 = jnp.minimum(x0 + 1, r - 1)
    y1 = jnp.minimum(y0 + 1, r - 1)
    wx = jnp.clip(fu - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(fv - y0, 0.0, 1.0)[..., None]
    flat = data.reshape(-1, data.shape[-1])
    tex = lambda x, y: gather_rows(flat.shape[0], flat, (face * r + y) * r + x)
    c00 = tex(x0, y0)
    c01 = tex(x1, y0)
    c10 = tex(x0, y1)
    c11 = tex(x1, y1)
    return (
        c00 * (1 - wx) * (1 - wy)
        + c01 * wx * (1 - wy)
        + c10 * (1 - wx) * wy
        + c11 * wx * wy
    )


def downsample(data: jnp.ndarray) -> jnp.ndarray:
    """2x average-pool mip (the reference's _CubeMapMip, _texture.py:199-227)."""
    f, r, _, c = data.shape
    x = data.reshape(f, r // 2, 2, r // 2, 2, c)
    return x.mean(axis=(2, 4))


def build_mip_chain(data: jnp.ndarray, min_resolution: int = 16) -> list[jnp.ndarray]:
    chain = [data]
    while chain[-1].shape[1] > min_resolution:
        chain.append(downsample(chain[-1]))
    return chain


# --- diffuse prefilter (dense cosine integral, cubemap.cu:110-140) -------------


def diffuse_prefilter(cube: jnp.ndarray) -> jnp.ndarray:
    """[6, R, R, 3] -> cosine-hemisphere prefiltered irradiance (R small)."""
    r = cube.shape[1]
    dirs = texel_directions(r).reshape(-1, 3)       # [T, 3]
    areas = texel_solid_angles(r).reshape(-1)        # [T]
    w = jnp.maximum(dirs @ dirs.T, 0.0) * (areas[None, :] / jnp.pi)  # [T, T]
    out = w @ cube.reshape(-1, 3)
    # normalize: hemisphere cosine weights integrate to pi exactly; texel
    # quadrature is slightly off, so renormalize rows like the energy check
    norm = w.sum(axis=1, keepdims=True)
    return (out / jnp.maximum(norm, 1e-8)).reshape(cube.shape)


# --- GGX specular prefilter (filtered importance sampling) ---------------------


@functools.lru_cache(maxsize=32)
def _ggx_sample_pattern(roughness: float, num_samples: int) -> tuple:
    """Hammersley GGX half-vector pattern around +z: returns numpy arrays
    (local_dirs [S, 3] reflected sample directions assuming n=v=+z,
    weights [S] = n.l, pdf [S])."""
    alpha = max(roughness, 1e-3) ** 2
    i = np.arange(num_samples)
    u1 = (i + 0.5) / num_samples
    u2 = _radical_inverse(i)
    cos_theta = np.sqrt((1.0 - u1) / (1.0 + (alpha * alpha - 1.0) * u1))
    sin_theta = np.sqrt(np.maximum(1.0 - cos_theta**2, 0.0))
    phi = 2.0 * np.pi * u2
    h = np.stack(
        (sin_theta * np.cos(phi), sin_theta * np.sin(phi), cos_theta), -1
    )
    # reflect v=+z around h: l = 2(v.h)h - v
    v = np.array([0.0, 0.0, 1.0])
    l = 2 * (h @ v)[:, None] * h - v  # noqa: E741
    nl = np.maximum(l[:, 2], 0.0)
    d = _ndf_ggx(alpha * alpha, cos_theta)
    pdf = d * cos_theta / np.maximum(4.0 * (h @ v), 1e-8)
    keep = nl > 1e-4
    return l[keep], nl[keep], np.maximum(pdf[keep], 1e-8)


def _radical_inverse(i: np.ndarray) -> np.ndarray:
    bits = i.astype(np.uint32)
    bits = (bits << np.uint32(16)) | (bits >> np.uint32(16))
    bits = ((bits & np.uint32(0x55555555)) << np.uint32(1)) | (
        (bits & np.uint32(0xAAAAAAAA)) >> np.uint32(1))
    bits = ((bits & np.uint32(0x33333333)) << np.uint32(2)) | (
        (bits & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    bits = ((bits & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | (
        (bits & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    bits = ((bits & np.uint32(0x00FF00FF)) << np.uint32(8)) | (
        (bits & np.uint32(0xFF00FF00)) >> np.uint32(8))
    return bits.astype(np.float64) * 2.3283064365386963e-10


def _ndf_ggx(alpha_sqr, cos_theta):
    c = np.clip(cos_theta, 0.0, 1.0)
    d = (c * alpha_sqr - c) * c + 1.0
    return alpha_sqr / (d * d * np.pi)


def specular_prefilter(
    chain: list[jnp.ndarray], roughness: float, *, num_samples: int = 64
) -> jnp.ndarray:
    """Prefilter the environment for one roughness at chain[0]'s resolution.

    Each output texel's reflection lobe is sampled with a fixed GGX pattern
    rotated into its tangent frame; each sample reads the mip whose texel
    solid angle best matches the sample's pdf footprint (Krivanek mip
    matching) — the TPU analog of the CUDA kernel's NDF-bounded integral."""
    res = chain[0].shape[1]
    local, w, pdf = _ggx_sample_pattern(float(roughness), num_samples)
    s = local.shape[0]
    # static per-sample mip selection
    total_texels = 6 * res * res
    omega_p = 4.0 * np.pi / total_texels
    omega_s = 1.0 / (num_samples * pdf)
    mip = np.clip(
        0.5 * np.log2(omega_s / omega_p), 0.0, len(chain) - 1
    ).round().astype(int)

    dirs = texel_directions(res)  # [6, R, R, 3]
    t, b = gmath.build_tangent_frame(dirs)
    local_j = jnp.asarray(local, jnp.float32)
    w_j = jnp.asarray(w, jnp.float32)

    acc = jnp.zeros((6, res, res, chain[0].shape[-1]))
    for level in range(len(chain)):
        sel = np.nonzero(mip == level)[0]
        if len(sel) == 0:
            continue
        ls = local_j[sel]  # [Sl, 3]
        # world dir per (texel, sample): rotate local into (t, b, n)
        d = (
            t[..., None, :] * ls[:, 0][None, None, None, :, None]
            + b[..., None, :] * ls[:, 1][None, None, None, :, None]
            + dirs[..., None, :] * ls[:, 2][None, None, None, :, None]
        )  # [6, R, R, Sl, 3]
        vals = sample_cubemap(chain[level], d)  # [6, R, R, Sl, C]
        acc = acc + (vals * w_j[sel][None, None, None, :, None]).sum(-2)
    return acc / jnp.sum(w_j)


def _upsample2x(data: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample per cube face: [6, R, R, C] -> [6, 2R, 2R, C]."""
    f, r, _, c = data.shape
    out = jax.image.resize(data, (f, 2 * r, 2 * r, c), method="bilinear")
    return out


def _face_blur(data: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable per-face Gaussian blur with edge-replicate padding."""
    if sigma <= 0.05:
        return data
    radius = min(int(np.ceil(3.0 * sigma)), data.shape[1] - 1)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = jnp.asarray(k / k.sum(), data.dtype)
    pad_h = [(0, 0), (radius, radius), (0, 0), (0, 0)]
    out = jnp.moveaxis(
        _conv1d_last(jnp.moveaxis(jnp.pad(data, pad_h, mode="edge"), 1, -1), k),
        -1, 1,
    )
    pad_w = [(0, 0), (0, 0), (radius, radius), (0, 0)]
    out = jnp.moveaxis(
        _conv1d_last(jnp.moveaxis(jnp.pad(out, pad_w, mode="edge"), 2, -1), k),
        -1, 2,
    )
    return out


def _conv1d_last(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Valid 1-D convolution along the last axis (kernel pre-flipped ok:
    symmetric)."""
    n = k.shape[0]
    out = x[..., : x.shape[-1] - n + 1] * k[0]
    for i in range(1, n):
        out = out + x[..., i: x.shape[-1] - n + 1 + i] * k[i]
    return out


def specular_prefilter_conv(
    chain: list[jnp.ndarray], roughness: float
) -> jnp.ndarray:
    """Fast GGX prefilter approximation for the training loop: blur at the
    mip whose texel pitch matches the lobe, then upsample to chain[0]'s
    resolution. Dense VPU work only — the sampled path's per-step gather
    volume (~10^7 indices at 512^2) dominated the stage-1 step on TPU, and
    stage 1 uses split-sum shading only as the geometry warm-up stage, so a
    Gaussian lobe approximation is an acceptable trade (eval/export keep
    ``specular_prefilter``)."""
    res = chain[0].shape[1]
    alpha = max(float(roughness), 1e-3)
    # lobe half-width in texels at resolution R: ~ 2 * alpha * R / pi
    sigma_at = lambda r: 2.0 * alpha * r / np.pi  # noqa: E731
    level = 0
    while level < len(chain) - 1 and sigma_at(chain[level].shape[1]) > 3.0:
        level += 1
    src = chain[level]
    out = _face_blur(src, sigma_at(src.shape[1]))
    while out.shape[1] < res:
        out = _upsample2x(out)
    return out


def prefilter_splitsum(
    cube: jnp.ndarray,
    *,
    min_resolution: int = 16,
    min_roughness: float = 0.08,
    max_roughness: float = 0.5,
    num_samples: int = 64,
    method: str = "sampled",
) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """Full split-sum prefilter (TextureCubeMap.as_splitsum, _texture.py:530-557):
    returns (diffuse base [6, r, r, 3] at min resolution, specular mip list
    from full res down to min res with the reference's roughness schedule).
    ``method='conv'`` uses the fast blur approximation (training loop)."""
    chain = build_mip_chain(cube, min_resolution)
    n = len(chain)
    base = diffuse_prefilter(chain[-1])
    mips = []
    spec = (
        (lambda ch, r: specular_prefilter_conv(ch, r))
        if method == "conv"
        else (lambda ch, r: specular_prefilter(ch, r, num_samples=num_samples))
    )
    for idx in range(n - 1):
        rough = idx / max(n - 2, 1) * (max_roughness - min_roughness) + min_roughness
        mips.append(spec(chain[idx:], rough))
    mips.append(spec(chain[-1:], 1.0))
    return base, mips


def sample_splitsum(
    base: jnp.ndarray,
    mips: list[jnp.ndarray],
    normals: jnp.ndarray,     # [..., 3]
    directions: jnp.ndarray,  # [..., 3]
    roughness: jnp.ndarray,   # [..., 1]
    *,
    min_roughness: float = 0.08,
    max_roughness: float = 0.5,
    with_diffuse: bool = True,
    filter_mode: str = "bilinear",   # 'bilinear' | 'nearest'
    mip_filter: str = "trilinear",   # 'trilinear' | 'nearest'
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(l_diffuse, l_specular): the TextureSplitSum.sample contract
    (_texture.py:571-614) with trilinear roughness->miplevel interpolation.
    ``with_diffuse=False`` skips the diffuse lookup (the pbr splat mode never
    consumes it); the 'nearest' filters trade seam-level accuracy for 4-8x
    fewer gathered (and backward-scattered) rows on the per-gaussian
    training path."""
    n = len(mips)
    miplevel = jnp.where(
        roughness < max_roughness,
        jnp.clip(
            (roughness - min_roughness) / (max_roughness - min_roughness), 0, 1
        ) * (n - 2),
        jnp.clip((roughness - max_roughness) / (1.0 - max_roughness), 0, 1)
        + n - 2,
    )[..., 0]  # [...] in [0, n-1]

    l_diff = sample_cubemap(base, normals) if with_diffuse else None

    # mip ATLAS sampling: the naive form gathers every mip for every element
    # (n x 4 corner gathers) and materializes [n, N, C]; flattening the mip
    # pyramid into one array lets each element gather only its own level(s)
    face, u, v = dir_to_cube_uv(gmath.safe_normalize(directions))
    atlas = jnp.concatenate([m.reshape(-1, m.shape[-1]) for m in mips])
    res_np = np.asarray([m.shape[1] for m in mips], np.int32)
    offs_np = np.concatenate(
        [[0], np.cumsum(6 * res_np.astype(np.int64) ** 2)[:-1]]
    ).astype(np.int32)
    res_t = jnp.asarray(res_np)
    offs_t = jnp.asarray(offs_np)

    def at_level(lvl):
        r = res_t[lvl]                                  # [...] int32
        off = offs_t[lvl]
        rf = r.astype(jnp.float32)
        fu = (u * 0.5 + 0.5) * rf - 0.5
        fv = (v * 0.5 + 0.5) * rf - 0.5

        def texel(x, y):
            return gather_rows(
                atlas.shape[0], atlas, off + (face * r + y) * r + x
            )

        if filter_mode == "nearest":
            x0 = jnp.clip(jnp.round(fu).astype(jnp.int32), 0, r - 1)
            y0 = jnp.clip(jnp.round(fv).astype(jnp.int32), 0, r - 1)
            return texel(x0, y0)
        x0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, r - 1)
        y0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, r - 1)
        x1 = jnp.minimum(x0 + 1, r - 1)
        y1 = jnp.minimum(y0 + 1, r - 1)
        wx = jnp.clip(fu - x0, 0.0, 1.0)[..., None]
        wy = jnp.clip(fv - y0, 0.0, 1.0)[..., None]
        return (
            texel(x0, y0) * (1 - wx) * (1 - wy)
            + texel(x1, y0) * wx * (1 - wy)
            + texel(x0, y1) * (1 - wx) * wy
            + texel(x1, y1) * wx * wy
        )

    if mip_filter == "trilinear":
        lvl0 = jnp.clip(jnp.floor(miplevel).astype(jnp.int32), 0, n - 1)
        frac = (miplevel - lvl0)[..., None]
        l_spec = (
            at_level(lvl0) * (1 - frac)
            + at_level(jnp.minimum(lvl0 + 1, n - 1)) * frac
        )
    else:
        l_spec = at_level(
            jnp.clip(jnp.round(miplevel).astype(jnp.int32), 0, n - 1)
        )
    return l_diff, l_spec


# --- FG LUT (Karis split-sum BRDF integration) ---------------------------------


@functools.lru_cache(maxsize=4)
def fg_lut(resolution: int = 256, num_samples: int = 1024) -> tuple:
    """[R, R, 2] split-sum BRDF LUT indexed by (n.v, roughness); numerically
    integrated replacement for the reference's ``bsdf_256_256.bin`` asset."""
    nv = (np.arange(resolution) + 0.5) / resolution
    rough = (np.arange(resolution) + 0.5) / resolution
    nv_g, r_g = np.meshgrid(nv, rough, indexing="xy")  # [R(rough rows), R(nv cols)]? keep (v=rough, u=nv)
    # rows: roughness (v), cols: n.v (u)
    nv_g = np.broadcast_to(nv[None, :], (resolution, resolution))
    r_g = np.broadcast_to(rough[:, None], (resolution, resolution))

    a = np.maximum(r_g, 1e-3) ** 2
    v = np.stack(
        (np.sqrt(np.maximum(1 - nv_g**2, 0.0)), np.zeros_like(nv_g), nv_g), -1
    )  # [R, R, 3]
    i = np.arange(num_samples)
    u1 = (i + 0.5) / num_samples
    u2 = _radical_inverse(i)
    scale = np.zeros((resolution, resolution))
    bias = np.zeros((resolution, resolution))
    for k in range(num_samples):
        cos_t = np.sqrt((1 - u1[k]) / (1 + (a**2 - 1) * u1[k]))
        sin_t = np.sqrt(np.maximum(1 - cos_t**2, 0.0))
        phi = 2 * np.pi * u2[k]
        h = np.stack(
            (sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t), -1
        )  # [R, R, 3]
        vh = np.sum(v * h, -1)
        l = 2 * vh[..., None] * h - v  # noqa: E741
        nl = np.clip(l[..., 2], 0.0, 1.0)
        nh = np.clip(h[..., 2], 0.0, 1.0)
        vh = np.clip(vh, 0.0, 1.0)
        mask = nl > 0
        # Smith visibility (Schlick-GGX, Karis UE4 IBL variant: k = alpha/2)
        kk = a / 2.0
        g_v = nv_g / (nv_g * (1 - kk) + kk)
        g_l = nl / (nl * (1 - kk) + kk)
        g = g_v * g_l
        g_vis = np.where(mask, g * vh / np.maximum(nh * nv_g, 1e-8), 0.0)
        fc = (1 - vh) ** 5
        scale += (1 - fc) * g_vis
        bias += fc * g_vis
    lut = np.stack((scale, bias), -1) / num_samples
    return (lut.astype(np.float32),)


def fg_analytic(n_dot_v: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Karis' analytic environment-BRDF approximation (gather-free stand-in
    for the FG LUT on the per-gaussian training path): inputs [..., 1] each
    -> [..., 2] (scale, bias)."""
    x = jnp.clip(n_dot_v, 0.0, 1.0)
    r = jnp.clip(roughness, 0.0, 1.0)
    c0 = jnp.array([-1.0, -0.0275, -0.572, 0.022])
    c1 = jnp.array([1.0, 0.0425, 1.04, -0.04])
    t = r * c0 + c1                                     # [..., 4]
    a004 = (
        jnp.minimum(t[..., 0:1] * t[..., 0:1], jnp.exp2(-9.28 * x))
        * t[..., 0:1] + t[..., 1:2]
    )
    return jnp.concatenate(
        (a004 * -1.04 + t[..., 2:3], a004 * 1.04 + t[..., 3:4]), axis=-1
    )


def sample_fg_lut(n_dot_v: jnp.ndarray, roughness: jnp.ndarray, resolution: int = 256) -> jnp.ndarray:
    """Bilinear FG LUT lookup: inputs [..., 1] each -> [..., 2]."""
    (lut_np,) = fg_lut(resolution)
    lut = jnp.asarray(lut_np)
    u = jnp.clip(n_dot_v[..., 0], 0.0, 1.0) * resolution - 0.5
    v = jnp.clip(roughness[..., 0], 0.0, 1.0) * resolution - 0.5
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, resolution - 1)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, resolution - 1)
    x1 = jnp.minimum(x0 + 1, resolution - 1)
    y1 = jnp.minimum(y0 + 1, resolution - 1)
    wx = jnp.clip(u - x0, 0, 1)[..., None]
    wy = jnp.clip(v - y0, 0, 1)[..., None]
    return (
        lut[y0, x0] * (1 - wx) * (1 - wy)
        + lut[y0, x1] * wx * (1 - wy)
        + lut[y1, x0] * (1 - wx) * wy
        + lut[y1, x1] * wx * wy
    )
