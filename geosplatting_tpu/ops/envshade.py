"""Monte-Carlo environment shading with multiple importance sampling.

TPU-native replacement for the reference's OptiX kernel
(``rfstudio/graphics/_mesh/_optix/c_src/envsampling/kernel.cu``): stratified
light-CDF sampling + GGX-VNDF/cosine BSDF sampling with the summed-pdf
balance heuristic (:403-418, :465-551), Frostbite-style separated
diffuse/specular BSDF evaluation (``bsdf.h:222-240``), and the shadowed
residual fraction (:462-463). Visibility is pluggable — the default is the
SDF-grid sphere-traced soft shadow from ``sdf_visibility.py`` (no RT cores
needed); gradients flow into kd/ks/normals/positions/light via autodiff
with per-sample rematerialization (lax.scan + checkpoint), replacing the
hand-written CUDA backward.

Light pdf tables match ``TextureLatLng.compute_pdf_``
(``_texture.py:287-305``): pdf ∝ max(RGB)·sin(θ), row/col CDFs.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..graphics import gmath

SPECULAR_EPS = 1e-4


class LightPdf(NamedTuple):
    data: jnp.ndarray   # [H, W, 3] radiance
    pdf: jnp.ndarray    # [H, W] normalized texel pdf
    rows: jnp.ndarray   # [H] row cdf
    cols: jnp.ndarray   # [H, W] per-row col cdf


def compute_light_pdf(data: jnp.ndarray) -> LightPdf:
    """TextureLatLng.compute_pdf_ (_texture.py:287-305). The pdf/cdf tables
    are gradient-stopped, matching the reference's @torch.no_grad (radiance
    gradients flow through eval_light, not the sampler)."""
    h, w = data.shape[:2]
    y = (jnp.arange(h) + 0.5) / h
    sg_data = jax.lax.stop_gradient(data)
    pdf = jnp.maximum(sg_data.max(-1), 1e-3) * jnp.sin(y * jnp.pi)[:, None]
    pdf = pdf / pdf.sum()
    cols = jnp.cumsum(pdf, axis=1)
    rows = jnp.cumsum(cols[:, -1], axis=0)
    cols = cols / jnp.where(cols[:, -1:] > 0, cols[:, -1:], 1.0)
    rows = rows / jnp.where(rows[-1] > 0, rows[-1], 1.0)
    return LightPdf(data=data, pdf=pdf, rows=rows, cols=cols)


def _dir_to_tc(d: jnp.ndarray) -> jnp.ndarray:
    u = jnp.arctan2(d[..., 0], -d[..., 2]) / (2 * jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    return jnp.stack((u, v), -1)


def _tc_to_dir(uv: jnp.ndarray) -> jnp.ndarray:
    phi = (uv[..., 0] - 0.5) * 2 * jnp.pi
    theta = uv[..., 1] * jnp.pi
    sin_t = jnp.sin(theta)
    return jnp.stack(
        (sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)), -1
    )


def light_pdf_at(light: LightPdf, d: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of the light sampler at direction(s) d (kernel.cu lightPDF)."""
    h, w = light.pdf.shape
    tc = _dir_to_tc(d)
    x = jnp.clip((tc[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((tc[..., 1] * h).astype(jnp.int32), 0, h - 1)
    weight = h * w / (2 * jnp.pi**2 * jnp.maximum(jnp.sin(tc[..., 1] * jnp.pi), 1e-4))
    return light.pdf[y, x] * weight


def sample_light(light: LightPdf, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF sample directions for stratified (u, v) in [0,1). [..., 3]."""
    h, w = light.pdf.shape
    y = jnp.clip(jnp.searchsorted(light.rows, v, side="left"), 0, h - 1)
    prev_r = jnp.where(y > 0, light.rows[jnp.maximum(y - 1, 0)], 0.0)
    ry = jnp.clip((v - prev_r) / jnp.maximum(light.rows[y] - prev_r, 1e-12), 0.0, 1.0)
    cols_y = light.cols[y]  # [..., W]
    x = jnp.clip(
        jax.vmap(jnp.searchsorted, in_axes=(0, 0))(
            cols_y.reshape(-1, w), u.reshape(-1)
        ).reshape(u.shape),
        0, w - 1,
    )
    prev_c = jnp.where(
        x > 0,
        jnp.take_along_axis(cols_y, jnp.maximum(x - 1, 0)[..., None], -1)[..., 0],
        0.0,
    )
    cx = jnp.take_along_axis(cols_y, x[..., None], -1)[..., 0]
    rx = jnp.clip((u - prev_c) / jnp.maximum(cx - prev_c, 1e-12), 0.0, 1.0)
    uv = jnp.stack(((x + rx) / w, (y + ry) / h), -1)
    return _tc_to_dir(uv)


# scatter-free light-table gradients (ops/segment_rows.py) replace the
# per-sample-step scatter-add; the sort they add to the sample scan body is
# suspected round 4 of inflating the stage-2 REMOTE COMPILE — this switch
# exists to A/B that (1 = scatter-free, 0 = plain gather/scatter)
import os as _os

_SCATTER_FREE = _os.environ.get("GEOS_ENV_SCATTER_FREE", "1") == "1"


def eval_light(light: LightPdf, d: jnp.ndarray) -> jnp.ndarray:
    """Nearest-texel radiance lookup (differentiable into light.data).

    gather_rows: the backward otherwise scatter-adds [N] rows into the
    latlng table PER MC SAMPLE STEP (the round-4 trace pathology — see
    ops/segment_rows.py)."""
    from .segment_rows import gather_rows

    h, w = light.pdf.shape
    tc = _dir_to_tc(d)
    x = jnp.clip((tc[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((tc[..., 1] * h).astype(jnp.int32), 0, h - 1)
    if not _SCATTER_FREE:
        return light.data[y, x]
    flat = light.data.reshape(-1, light.data.shape[-1])
    return gather_rows(flat.shape[0], flat, y * w + x)


def eval_light_and_pdf(
    light: LightPdf, d: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(radiance [..., 3], solid-angle pdf [...]) with ONE fused gather —
    the MC sample loop calls both per BSDF sample, and at production N the
    per-sample gathers are the dominant cost of env_shade (round-4 trace:
    ~2.7 s of a 3.4 s forward)."""
    from .segment_rows import gather_rows

    h, w = light.pdf.shape
    tc = _dir_to_tc(d)
    x = jnp.clip((tc[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((tc[..., 1] * h).astype(jnp.int32), 0, h - 1)
    fused = jnp.concatenate(
        [light.data, jax.lax.stop_gradient(light.pdf)[..., None]], -1
    ).reshape(-1, 4)
    if _SCATTER_FREE:
        out = gather_rows(fused.shape[0], fused, y * w + x)
    else:
        out = fused[y * w + x]
    weight = h * w / (
        2 * jnp.pi**2 * jnp.maximum(jnp.sin(tc[..., 1] * jnp.pi), 1e-4)
    )
    return out[..., :3], out[..., 3] * weight


# --- BSDF pieces (bsdf.h) -------------------------------------------------------


def _ndf_ggx(alpha_sqr, cos_t):
    c = jnp.clip(cos_t, SPECULAR_EPS, 1 - SPECULAR_EPS)
    d = (c * alpha_sqr - c) * c + 1.0
    return alpha_sqr / (d * d * jnp.pi)


def _lambda_ggx(alpha_sqr, cos_t):
    c = jnp.clip(cos_t, SPECULAR_EPS, 1 - SPECULAR_EPS)
    c2 = c * c
    tan2 = (1 - c2) / c2
    return 0.5 * (jnp.sqrt(1 + alpha_sqr * tan2) - 1.0)


def _masking_smith(alpha_sqr, cos_i, cos_o):
    return 1.0 / (1.0 + _lambda_ggx(alpha_sqr, cos_i) + _lambda_ggx(alpha_sqr, cos_o))


def _fresnel_schlick(f0, f90, cos_t):
    t = jnp.clip(1.0 - cos_t, 0.0, 1.0) ** 5
    return f0 + (f90 - f0) * t[..., None] if f0.ndim > cos_t.ndim else f0 + (f90 - f0) * t


def eval_bsdf(kd, arm, nrm, wo, wi, min_roughness=0.08):
    """(diffuse scalar-as-rgb, specular rgb) — fwdPbrBSDF (bsdf.h:222-240):
    demodulated-albedo Lambert + GGX specular. arm = (occ, roughness, metallic)."""
    lambert = jnp.maximum(gmath.dot(nrm, wi), 0.0) / jnp.pi  # [..., 1]
    diffuse = jnp.repeat(lambert, 3, axis=-1)

    alpha = arm[..., 1:2] * arm[..., 1:2]
    spec_col = (0.04 * (1 - arm[..., 2:3]) + kd * arm[..., 2:3]) * (1 - arm[..., 0:1])
    _alpha = jnp.clip(alpha, min_roughness**2, 1.0)[..., 0]
    alpha_sqr = _alpha * _alpha
    h = gmath.safe_normalize(wo + wi)
    wo_n = gmath.dot(wo, nrm)[..., 0]
    wi_n = gmath.dot(wi, nrm)[..., 0]
    wo_h = gmath.dot(wo, h)[..., 0]
    n_h = gmath.dot(nrm, h)[..., 0]
    front = (wo_n > SPECULAR_EPS) & (wi_n > SPECULAR_EPS)
    # dead-branch-safe denominator: keeps the masked-out branch's backward
    # bounded (XLA computes both sides of the where; 0-cotangent times an
    # overflowed partial still poisons gradients)
    safe_wo_n = jnp.where(front, jnp.maximum(wo_n, SPECULAR_EPS), 1.0)
    d = _ndf_ggx(alpha_sqr, jnp.where(front, n_h, 0.5))
    g = _masking_smith(alpha_sqr, jnp.where(front, wo_n, 0.5),
                       jnp.where(front, wi_n, 0.5))
    f = spec_col + (1.0 - spec_col) * jnp.clip(1.0 - wo_h, 0, 1)[..., None] ** 5
    w = f * (d * g * 0.25 / safe_wo_n)[..., None]
    return diffuse, jnp.where(front[..., None], w, 0.0)


def _ggx_vndf_pdf(n, wo, wi, alpha):
    t, b = gmath.build_tangent_frame(n)
    wo_l = jnp.stack([gmath.dot(wo, t)[..., 0], gmath.dot(wo, b)[..., 0], gmath.dot(wo, n)[..., 0]], -1)
    wi_l = jnp.stack([gmath.dot(wi, t)[..., 0], gmath.dot(wi, b)[..., 0], gmath.dot(wi, n)[..., 0]], -1)
    valid = (wo_l[..., 2] > 0) & (wi_l[..., 2] > 0)
    m = gmath.safe_normalize(wo_l + wi_l)
    wo_h = jnp.sum(m * wo_l, -1)
    # dead-branch-safe inputs (see eval_bsdf)
    d = _ndf_ggx(alpha * alpha, jnp.where(valid, m[..., 2], 0.5))
    g1 = 1.0 / (1.0 + _lambda_ggx(alpha * alpha, jnp.where(valid, wo_l[..., 2], 0.5)))
    pdf = g1 * d * jnp.maximum(wo_h, 0.0) / jnp.where(
        valid, jnp.maximum(wo_l[..., 2], SPECULAR_EPS), 1.0
    )
    pdf = pdf / jnp.where(valid, jnp.maximum(4 * wo_h, SPECULAR_EPS), 1.0)
    return jnp.where(valid, pdf, 0.0)


def _cosine_sample(n, u1, u2):
    t, b = gmath.build_tangent_frame(n)
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    local = jnp.stack(
        (r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(1 - u1, 0.0))), -1
    )
    wi = local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * n
    pdf = jnp.maximum(local[..., 2], 0.0) / jnp.pi
    return wi, pdf


def _ggx_vndf_sample(n, wo, u1, u2, alpha):
    """Heitz VNDF sampling in the local frame; returns (wi, pdf)."""
    t, b = gmath.build_tangent_frame(n)
    wo_l = jnp.stack([gmath.dot(wo, t)[..., 0], gmath.dot(wo, b)[..., 0], gmath.dot(wo, n)[..., 0]], -1)
    a = alpha[..., None] if alpha.ndim < wo_l.ndim - 0 else alpha
    vh = gmath.safe_normalize(wo_l * jnp.concatenate([a, a, jnp.ones_like(a)], -1))
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12))
    t1 = jnp.where(
        (lensq > 1e-9)[..., None],
        jnp.stack((-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)), -1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    # eps floors keep sqrt's backward finite when the argument rounds to 0
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 1e-12)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 1e-12))
    m_l = gmath.safe_normalize(
        p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    )
    wi_l = 2.0 * jnp.sum(wo_l * m_l, -1, keepdims=True) * m_l - wo_l
    wi = wi_l[..., 0:1] * t + wi_l[..., 1:2] * b + wi_l[..., 2:3] * n
    # pdf via the vndf formula
    pdf = _ggx_vndf_pdf(n, wo, gmath.safe_normalize(wi), alpha)
    return gmath.safe_normalize(wi), pdf


def _bsdf_pdf(p_diffuse, n, wo, wi, alpha):
    cos_pdf = jnp.maximum(gmath.dot(n, wi)[..., 0], 0.0) / jnp.pi
    ggx = _ggx_vndf_pdf(n, wo, wi, alpha)
    return p_diffuse * cos_pdf + (1 - p_diffuse) * ggx


def env_shade(
    key: jax.Array,
    positions: jnp.ndarray,     # [N, 3]
    normals: jnp.ndarray,       # [N, 3]
    view_pos: jnp.ndarray,      # [3] or [N, 3]
    kd: jnp.ndarray,            # [N, 3]
    arm: jnp.ndarray,           # [N, 3] = (occ, roughness, metallic)
    light: LightPdf,
    *,
    num_samples_x: int = 8,
    visibility_fn: Callable | None = None,
    shadow_scale: float = 1.0,
    bsdf: str = "pbr",
    light_bank: int = 2048,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (diffuse_accum [N,3], specular_accum [N,3], residual [N,2]).

    Per point: n^2 stratified light samples + n^2 BSDF samples, combined
    with the summed-pdf balance heuristic. Light sampling goes through a
    shared stratified direction bank (size ``light_bank``) with per-point
    random assignment — the TPU-friendly analog of the reference's
    permutation-table decorrelation (ops.py:84-86)."""
    n_pts = positions.shape[0]
    s = num_samples_x * num_samples_x
    wo = gmath.safe_normalize(view_pos - positions)

    metallic = arm[..., 2:3]
    spec_col = 0.04 * (1 - metallic) + kd * metallic
    lum = (kd * jnp.array([0.2126, 0.7152, 0.0722])).sum(-1)
    cos_no = jnp.maximum(gmath.dot(wo, normals)[..., 0], 0.0)
    f_view = spec_col + (1 - spec_col) * jnp.clip(1 - cos_no, 0, 1)[..., None] ** 5
    spec_w = jnp.where(
        cos_no > 0, (f_view * jnp.array([0.2126, 0.7152, 0.0722])).sum(-1), 0.0
    )
    diff_w = (1 - metallic[..., 0]) * lum
    p_diffuse = jnp.where(diff_w + spec_w > 0, diff_w / jnp.maximum(diff_w + spec_w, 1e-12), 1.0)
    alpha = arm[..., 1] * arm[..., 1]

    # stratified shared light bank
    kb, key = jax.random.split(key)
    m = int(round(light_bank ** 0.5))
    grid = (jnp.arange(m * m) % m).astype(jnp.float32), (jnp.arange(m * m) // m).astype(jnp.float32)
    ub = (grid[0] + jax.random.uniform(kb, (m * m,))) / m
    vb = (grid[1] + jax.random.uniform(jax.random.fold_in(kb, 1), (m * m,))) / m
    bank_dirs = sample_light(light, ub, vb)          # [B, 3]
    bank_pdf = light_pdf_at(light, bank_dirs)        # [B]
    # radiance per bank direction, computed ONCE: light-sample lookups then
    # become a single [N] row-gather instead of per-point dir->texcoord trig
    # + 2-D gathers (differentiable into light.data through the bank).
    # dirs/pdf/radiance ride ONE fused [B, 7] table so the per-step bank
    # lookup is one gather, not three (round-4 trace: per-sample gathers
    # dominate env_shade at production N)
    bank_cols = eval_light(light, bank_dirs)         # [B, 3]
    bank_all = jnp.concatenate(
        [jax.lax.stop_gradient(bank_dirs),
         jax.lax.stop_gradient(bank_pdf)[:, None], bank_cols], -1
    )                                                # [B, 7]

    sample_frac = 1.0 / s

    def eval_sample(wi, pdf_sum, vis_key, light_col=None):
        # The sample direction and the MIS weight are CONSTANTS of the
        # backward, exactly like the reference kernel (kernel.cu
        # process_sample: mis_weight from pdfSum is never differentiated and
        # ray_dir_grad is discarded). Differentiating through the VNDF
        # sample generation / pdf adds biased score-function-like terms whose
        # 1/alpha^2-style partials overflow in float32 — this was the root
        # cause of the TPU stage-2 non-finite geometry/ks gradients.
        wi = jax.lax.stop_gradient(wi)
        pdf_sum = jax.lax.stop_gradient(pdf_sum)
        diff_b, spec_b = eval_bsdf(kd, arm, normals, wo, wi)
        if bsdf in ("diffuse", "white"):
            spec_b = jnp.zeros_like(spec_b)
            diff_b = jnp.repeat(jnp.maximum(gmath.dot(normals, wi), 0.0) / jnp.pi, 3, -1)
        if light_col is None:
            light_col = eval_light(light, wi)
        mis_w = 1.0 / jnp.maximum(pdf_sum, 1e-4)
        if visibility_fn is not None:
            v_raw = visibility_fn(
                positions + jax.lax.stop_gradient(normals) * 1e-3, wi
            )
            v = jax.lax.stop_gradient(v_raw) * shadow_scale + (1 - shadow_scale)
        else:
            v = jnp.ones((n_pts,))
        common = (mis_w * sample_frac)[..., None] * light_col
        diff = diff_b * common * v[..., None]
        spec = spec_b * common * v[..., None]
        resi = jnp.stack(
            (
                diff_b.mean(-1) * (1 - v) * mis_w * sample_frac,
                spec_b.mean(-1) * (1 - v) * mis_w * sample_frac,
            ),
            -1,
        )
        return diff, spec, resi

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, sk):
        d_acc, s_acc, r_acc = carry
        k1, k2, k3, k4 = jax.random.split(sk, 4)
        # light importance sample (one fused gather from the shared bank)
        from .segment_rows import gather_rows

        bidx = jax.random.randint(k1, (n_pts,), 0, bank_dirs.shape[0])
        bk = (gather_rows(bank_all.shape[0], bank_all, bidx)
              if _SCATTER_FREE else bank_all[bidx])
        wi_l = bk[:, 0:3]
        pdf_l = bk[:, 3]
        pdf_b = _bsdf_pdf(p_diffuse, normals, wo, wi_l, alpha)
        d1, s1, r1 = eval_sample(wi_l, pdf_l + pdf_b, k2, light_col=bk[:, 4:7])
        # bsdf sample
        u = jax.random.uniform(k3, (n_pts, 3))
        wi_cos, pdf_cos = _cosine_sample(normals, u[:, 0], u[:, 1])
        wi_ggx, pdf_ggx = _ggx_vndf_sample(normals, wo, u[:, 0], u[:, 1], alpha)
        take_diff = u[:, 2] < p_diffuse
        wi_b = jnp.where(take_diff[:, None], wi_cos, wi_ggx)
        pdf_bb = jnp.where(
            take_diff,
            p_diffuse * pdf_cos + (1 - p_diffuse) * _ggx_vndf_pdf(normals, wo, wi_cos, alpha),
            (1 - p_diffuse) * pdf_ggx + p_diffuse * jnp.maximum(gmath.dot(normals, wi_ggx)[..., 0], 0) / jnp.pi,
        )
        # radiance + pdf in one fused gather
        light_col_b, pdf_lb = eval_light_and_pdf(light, wi_b)
        d2, s2, r2 = eval_sample(wi_b, pdf_lb + pdf_bb, k4, light_col=light_col_b)
        return (d_acc + d1 + d2, s_acc + s1 + s2, r_acc + r1 + r2), None

    init = (
        jnp.zeros((n_pts, 3)),
        jnp.zeros((n_pts, 3)),
        jnp.zeros((n_pts, 2)),
    )
    keys = jax.random.split(key, s)
    (diff, spec, resi), _ = jax.lax.scan(step, init, keys)
    return diff, spec, resi
