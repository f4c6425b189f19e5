"""Pallas TPU kernels for per-tile Gaussian compositing (fwd + custom VJP).

The binning frontend (ops/rasterize.py) produces a fixed-capacity per-tile
index table; these kernels do the hot per-tile work with one grid step per
tile, all operands staged through VMEM:

- forward: alphas for all (gaussian, pixel) pairs of a tile at once
  ([K, P] VPU work), front-to-back transmittance as an exclusive cumulative
  product in log space, color accumulation as a [P, K] x [K, C] matmul (MXU).
- backward: recomputes alphas (nothing but inputs is saved), forms the
  suffix-sum term of d(loss)/d(alpha) with a reversed cumulative sum, and
  emits per-(tile, slot) gradients that the wrapper scatter-adds back to
  per-Gaussian gradients with one segment-sum.

Per-Gaussian parameters travel as ONE packed [T, K, 7+C] array
(mu2 | conic3 | opacity1 | depth1 | colors C): thin trailing dims pad to
128 lanes in TPU tiled layouts, so six separate gathers cost ~70x their
useful bytes while one packed gather costs ~(7+C)/128 — and the backward
packs its per-slot gradients the same way for a single segment-sum.

This replaces gsplat's CUDA tile rasterizer (the contract at
``rfstudio/model/gsplat.py:129-183``) — same math, no atomics: the
gather/scatter happens outside the kernel as XLA gathers/segment-sums.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize import MAX_ALPHA, MIN_ALPHA, TRANSMITTANCE_EPS

_INTERPRET = False  # flipped by tests on CPU
_HDR = 7  # packed header floats before the colors: mu2, con3, op1, dep1


def _cumsum0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 as a log-depth ladder of rolls
    (Mosaic has no cumsum lowering)."""
    k = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, s, 0)  # shifted[i] = x[i - s] (circular)
        x = x + jnp.where(row >= s, shifted, 0.0)
        s *= 2
    return x


def _pixel_grid(tile_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    # built directly in [1, P] layout (Mosaic cannot reshape across lanes);
    # iota must be integer-typed on TPU
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, tile_size * tile_size), 1)
    px = (flat % tile_size).astype(jnp.float32) + 0.5
    py = (flat // tile_size).astype(jnp.float32) + 0.5
    return px, py  # [1, P]


def _unpack(p, live, origin, tile_size):
    """p [K, 7+C] packed params -> (alpha-ready pieces). Returns
    (alpha [K, P] pre-mask pieces, col [K, C], dep [K, 1], keep mask)."""
    px, py = _pixel_grid(tile_size)
    px = px + origin[0, 0, 0]
    py = py + origin[0, 0, 1]
    dx = p[:, 0:1] - px  # [K, P]
    dy = p[:, 1:2] - py
    sigma = 0.5 * (p[:, 2:3] * dx * dx + p[:, 4:5] * dy * dy) + p[:, 3:4] * dx * dy
    op = p[:, 5:6]
    alpha_raw = jnp.minimum(op * jnp.exp(-sigma), MAX_ALPHA)
    keep = (sigma >= 0) & (alpha_raw >= MIN_ALPHA) & (live > 0)
    return sigma, alpha_raw, keep, dx, dy


def _fwd_kernel(p_ref, live_ref, org_ref, out_c_ref, out_a_ref, out_d_ref,
                *, tile_size):
    p = p_ref[0]
    live = live_ref[0]
    _, alpha_raw, keep, _, _ = _unpack(p, live, org_ref, tile_size)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    log_t = _cumsum0(jnp.log1p(-alpha))
    t_excl = jnp.exp(log_t - jnp.log1p(-alpha))
    w = jnp.where(t_excl > TRANSMITTANCE_EPS, alpha * t_excl, 0.0)  # [K, P]
    out_c_ref[0] = jnp.dot(
        w.T, p[:, _HDR:], preferred_element_type=jnp.float32
    )  # [P, C]
    out_a_ref[0] = jnp.sum(w, axis=0)[:, None]
    out_d_ref[0] = jnp.sum(w * p[:, 6:7], axis=0)[:, None]


def _bwd_kernel(p_ref, live_ref, org_ref, g_c_ref, g_a_ref, g_d_ref,
                d_p_ref, *, tile_size):
    p = p_ref[0]
    live = live_ref[0]
    origin = org_ref
    sigma, alpha_raw, keep, dx, dy = _unpack(p, live, origin, tile_size)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    log1m = jnp.log1p(-alpha)
    log_t = _cumsum0(log1m)
    t_excl = jnp.exp(log_t - log1m)          # [K, P]
    w_live = t_excl > TRANSMITTANCE_EPS
    w = jnp.where(w_live, alpha * t_excl, 0.0)

    g_c = g_c_ref[0]                          # [P, C]
    g_a = g_a_ref[0][:, 0].reshape(1, -1)     # [1, P]
    g_d = g_d_ref[0][:, 0].reshape(1, -1)     # [1, P]

    d_col = jnp.dot(w, g_c, preferred_element_type=jnp.float32)  # [K, C]
    d_dep = jnp.sum(w * g_d, axis=1)[:, None]                    # [K, 1]

    # per-(gaussian, pixel) upstream value s = g_c . color + g_d * depth + g_a
    s = (
        jnp.dot(p[:, _HDR:], g_c.T, preferred_element_type=jnp.float32)
        + p[:, 6:7] * g_d
        + g_a
    )  # [K, P]
    ws = w * s
    suffix = jnp.sum(ws, axis=0, keepdims=True) - _cumsum0(ws)
    d_alpha = jnp.where(
        w_live, t_excl * s - suffix / jnp.maximum(1.0 - alpha, 1e-6), 0.0
    )
    d_alpha = jnp.where(keep & (alpha_raw < MAX_ALPHA), d_alpha, 0.0)

    d_sigma = -alpha * d_alpha                # [K, P]
    d_op = jnp.sum(jnp.where(keep, jnp.exp(-sigma) * d_alpha, 0.0), axis=1)
    d_op = jnp.where(p[:, 5] > 0, d_op, 0.0)[:, None]

    d_dx = d_sigma * (p[:, 2:3] * dx + p[:, 3:4] * dy)
    d_dy = d_sigma * (p[:, 4:5] * dy + p[:, 3:4] * dx)
    d_mu = jnp.stack((jnp.sum(d_dx, axis=1), jnp.sum(d_dy, axis=1)), axis=-1)
    d_con = jnp.stack(
        (
            jnp.sum(d_sigma * 0.5 * dx * dx, axis=1),
            jnp.sum(d_sigma * dx * dy, axis=1),
            jnp.sum(d_sigma * 0.5 * dy * dy, axis=1),
        ),
        axis=-1,
    )
    d_p_ref[0] = jnp.concatenate((d_mu, d_con, d_op, d_dep, d_col), axis=-1)


def _pack_params(tile_gid, means2d, conics, opacities, colors, depths):
    safe = jnp.maximum(tile_gid, 0)
    live = (tile_gid >= 0).astype(jnp.float32)
    packed_src = jnp.concatenate(
        (means2d, conics, opacities[:, None], depths[:, None], colors), axis=-1
    )  # [N, 7+C]
    p = packed_src[safe]                        # [T, K, 7+C]
    # zero the opacity of dead slots so they never contribute
    p = p.at[..., 5].multiply(live)
    return p, live[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def composite_tiles_pallas(
    tile_gid, tile_origin, means2d, conics, opacities, colors, depths,
    tile_size: int = 16,
):
    out, _ = _composite_fwd_impl(
        tile_gid, tile_origin, means2d, conics, opacities, colors, depths,
        tile_size,
    )
    return out


def _row_spec(*dims):
    return pl.BlockSpec((1,) + dims, lambda i: (i,) + (0,) * len(dims),
                        memory_space=pltpu.VMEM)


def _composite_fwd_impl(
    tile_gid, tile_origin, means2d, conics, opacities, colors, depths, tile_size
):
    t, k = tile_gid.shape
    p_sz = tile_size * tile_size
    c = colors.shape[-1]
    packed, live = _pack_params(
        tile_gid, means2d, conics, opacities, colors, depths
    )
    out_c, out_a, out_d = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_size=tile_size),
        grid=(t,),
        in_specs=[_row_spec(k, _HDR + c), _row_spec(k, 1), _row_spec(1, 2)],
        out_specs=(_row_spec(p_sz, c), _row_spec(p_sz, 1), _row_spec(p_sz, 1)),
        out_shape=(
            jax.ShapeDtypeStruct((t, p_sz, c), jnp.float32),
            jax.ShapeDtypeStruct((t, p_sz, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, p_sz, 1), jnp.float32),
        ),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(packed, live, tile_origin[:, None, :])
    return (out_c, out_a[..., 0], out_d[..., 0]), None


def _composite_fwd(tile_gid, tile_origin, means2d, conics, opacities, colors,
                   depths, tile_size):
    out, _ = _composite_fwd_impl(
        tile_gid, tile_origin, means2d, conics, opacities, colors, depths,
        tile_size,
    )
    res = (tile_gid, tile_origin, means2d, conics, opacities, colors, depths)
    return out, res


def _composite_bwd(tile_size, res, cts):
    tile_gid, tile_origin, means2d, conics, opacities, colors, depths = res
    g_c, g_a, g_d = cts
    t, k = tile_gid.shape
    p_sz = tile_size * tile_size
    c = colors.shape[-1]
    packed, live = _pack_params(
        tile_gid, means2d, conics, opacities, colors, depths
    )

    d_packed = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_size=tile_size),
        grid=(t,),
        in_specs=[
            _row_spec(k, _HDR + c), _row_spec(k, 1), _row_spec(1, 2),
            _row_spec(p_sz, c), _row_spec(p_sz, 1), _row_spec(p_sz, 1),
        ],
        out_specs=_row_spec(k, _HDR + c),
        out_shape=jax.ShapeDtypeStruct((t, k, _HDR + c), jnp.float32),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(packed, live, tile_origin[:, None, :],
      g_c, g_a[..., None], g_d[..., None])

    # one segment-sum scatters the packed per-slot grads to per-Gaussian grads
    n = means2d.shape[0]
    flat_gid = tile_gid.reshape(-1)
    seg = jnp.where(flat_gid >= 0, flat_gid, n)
    d_flat = jax.ops.segment_sum(
        d_packed.reshape(-1, _HDR + c), seg, num_segments=n + 1
    )[:n]
    return (
        None, None,
        d_flat[:, 0:2],            # means2d
        d_flat[:, 2:5],            # conics
        d_flat[:, 5],              # opacities
        d_flat[:, _HDR:],          # colors
        d_flat[:, 6],              # depths
    )


composite_tiles_pallas.defvjp(_composite_fwd, _composite_bwd)
