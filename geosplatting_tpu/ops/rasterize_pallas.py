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


def _alphas(mu, con, op, live, origin, tile_size):
    """[K, P] alphas with culling masks applied. All refs already loaded."""
    px, py = _pixel_grid(tile_size)
    px = px + origin[0, 0, 0]
    py = py + origin[0, 0, 1]
    dx = mu[:, 0:1] - px  # [K, P]
    dy = mu[:, 1:2] - py
    sigma = 0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy) + con[:, 1:2] * dx * dy
    alpha = jnp.minimum(op * jnp.exp(-sigma), MAX_ALPHA)
    return jnp.where((sigma >= 0) & (alpha >= MIN_ALPHA) & (live > 0), alpha, 0.0)


def _fwd_kernel(mu_ref, con_ref, op_ref, col_ref, dep_ref, live_ref, org_ref,
                out_c_ref, out_a_ref, out_d_ref, *, tile_size):
    alpha = _alphas(mu_ref[0], con_ref[0], op_ref[0],
                    live_ref[0], org_ref, tile_size)
    log_t = _cumsum0(jnp.log1p(-alpha))
    t_excl = jnp.exp(log_t - jnp.log1p(-alpha))
    w = jnp.where(t_excl > TRANSMITTANCE_EPS, alpha * t_excl, 0.0)  # [K, P]
    out_c_ref[0] = jnp.dot(
        w.T, col_ref[0], preferred_element_type=jnp.float32
    )  # [P, C]
    out_a_ref[0] = jnp.sum(w, axis=0)[:, None]
    out_d_ref[0] = jnp.sum(w * dep_ref[0], axis=0)[:, None]


def _bwd_kernel(mu_ref, con_ref, op_ref, col_ref, dep_ref, live_ref, org_ref,
                g_c_ref, g_a_ref, g_d_ref,
                d_mu_ref, d_con_ref, d_op_ref, d_col_ref, d_dep_ref,
                *, tile_size):
    mu = mu_ref[0]
    con = con_ref[0]
    op = op_ref[0]
    live = live_ref[0]
    origin = org_ref
    px, py = _pixel_grid(tile_size)
    px = px + origin[0, 0, 0]
    py = py + origin[0, 0, 1]
    dx = mu[:, 0:1] - px
    dy = mu[:, 1:2] - py
    sigma = 0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy) + con[:, 1:2] * dx * dy
    alpha_raw = jnp.minimum(op * jnp.exp(-sigma), MAX_ALPHA)
    keep = (sigma >= 0) & (alpha_raw >= MIN_ALPHA) & (live > 0)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    log1m = jnp.log1p(-alpha)
    log_t = _cumsum0(log1m)
    t_excl = jnp.exp(log_t - log1m)          # [K, P]
    w_live = t_excl > TRANSMITTANCE_EPS
    w = jnp.where(w_live, alpha * t_excl, 0.0)

    g_c = g_c_ref[0]                          # [P, C]
    g_a = g_a_ref[0][:, 0].reshape(1, -1)           # [1, P]
    g_d = g_d_ref[0][:, 0].reshape(1, -1)           # [1, P]

    # d color: [K, P] x [P, C]
    d_col_ref[0] = jnp.dot(w, g_c, preferred_element_type=jnp.float32)
    d_dep_ref[0] = jnp.sum(w * g_d, axis=1)[:, None]

    # per-(gaussian, pixel) upstream value s = g_c . color + g_d * depth + g_a
    s = (
        jnp.dot(col_ref[0], g_c.T, preferred_element_type=jnp.float32)
        + dep_ref[0] * g_d
        + g_a
    )  # [K, P]
    ws = w * s
    # suffix sum over j > k: total - inclusive cumsum
    suffix = jnp.sum(ws, axis=0, keepdims=True) - _cumsum0(ws)
    d_alpha = jnp.where(
        w_live, t_excl * s - suffix / jnp.maximum(1.0 - alpha, 1e-6), 0.0
    )
    d_alpha = jnp.where(keep & (alpha_raw < MAX_ALPHA), d_alpha, 0.0)

    d_sigma = -alpha * d_alpha                # [K, P]
    d_op = jnp.sum(jnp.where(keep, jnp.exp(-sigma) * d_alpha, 0.0), axis=1)
    d_op_ref[0] = jnp.where(op[:, 0] > 0, d_op, 0.0)[:, None]

    d_dx = d_sigma * (con[:, 0:1] * dx + con[:, 1:2] * dy)
    d_dy = d_sigma * (con[:, 2:3] * dy + con[:, 1:2] * dx)
    d_mu_ref[0] = jnp.stack(
        (jnp.sum(d_dx, axis=1), jnp.sum(d_dy, axis=1)), axis=-1
    )
    d_con_ref[0] = jnp.stack(
        (
            jnp.sum(d_sigma * 0.5 * dx * dx, axis=1),
            jnp.sum(d_sigma * dx * dy, axis=1),
            jnp.sum(d_sigma * 0.5 * dy * dy, axis=1),
        ),
        axis=-1,
    )


def _gather_tile_params(tile_gid, means2d, conics, opacities, colors, depths):
    safe = jnp.maximum(tile_gid, 0)
    live = (tile_gid >= 0).astype(jnp.float32)
    return (
        means2d[safe],                   # [T, K, 2]
        conics[safe],                    # [T, K, 3]
        (opacities[safe] * live)[..., None],  # [T, K, 1]
        colors[safe],                    # [T, K, C]
        depths[safe][..., None],         # [T, K, 1]
        live[..., None],                 # [T, K, 1]
    )


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


def _composite_fwd_impl(
    tile_gid, tile_origin, means2d, conics, opacities, colors, depths, tile_size
):
    t, k = tile_gid.shape
    p = tile_size * tile_size
    c = colors.shape[-1]
    mu, con, op, col, dep, live = _gather_tile_params(
        tile_gid, means2d, conics, opacities, colors, depths
    )
    grid = (t,)

    def row_spec(*dims):
        return pl.BlockSpec((1,) + dims, lambda i: (i,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    out_c, out_a, out_d = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_size=tile_size),
        grid=grid,
        in_specs=[
            row_spec(k, 2), row_spec(k, 3), row_spec(k, 1), row_spec(k, c),
            row_spec(k, 1), row_spec(k, 1), row_spec(1, 2),
        ],
        out_specs=(row_spec(p, c), row_spec(p, 1), row_spec(p, 1)),
        out_shape=(
            jax.ShapeDtypeStruct((t, p, c), jnp.float32),
            jax.ShapeDtypeStruct((t, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, p, 1), jnp.float32),
        ),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(mu, con, op, col, dep, live, tile_origin[:, None, :])
    return (out_c, out_a[..., 0], out_d[..., 0]), (mu, con, op, col, dep, live)


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
    p = tile_size * tile_size
    c = colors.shape[-1]
    mu, con, op, col, dep, live = _gather_tile_params(
        tile_gid, means2d, conics, opacities, colors, depths
    )

    def row_spec(*dims):
        return pl.BlockSpec((1,) + dims, lambda i: (i,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    d_mu_t, d_con_t, d_op_t, d_col_t, d_dep_t = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_size=tile_size),
        grid=(t,),
        in_specs=[
            row_spec(k, 2), row_spec(k, 3), row_spec(k, 1), row_spec(k, c),
            row_spec(k, 1), row_spec(k, 1), row_spec(1, 2),
            row_spec(p, c), row_spec(p, 1), row_spec(p, 1),
        ],
        out_specs=(
            row_spec(k, 2), row_spec(k, 3), row_spec(k, 1), row_spec(k, c),
            row_spec(k, 1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, k, 2), jnp.float32),
            jax.ShapeDtypeStruct((t, k, 3), jnp.float32),
            jax.ShapeDtypeStruct((t, k, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, k, c), jnp.float32),
            jax.ShapeDtypeStruct((t, k, 1), jnp.float32),
        ),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(mu, con, op, col, dep, live, tile_origin[:, None, :],
      g_c, g_a[..., None], g_d[..., None])

    # scatter per-(tile, slot) grads back to per-Gaussian grads
    n = means2d.shape[0]
    flat_gid = tile_gid.reshape(-1)
    seg = jnp.where(flat_gid >= 0, flat_gid, n)  # dump dead slots in a bin

    def seg_sum(x, width):
        flat = x.reshape(-1, width) if x.ndim == 3 else x.reshape(-1, 1)
        out = jax.ops.segment_sum(flat, seg, num_segments=n + 1)[:n]
        return out if x.ndim == 3 else out[:, 0]

    d_means2d = seg_sum(d_mu_t, 2)
    d_conics = seg_sum(d_con_t, 3)
    d_op = seg_sum(d_op_t[..., 0], 1)
    d_colors = seg_sum(d_col_t, c)
    d_depths = seg_sum(d_dep_t[..., 0], 1)
    return (None, None, d_means2d, d_conics, d_op, d_colors, d_depths)


composite_tiles_pallas.defvjp(_composite_fwd, _composite_bwd)
