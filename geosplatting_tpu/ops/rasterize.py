"""Tile-binned differentiable Gaussian rasterization — the keystone op.

Functional replacement for gsplat's ``rasterization`` with the exact contract
the reference consumes (``rfstudio/model/gsplat.py:129-183``,
``rfstudio/model/geosplat.py:276-302``): N-channel colors (>=14 used by the
deferred G-buffer path), alpha output, expected-depth ('ED') mode,
'antialiased' opacity compensation, sh_degree evaluation, and screen-space
``means2d`` gradients for densification.

TPU-first design (no CUDA atomics / warp scans):

1. ``project`` — dense EWA projection over all N Gaussians (ops/projection.py).
2. **Static-shape tile binning** — each Gaussian expands to its covered
   (tile, depth) pairs inside a fixed pair budget via cumsum+searchsorted,
   then one XLA lexicographic sort by (tile, depth) and a per-tile
   fixed-capacity gather. Integer work, gradient-free.
3. **Dense compositing** — per tile, alphas for all (gaussian, pixel) pairs
   at once; front-to-back transmittance as an exclusive cumsum in log space
   (no sequential loop); color accumulation is a [K, P] x [K, C] matmul
   (MXU). Tiles are processed in checkpointed chunks so the autodiff
   backward recomputes instead of storing [T, K, P] intermediates.

The Pallas kernel path with a hand-written VJP lives in
``rasterize_pairs.py`` (the single accelerator backend); this file is the
reference/autodiff path (the single CPU/test backend) and the shared
binning frontend.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graphics import gmath
from .projection import Projected, project

TRANSMITTANCE_EPS = 1e-4
MIN_ALPHA = 1.0 / 255.0
MAX_ALPHA = 0.999


class TileBins(NamedTuple):
    tile_gid: jnp.ndarray      # [T, K_cap] int32 gaussian index per slot, -1 = empty
    total_pairs: jnp.ndarray   # [] int32 — actual pair count (overflow check)
    num_tiles_xy: tuple[int, int]


def _float_sort_key(depth: jnp.ndarray) -> jnp.ndarray:
    """Positive-float depth -> order-preserving int32 key."""
    return jax.lax.bitcast_convert_type(depth, jnp.int32)


def bin_gaussians(
    proj: Projected,
    width: int,
    height: int,
    *,
    tile_size: int,
    max_pairs: int,
    tile_capacity: int,
    near: float = 0.01,
    far: float = 1e10,
) -> TileBins:
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    num_tiles = tw * th

    means2d = jax.lax.stop_gradient(proj.means2d)
    valid = proj.radii > 0

    # opacity-aware per-axis rect when the projection provides it (exact:
    # everything outside is below the MIN_ALPHA keep-cutoff — see
    # projection.Projected), circular radius rect otherwise (2DGS)
    if proj.extents is not None:
        rx = jax.lax.stop_gradient(proj.extents[:, 0])
        ry = jax.lax.stop_gradient(proj.extents[:, 1])
    else:
        rx = ry = proj.radii.astype(jnp.float32)
    tx0 = jnp.clip(jnp.floor((means2d[:, 0] - rx) / tile_size), 0, tw).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((means2d[:, 1] - ry) / tile_size), 0, th).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((means2d[:, 0] + rx) / tile_size), 0, tw).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((means2d[:, 1] + ry) / tile_size), 0, th).astype(jnp.int32)
    bw = jnp.maximum(tx1 - tx0, 0)
    bh = jnp.maximum(ty1 - ty0, 0)
    ntiles = jnp.where(valid, bw * bh, 0)

    offsets = jnp.cumsum(ntiles)                      # [N] inclusive
    total = offsets[-1]
    starts = offsets - ntiles

    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    gid = jnp.searchsorted(
        offsets, slot, side="right", method="sort"
    ).astype(jnp.int32)
    gid = jnp.minimum(gid, ntiles.shape[0] - 1)
    local = slot - starts[gid]
    w_g = jnp.maximum(bw[gid], 1)
    tile_x = tx0[gid] + local % w_g
    tile_y = ty0[gid] + local // w_g
    tile_id = tile_y * tw + tile_x
    in_range = slot < jnp.minimum(total, max_pairs)
    tile_id = jnp.where(in_range, tile_id, num_tiles)  # sentinel bucket

    # pack (tile, depth) into one 31-bit key: a single-key sort is ~2x the
    # throughput of a two-key lexicographic sort on TPU. Depth quantization
    # only reorders Gaussians closer than ~2^-depth_bits in relative depth.
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 31 - tile_bits
    if depth_bits >= 16:
        # camera-constant log-depth quantization: ~2^-19 relative depth
        # resolution, and deterministic across image shards (tile_sharding)
        depth = jax.lax.stop_gradient(proj.depths)[gid]
        log_span = float(np.log(max(far / near, 1.0 + 1e-6)))
        dq = jnp.clip(
            (jnp.log(jnp.maximum(depth / near, 1e-6)) / log_span
             * ((1 << depth_bits) - 1)).astype(jnp.int32),
            0, (1 << depth_bits) - 1,
        )
        packed = tile_id * (1 << depth_bits) + jnp.where(in_range, dq, 0)
        sorted_key, sorted_gid = jax.lax.sort((packed, gid), dimension=0, num_keys=1)
        sorted_tile = sorted_key // (1 << depth_bits)
    else:
        depth_key = jnp.where(
            in_range,
            _float_sort_key(jax.lax.stop_gradient(proj.depths))[gid],
            jnp.iinfo(jnp.int32).max,
        )
        sorted_tile, _, sorted_gid = jax.lax.sort(
            (tile_id, depth_key, gid), dimension=0, num_keys=2
        )

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(sorted_tile, tile_range, side="left", method="sort")
    seg_end = jnp.searchsorted(sorted_tile, tile_range, side="right", method="sort")
    counts = seg_end - seg_start

    k = jnp.arange(tile_capacity, dtype=jnp.int32)
    idx = seg_start[:, None] + k[None, :]
    in_seg = k[None, :] < counts[:, None]
    tile_gid = jnp.where(
        in_seg, sorted_gid[jnp.clip(idx, 0, max_pairs - 1)], -1
    ).astype(jnp.int32)
    return TileBins(tile_gid=tile_gid, total_pairs=total, num_tiles_xy=(tw, th))


def _tile_pixel_grid(tile_size: int) -> jnp.ndarray:
    r = jnp.arange(tile_size, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack((px.reshape(-1), py.reshape(-1)), axis=-1)  # [P, 2]


def composite_tiles_reference(
    tile_gid: jnp.ndarray,     # [T, K]
    tile_origin: jnp.ndarray,  # [T, 2] float pixel origin of each tile
    means2d: jnp.ndarray,      # [N, 2]
    conics: jnp.ndarray,       # [N, 3]
    opacities: jnp.ndarray,    # [N]
    colors: jnp.ndarray,       # [N, C]
    depths: jnp.ndarray,       # [N]
    *,
    tile_size: int,
    tile_chunk: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Front-to-back composite each tile. Returns (color [T,P,C], alpha [T,P],
    depth_accum [T,P]) with P = tile_size**2."""
    pix_local = _tile_pixel_grid(tile_size)  # [P, 2]

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_fn(args):
        gid, origin = args  # [C_t, K], [C_t, 2]
        safe = jnp.maximum(gid, 0)
        live = (gid >= 0).astype(jnp.float32)  # [C_t, K]
        mu = means2d[safe]        # [C_t, K, 2]
        con = conics[safe]        # [C_t, K, 3]
        op = opacities[safe]      # [C_t, K]
        col = colors[safe]        # [C_t, K, C]
        dep = depths[safe]        # [C_t, K]

        pix = origin[:, None, :] + pix_local[None, :, :]          # [C_t, P, 2]
        dx = mu[:, :, None, 0] - pix[:, None, :, 0]               # [C_t, K, P]
        dy = mu[:, :, None, 1] - pix[:, None, :, 1]
        sigma = (
            0.5 * (con[:, :, None, 0] * dx * dx + con[:, :, None, 2] * dy * dy)
            + con[:, :, None, 1] * dx * dy
        )
        alpha = jnp.minimum(op[:, :, None] * jnp.exp(-sigma), MAX_ALPHA)
        alpha = jnp.where(
            (sigma >= 0) & (alpha >= MIN_ALPHA) & (live[:, :, None] > 0), alpha, 0.0
        )
        log_t = jnp.cumsum(jnp.log1p(-alpha), axis=1)             # inclusive
        t_excl = jnp.exp(log_t - jnp.log1p(-alpha))               # exclusive
        weight = alpha * t_excl
        weight = jnp.where(t_excl > TRANSMITTANCE_EPS, weight, 0.0)
        out_c = jnp.einsum("tkp,tkc->tpc", weight, col)
        out_a = jnp.sum(weight, axis=1)
        out_d = jnp.einsum("tkp,tk->tp", weight, dep)
        return out_c, out_a, out_d

    num_tiles = tile_gid.shape[0]
    pad = (-num_tiles) % tile_chunk
    gid_p = jnp.concatenate([tile_gid, -jnp.ones((pad,) + tile_gid.shape[1:], jnp.int32)])
    org_p = jnp.concatenate([tile_origin, jnp.zeros((pad, 2))])
    gid_c = gid_p.reshape(-1, tile_chunk, *tile_gid.shape[1:])
    org_c = org_p.reshape(-1, tile_chunk, 2)
    out_c, out_a, out_d = jax.lax.map(chunk_fn, (gid_c, org_c))
    flat = lambda x: x.reshape((-1,) + x.shape[2:])[:num_tiles]
    return flat(out_c), flat(out_a), flat(out_d)


def _tiles_to_image(tiles: jnp.ndarray, tw: int, th: int, tile_size, height: int, width: int) -> jnp.ndarray:
    from .rasterize_pairs import tile_wh

    tsx, tsy = tile_wh(tile_size)
    c = tiles.shape[-1]
    img = tiles.reshape(th, tw, tsy, tsx, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(th * tsy, tw * tsx, c)
    return img[:height, :width]


def rasterize(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,      # linear scales
    opacities: jnp.ndarray,   # [N] in [0,1]
    colors: jnp.ndarray,      # [N, C] or [N, K_sh, 3] when sh_degree is set
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
    rasterize_mode: str = "classic",
    radius_clip: float = 0.0,
    render_mode: str = "RGB",
    means2d_offset: jnp.ndarray | None = None,
    tile_chunk: int = 8,
    backend: str = "auto",
    chunk_size: int = 128,
    lim_override: tuple | None = None,
    max_pairs_override: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Render one camera. Returns (render [H,W,C(+1)], alpha [H,W,1], info).

    ``means2d_offset`` is a zeros-valued [N,2] hook: gradients w.r.t. it are
    the screen-space position gradients used by the densification heuristic
    (the JAX analog of gsplat's ``info["means2d"].retain_grad()`` consumed at
    ``rfstudio/model/gsplat.py:174-183``).
    """
    n = means.shape[0]
    proj = project(
        means, quats, scales, opacities, viewmat, K, width, height,
        near=near, far=far, rasterize_mode=rasterize_mode, radius_clip=radius_clip,
        lim_override=lim_override,
    )
    means2d = proj.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset
        proj = proj._replace(means2d=means2d)

    if sh_degree is not None:
        campos = -viewmat[:3, :3].T @ viewmat[:3, 3]
        viewdir = gmath.safe_normalize(means - campos)
        colors = jnp.maximum(
            gmath.eval_sh(sh_degree, colors, viewdir) + 0.5, 0.0
        )
    return rasterize_projected(
        proj, colors, width, height, near=near, far=far,
        tile_size=tile_size, tile_capacity=tile_capacity,
        pairs_per_gaussian=pairs_per_gaussian, render_mode=render_mode,
        tile_chunk=tile_chunk, backend=backend, chunk_size=chunk_size,
        max_pairs_override=max_pairs_override,
    )


def bin_cameras_batched(
    means: jnp.ndarray,
    quats: jnp.ndarray,       # normalized
    scales: jnp.ndarray,      # linear scales
    opacities_b: jnp.ndarray, # [B, N] (per-camera: culling may zero some)
    viewmats_b: jnp.ndarray,  # [B, 4, 4]
    Ks_b: jnp.ndarray,        # [B, 3, 3]
    width: int,
    height: int,
    *,
    near: float = 0.01,
    far: float = 1e10,
    rasterize_mode: str = "antialiased",
    tile_size: int = 16,
    pairs_per_gaussian: int = 8,
    max_pairs_override: int | None = None,
    chunk_size: int = 128,
):
    """Projection + pair binning vmapped over the camera batch.

    The binning front-end (EWA projection + pair expansion + the packed-key /
    segment / inversion sorts) is gradient-free integer work, and batched TPU
    sorts cost about the same as one unbatched sort — so running it once for
    the whole batch amortizes the per-camera sort overhead ~B-fold. Returns
    (proj_b, bins_b, kc, max_pairs); feed per-camera slices to
    ``composite_from_bins`` inside the camera scan."""
    from .rasterize_pairs import bin_pairs, pick_chunk_size

    n = means.shape[0]
    max_pairs = max(int(pairs_per_gaussian) * n, 1 << 12)
    if max_pairs_override is not None:
        max_pairs = max(min(max_pairs, int(max_pairs_override)), 1 << 12)
    from .rasterize_pairs import tile_wh

    tsx, tsy = tile_wh(tile_size)
    tw = -(-width // tsx)
    th = -(-height // tsy)
    kc = pick_chunk_size(max_pairs, tw * th, chunk_size)

    def proj_one(viewmat, K, op):
        return project(
            means, quats, scales, op, viewmat, K, width, height,
            near=near, far=far, rasterize_mode=rasterize_mode,
        )

    proj_b = jax.vmap(proj_one)(viewmats_b, Ks_b, opacities_b)
    bins_b = jax.vmap(
        lambda p: bin_pairs(
            p, width, height, tile_size=tile_size, max_pairs=max_pairs,
            chunk_size=kc, near=near, far=far,
        )
    )(proj_b)
    return proj_b, bins_b, kc, max_pairs


def composite_from_bins(
    proj,
    bins,
    colors: jnp.ndarray,      # [N, C]
    *,
    kc: int,
    max_pairs: int,
    width: int,
    height: int,
    tile_size: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """One camera's composite from precomputed (proj, bins) — the per-camera
    half of the batched-binning path (custom-vjp boundary: pack gather +
    kernels + sorted segment-sum reassembly)."""
    from .rasterize_pairs import composite_pairs_pallas, tile_wh

    tsx, tsy = tile_wh(tile_size)
    tw = -(-width // tsx)
    th = -(-height // tsy)
    tiles_c, tiles_a, _ = composite_pairs_pallas(
        bins, (tsx, tsy), kc, (tw, th), proj.means2d, proj.conics,
        proj.opacities, colors, proj.depths,
    )
    img_c = _tiles_to_image(tiles_c, tw, th, (tsx, tsy), height, width)
    img_a = _tiles_to_image(tiles_a[..., None], tw, th, (tsx, tsy), height, width)
    info = {
        "total_pairs": bins.total_pairs,
        "max_pairs": max_pairs,
    }
    return img_c, img_a, info


def rasterize_batched(
    means: jnp.ndarray,
    quats: jnp.ndarray,       # normalized
    scales: jnp.ndarray,      # linear scales
    opacities_b: jnp.ndarray, # [B, N] (per-camera: culling may zero some)
    colors_b: jnp.ndarray,    # [B, N, C] per-camera shaded colors
    viewmats_b: jnp.ndarray,  # [B, 4, 4]
    Ks_b: jnp.ndarray,        # [B, 3, 3]
    width: int,
    height: int,
    *,
    near: float = 0.01,
    far: float = 1e10,
    rasterize_mode: str = "antialiased",
    tile_size: int = 16,
    pairs_per_gaussian: int = 8,
    max_pairs_override: int | None = None,
    chunk_size: int = 128,
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Batched-camera rasterization on the pairs backend: vmapped binning
    (``bin_cameras_batched``) + a per-camera scan of the composite kernels.
    Returns (render [B, H, W, C], alpha [B, H, W, 1], info)."""
    proj_b, bins_b, kc, max_pairs = bin_cameras_batched(
        means, quats, scales, opacities_b, viewmats_b, Ks_b, width, height,
        near=near, far=far, rasterize_mode=rasterize_mode,
        tile_size=tile_size, pairs_per_gaussian=pairs_per_gaussian,
        max_pairs_override=max_pairs_override, chunk_size=chunk_size,
    )

    def one(xs):
        proj, bins, colors = xs
        img_c, img_a, _ = composite_from_bins(
            proj, bins, colors, kc=kc, max_pairs=max_pairs,
            width=width, height=height, tile_size=tile_size,
        )
        return img_c, img_a

    img_c_b, img_a_b = jax.lax.map(one, (proj_b, bins_b, colors_b))
    info = {
        "total_pairs": bins_b.total_pairs.max(),
        "max_pairs": max_pairs,
    }
    return img_c_b, img_a_b, info


def rasterize_projected(
    proj: Projected,
    colors: jnp.ndarray,
    width: int,
    height: int,
    *,
    near: float = 0.01,
    far: float = 1e10,
    tile_size: int = 16,
    tile_capacity: int = 1024,
    pairs_per_gaussian: int = 8,
    render_mode: str = "RGB",
    tile_chunk: int = 8,
    backend: str = "auto",
    chunk_size: int = 128,
    max_pairs_override: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Binning + compositing on an already-projected Gaussian set — the
    entry point for sharded renderers that split projection and compositing
    across devices (parallel/gs_sharding.py)."""
    n = proj.means2d.shape[0]
    # every binning/pack/sort/kernel buffer scales with this static budget;
    # models whose worst-case N far exceeds the live count should pass
    # max_pairs_override (watch the pair_fill/total_pairs observables)
    max_pairs = max(int(pairs_per_gaussian) * n, 1 << 12)
    if max_pairs_override is not None:
        max_pairs = max(min(max_pairs, int(max_pairs_override)), 1 << 12)

    if render_mode in ("ED", "RGB+ED", "D", "RGB+D"):
        pass
    elif render_mode != "RGB":
        raise ValueError(f"unknown render_mode: {render_mode}")

    from .rasterize_pairs import tile_wh

    tsx, tsy = tile_wh(tile_size)
    if backend == "auto":
        # compiled pair kernels on accelerators; vectorized XLA reference on
        # CPU (interpret-mode pallas is a python loop — tests opt in explicitly)
        backend = "pairs" if jax.default_backend() != "cpu" else "reference"
    if backend == "reference" and tsx != tsy:
        # tiling is an implementation detail (the composited image is the
        # same up to float reassociation): the square-only XLA reference
        # path just squares a rect request so models can default to the
        # pairs-optimal 16x8 without breaking CPU tests
        tsx = tsy = max(tsx, tsy)
    tile_size = (tsx, tsy) if tsx != tsy else tsx  # normalized (str parsed)
    tw = -(-width // tsx)
    th = -(-height // tsy)
    if backend in ("pallas", "pairs"):
        # pair-centric chunked kernels (work scales with actual pairs; no
        # per-tile capacity truncation) — the default production path
        from .rasterize_pairs import (
            bin_pairs, composite_pairs_pallas, pick_chunk_size,
        )
        kc = pick_chunk_size(max_pairs, tw * th, chunk_size)
        pbins = bin_pairs(
            proj, width, height, tile_size=(tsx, tsy), max_pairs=max_pairs,
            chunk_size=kc, near=near, far=far,
        )
        tiles_c, tiles_a, tiles_d = composite_pairs_pallas(
            pbins, (tsx, tsy), kc, (tw, th), proj.means2d, proj.conics,
            proj.opacities, colors, proj.depths,
        )
        total_pairs = pbins.total_pairs
    elif backend == "reference":
        bins = bin_gaussians(
            proj, width, height,
            tile_size=tile_size, max_pairs=max_pairs,
            tile_capacity=tile_capacity, near=near, far=far,
        )
        total_pairs = bins.total_pairs
        ty, tx = jnp.meshgrid(jnp.arange(th), jnp.arange(tw), indexing="ij")
        tile_origin = jnp.stack(
            (tx.reshape(-1) * tile_size, ty.reshape(-1) * tile_size), axis=-1
        ).astype(jnp.float32)
        tiles_c, tiles_a, tiles_d = composite_tiles_reference(
            bins.tile_gid, tile_origin, proj.means2d, proj.conics,
            proj.opacities, colors, proj.depths,
            tile_size=tile_size, tile_chunk=tile_chunk,
        )
    else:
        # one backend per role (VERDICT r2 #10): 'pairs' on accelerators,
        # 'reference' on CPU; the dense [T, K_cap] tile-table kernels
        # ('pallas_dense') were superseded by the pair kernels and deleted
        raise ValueError(f"unknown backend: {backend}")

    img_c = _tiles_to_image(tiles_c, tw, th, tile_size, height, width)
    img_a = _tiles_to_image(tiles_a[..., None], tw, th, tile_size, height, width)
    img_d = _tiles_to_image(tiles_d[..., None], tw, th, tile_size, height, width)

    if render_mode == "RGB":
        render = img_c
    else:
        depth = img_d
        if render_mode in ("ED", "RGB+ED"):
            depth = depth / jnp.maximum(img_a, 1e-10)
        render = depth if render_mode in ("ED", "D") else jnp.concatenate([img_c, depth], -1)

    info = {
        "means2d": proj.means2d,
        "radii": proj.radii,
        "depths": proj.depths,
        "total_pairs": total_pairs,
        "max_pairs": max_pairs,
    }
    return render, img_a, info
