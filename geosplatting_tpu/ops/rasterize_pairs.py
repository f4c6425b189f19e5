"""Pair-centric tile rasterization backend — gather-minimal Pallas TPU kernels.

The single accelerator backend (the dense [T, K_cap] tile-table kernels it
replaced are deleted; ``rasterize.py``'s XLA reference path serves CPU/tests).
Motivation (measured on v5e): XLA arbitrary-index gathers
and segment-sums dominate the old path (~5-9 ns per gathered index; the
[T, K, C] parameter gather + 1.9M-row segment-sum cost more than all kernel
compute), while ``lax.sort`` is nearly free (<0.5 ms for 300k keys). This
backend therefore:

1. expands Gaussians to (tile, depth) pairs with ONE fused row-gather of the
   per-Gaussian expansion record (instead of six 1-D gathers),
2. sorts pairs once by a packed (tile | quantized-depth) 31-bit key,
3. builds a *chunk list*: each tile's segment of the sorted pair array is
   split into fixed-size chunks of ``chunk_size`` pairs; a static chunk budget
   of ``max_pairs//chunk_size + num_tiles`` covers the worst case and unused
   chunks are compute-skipped dummies,
4. the forward kernel walks chunks sequentially (Pallas grid), streaming the
   depth-sorted pair-parameter array directly from HBM (two KC-row windows +
   an in-kernel dynamic row slice absorb the unaligned segment starts), carries
   per-pixel log-transmittance across a tile's chunks in VMEM scratch, and
   **early-exits saturated chunks** (all pixels below the transmittance
   cutoff) — work scales with *visible* pairs, not tile capacity,
5. the backward kernel walks chunks in reverse, reconstructing exclusive
   transmittance from the saved per-tile total (log T) and a carried suffix,
   and writes per-chunk packed gradients; ONE row-gather maps them back to
   generation order and ONE sorted segment-sum reduces to per-Gaussian grads.

Contract parity: gsplat ``rasterization`` (rfstudio/model/gsplat.py:129-183):
N-channel colors, alpha, expected-depth, antialiased opacity compensation
(in projection), and means2d gradients for densification. Depth and alpha
accumulation ride the color matmul as two extra MXU channels.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import Projected
from .rasterize import MAX_ALPHA, MIN_ALPHA, TRANSMITTANCE_EPS

_INTERPRET: bool | None = None  # None = auto (interpret on CPU backend)
_HDR = 7        # packed header: mu2 | conic3 | opacity1 | depth1
_LOG_EPS = float(np.log(TRANSMITTANCE_EPS))

# --- kernel micro-tuning knobs (env-settable for on-chip A/B sweeps) --------
# Mosaic's dot lowering rejects Precision.HIGH inside kernels — only
# default/highest are valid, enforced here so a bad knob fails with a clear
# message instead of a Mosaic lowering crash.
_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _prec(env_name: str, default: str) -> jax.lax.Precision:
    val = os.environ.get(env_name, default)
    if val not in _PREC:
        raise ValueError(
            f"{env_name}={val!r}: valid options are {sorted(_PREC)} "
            "(Mosaic has no Precision.HIGH dot lowering)"
        )
    return _PREC[val]


# backward geometry-moment matmul: HIGHEST (f32, 6 bf16 passes) is the
# golden-test-exact default; DEFAULT is one bf16 pass.
_MOMENT_PREC = _prec("GEOS_MOMENT_PREC", "highest")
# prefix-scan implementation for in-chunk transmittance/suffix sums:
#   'roll'   — log2(KC) pltpu.roll ladder passes on the VPU (default)
#   'matmul' — one [KC, KC] triangular matmul on the MXU (re-admits a full
#              [KC, P] exp in exchange for killing the ladder passes)
# Measured A/B at the stage-1 production shape (BASELINE.md round-3 table):
# with tight-bounds binning the defaults are kc=128 + roll — kc=256 was the
# pre-tight-bounds optimum (its chunk-padding cost outgrows the chunk-count
# saving once ~22% of pairs are pruned), and matmul at kc=128 loses to roll.
_SCAN_IMPL = os.environ.get("GEOS_SCAN_IMPL", "roll")
_SCAN_PREC = _prec("GEOS_SCAN_PREC", "highest")


def _interpret() -> bool:
    if _INTERPRET is None:
        return jax.default_backend() == "cpu"
    return _INTERPRET


def tile_wh(tile_size) -> tuple[int, int]:
    """Normalize a tile spec to (tile_w, tile_h) pixels.

    Square int (legacy) or a (w, h) tuple. Rectangular 16x8 tiles put
    p_sz = 128 px — exactly one f32 VPU lane register — so the [KC, P]
    elementwise work halves per pair vs 16x16 while small mesh-anchored
    gaussians (the stage-1 population is ~1-2 tiles each) pick up few extra
    row pairs; measured A/B in BASELINE.md round 4."""
    if isinstance(tile_size, str):
        parts = tile_size.split("x")
        tsx = int(parts[0])
        tsy = int(parts[1]) if len(parts) > 1 else tsx
    elif isinstance(tile_size, (tuple, list)):
        tsx, tsy = int(tile_size[0]), int(tile_size[1])
    else:
        tsx = tsy = int(tile_size)
    return tsx, tsy


class PairBins(NamedTuple):
    """Static-shape chunked binning of (tile, depth)-sorted Gaussian pairs."""

    sorted_gid: jnp.ndarray       # [max_pairs] gaussian id per sorted pair (N = invalid)
    pair_gid: jnp.ndarray         # [max_pairs] gaussian id in generation order (N = invalid)
    padslot_of_pair: jnp.ndarray  # [max_pairs] backward-grad row for each generated pair
    # per-gaussian contiguous slot runs in GENERATION (depth-priority) order:
    # gaussian order[i]'s pairs occupy slots [gs_start[i], gs_start[i] +
    # gs_count[i]) — the backward reduces pair grads with a cumsum + two
    # row-gathers (ops/segment_rows.contiguous_segment_sum) instead of a
    # scatter-add, which the round-4 op trace measured at 1.6 GiB/s /
    # ~98 ms per camera (sub-128 minor dims make XLA's scatter RMW a whole
    # (8,128) tile per row). gs_inv maps original gaussian id -> run index.
    gs_start: jnp.ndarray         # [N] int32
    gs_count: jnp.ndarray         # [N] int32
    gs_inv: jnp.ndarray           # [N] int32
    # chunk metadata rides scalar-prefetch SMEM (~1 MB total on v5e), so six
    # [CB] arrays are bit-packed into two:
    #   meta_a = ((count*2 + last)*2 + first) * 2^17 + tile   (tile < 2^17)
    #   meta_b = window * 2^11 + woff                         (woff < 2^11)
    meta_a: jnp.ndarray          # [CB] int32
    meta_b: jnp.ndarray          # [CB] int32
    tile_counts: jnp.ndarray     # [T] pairs per tile
    total_pairs: jnp.ndarray     # [] true pair count (overflow check)


_TILE_PACK = 1 << 17      # meta_a tile field width
_WOFF_PACK = 1 << 11      # meta_b woff field width (so chunk_size <= 2048)
_MAX_CHUNK_BUDGET = 24576  # keeps 2 x [CB] int32 prefetch arrays in SMEM


def chunk_budget(max_pairs: int, num_tiles: int, chunk_size: int) -> int:
    return max_pairs // chunk_size + num_tiles + 1


def pick_chunk_size(max_pairs: int, num_tiles: int, chunk_size: int) -> int:
    """Grow the chunk size until the chunk budget fits the SMEM prefetch
    limit (large scenes want big chunks anyway — per-tile pair counts scale
    with max_pairs/num_tiles)."""
    kc = chunk_size
    while chunk_budget(max_pairs, num_tiles, kc) > _MAX_CHUNK_BUDGET and kc < _WOFF_PACK:
        kc *= 2
    if chunk_budget(max_pairs, num_tiles, kc) > _MAX_CHUNK_BUDGET:
        raise ValueError(
            f"max_pairs={max_pairs} x num_tiles={num_tiles} exceeds the SMEM "
            f"scalar-prefetch budget even at chunk_size={kc} "
            f"(budget {chunk_budget(max_pairs, num_tiles, kc)} > "
            f"{_MAX_CHUNK_BUDGET}); lower max_pairs or raise tile_size"
        )
    return kc


def bin_pairs(
    proj: Projected,
    width: int,
    height: int,
    *,
    tile_size: int,
    max_pairs: int,
    chunk_size: int,
    near: float = 0.01,
    far: float = 1e10,
) -> PairBins:
    tsx, tsy = tile_wh(tile_size)
    tw = -(-width // tsx)
    th = -(-height // tsy)
    num_tiles = tw * th
    kc = chunk_size
    n = proj.means2d.shape[0]

    means2d = jax.lax.stop_gradient(proj.means2d)
    depths = jax.lax.stop_gradient(proj.depths)
    valid = proj.radii > 0

    # opacity-aware per-axis rect when the projection provides it (exact:
    # everything outside is below the MIN_ALPHA keep-cutoff — see
    # projection.Projected), circular radius rect otherwise
    if proj.extents is not None:
        rx = jax.lax.stop_gradient(proj.extents[:, 0])
        ry = jax.lax.stop_gradient(proj.extents[:, 1])
        prune_r = jax.lax.stop_gradient(proj.prune_r)
    else:
        rx = ry = proj.radii.astype(jnp.float32)
        prune_r = None

    tx0 = jnp.clip(jnp.floor((means2d[:, 0] - rx) / tsx), 0, tw).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((means2d[:, 1] - ry) / tsy), 0, th).astype(jnp.int32)
    tx1 = jnp.clip(jnp.ceil((means2d[:, 0] + rx) / tsx), 0, tw).astype(jnp.int32)
    ty1 = jnp.clip(jnp.ceil((means2d[:, 1] + ry) / tsy), 0, th).astype(jnp.int32)
    bw = jnp.maximum(tx1 - tx0, 0)
    ntiles = jnp.where(valid, bw * jnp.maximum(ty1 - ty0, 0), 0)

    # depth-priority budget: allocate pair slots in near-to-far gaussian
    # order, so when total pairs exceed max_pairs the overflow drops the
    # FARTHEST gaussians' pairs (the reference never truncates; with a
    # static budget, dropping by depth keeps the visually dominant near
    # field intact instead of whichever gaussians have high indices).
    # The argsort + its permutation only matter when the budget actually
    # overflows, so the common under-budget step skips them (lax.cond —
    # measured ~0.5 s/step at the stage-1 production shape; under vmap the
    # cond degrades to both-branches-execute, i.e. exactly the old cost).
    def _depth_order(_):
        o = jnp.argsort(jnp.where(ntiles > 0, depths, jnp.inf)).astype(jnp.int32)
        return o, jnp.argsort(o).astype(jnp.int32)

    def _iota_order(_):
        i = jnp.arange(n, dtype=jnp.int32)
        return i, i

    # order's inverse (gs_inv) rides the same cond: when order is the
    # identity its inverse is too, so the common under-budget step skips
    # BOTH argsorts, not just the first
    order, order_inv = jax.lax.cond(
        jnp.sum(ntiles) > max_pairs, _depth_order, _iota_order, None
    )

    # camera-constant log-depth quantization (see rasterize.bin_gaussians)
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = min(31 - tile_bits, 19)
    if depth_bits < 14:
        raise ValueError(
            f"too many tiles for packed-key binning: {num_tiles}"
        )
    log_span = float(np.log(max(far / near, 1.0 + 1e-6)))
    dq = jnp.clip(
        (jnp.log(jnp.maximum(depths / near, 1e-6)) / log_span
         * ((1 << depth_bits) - 1)).astype(jnp.int32),
        0, (1 << depth_bits) - 1,
    )

    # one fused row-gather permutes the expansion record into depth order
    # (a single [N, R] gather instead of R 1-D gathers; the original
    # gaussian id rides along as a column so mapping slots back to ids costs
    # nothing extra), then the slot layout (cumsum/starts) follows the
    # permuted counts. When the projection carries the opacity-aware circular
    # bound, the mean and bound ride the same record as bitcast f32 columns
    # for the per-pair tile prune below.
    cols = [ntiles, tx0, ty0, jnp.maximum(bw, 1), dq,
            jnp.arange(n, dtype=jnp.int32)]
    if prune_r is not None:
        bits = lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.float32), jnp.int32
        )
        cols += [bits(means2d[:, 0]), bits(means2d[:, 1]),
                 bits(prune_r * prune_r)]
    rec = jnp.stack(cols, axis=-1)[order]              # [N, R]; col 5 = orig id
    offsets = jnp.cumsum(rec[:, 0])
    total = offsets[-1]
    starts = offsets - rec[:, 0]
    exp_rec = jnp.concatenate((starts[:, None], rec[:, 1:]), axis=-1)
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    # method='sort' everywhere: TPU sorts are ~free while the default binary-
    # search lowering is log(n) serialized gather rounds (~10x slower here)
    rank = jnp.searchsorted(
        offsets, slot, side="right", method="sort"
    ).astype(jnp.int32)
    rank = jnp.minimum(rank, n - 1)
    e = exp_rec[rank]                                  # [max_pairs, R]
    local = slot - e[:, 0]
    tile_xi = e[:, 1] + local % e[:, 3]
    tile_yi = e[:, 2] + local // e[:, 3]
    tile_id = tile_yi * tw + tile_xi
    in_range = slot < jnp.minimum(total, max_pairs)
    if prune_r is not None:
        # per-pair circle prune: sigma >= |d|^2 / (2 lam_max) everywhere, so
        # a tile whose rect lies beyond prune_r of the mean is entirely below
        # the MIN_ALPHA keep-cutoff — dropping it is exact. This catches the
        # rect corners the per-axis bbox cannot (a rotated ellipse's bbox
        # over-covers its corners; for an isotropic Gaussian the circle cuts
        # ~21% of the rect's tiles at large radii).
        # NOTE (ADVICE r3): slot allocation above uses RECT counts, so pairs
        # killed here still consume max_pairs slots and still count in
        # total_pairs — pair_fill (and the trainers' >0.95 overflow alarm)
        # is therefore rect-based, and under depth-priority overflow a
        # provably-dead corner pair can displace a live far pair. Folding
        # the circle test into ntiles would need per-gaussian tile iteration
        # before allocation (a second expand) — not worth it at current
        # fills; budget tuners should read pair_fill as the rect fill.
        unbits = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
        mx, my, r2 = unbits(e[:, 6]), unbits(e[:, 7]), unbits(e[:, 8])
        x0 = tile_xi.astype(jnp.float32) * jnp.float32(tsx)
        y0 = tile_yi.astype(jnp.float32) * jnp.float32(tsy)
        dx = mx - jnp.clip(mx, x0, x0 + jnp.float32(tsx))
        dy = my - jnp.clip(my, y0, y0 + jnp.float32(tsy))
        in_range = in_range & (dx * dx + dy * dy <= r2)
    tile_id = jnp.where(in_range, tile_id, num_tiles)
    pair_gid = jnp.where(in_range, e[:, 5], n).astype(jnp.int32)

    key = tile_id * (1 << depth_bits) + jnp.where(in_range, e[:, 4], 0)
    sorted_key, sorted_gid, sorted_pos = jax.lax.sort(
        (key, pair_gid, slot), dimension=0, num_keys=1
    )
    sorted_tile = sorted_key // (1 << depth_bits)

    # per-tile segment bounds + chunk layout. method='scan' (binary search)
    # here, NOT 'sort': there are only T+1 (~2.5k) queries against the
    # max_pairs-sorted tile array, so the sort method would re-sort all
    # 1.4M pairs while binary search is log2(max_pairs) rounds of 2.5k-row
    # gathers (the 'sort is free' rule only holds when the query side is
    # itself pair-sized, as in `rank` above).
    seg_start = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left",
        method="scan",
    ).astype(jnp.int32)                                # [T+1]
    counts = seg_start[1:] - seg_start[:-1]            # [T]
    tile_chunks = -(-counts // kc)                     # [T] 0 for empty tiles
    chunk_base_incl = jnp.cumsum(tile_chunks)          # [T]
    chunk_base = chunk_base_incl - tile_chunks         # [T] exclusive
    active = chunk_base_incl[-1]

    cb = chunk_budget(max_pairs, num_tiles, kc)
    cidx = jnp.arange(cb, dtype=jnp.int32)
    ctile = jnp.searchsorted(
        chunk_base_incl, cidx, side="right", method="sort"
    ).astype(jnp.int32)
    is_active = cidx < active
    ctile = jnp.where(is_active, jnp.minimum(ctile, num_tiles - 1), num_tiles)
    # per-chunk meta via small gathers into [T+1]-sized arrays
    seg_start_c = seg_start[jnp.minimum(ctile, num_tiles)]
    base_c = jnp.concatenate([chunk_base, jnp.zeros((1,), jnp.int32)])[
        jnp.minimum(ctile, num_tiles)
    ]
    nchunks_c = jnp.concatenate([tile_chunks, jnp.zeros((1,), jnp.int32)])[
        jnp.minimum(ctile, num_tiles)
    ]
    count_t = jnp.concatenate([counts, jnp.zeros((1,), jnp.int32)])[
        jnp.minimum(ctile, num_tiles)
    ]
    j = cidx - base_c
    src_start = seg_start_c + j * kc
    cnt = jnp.where(is_active, jnp.clip(count_t - j * kc, 0, kc), 0)
    first = (is_active & (j == 0)).astype(jnp.int32)
    last = (is_active & (j == nchunks_c - 1)).astype(jnp.int32)
    window = jnp.where(is_active, src_start // kc, 0).astype(jnp.int32)
    woff = jnp.where(is_active, src_start - window * kc, 0).astype(jnp.int32)
    if num_tiles + 1 > _TILE_PACK:
        raise ValueError(f"too many tiles for packed chunk meta: {num_tiles}")
    assert kc <= _WOFF_PACK, f"chunk_size {kc} exceeds meta packing width"
    meta_a = ((cnt.astype(jnp.int32) * 2 + last) * 2 + first) * _TILE_PACK + ctile
    meta_b = window * _WOFF_PACK + woff

    # backward-grad slot for each sorted pair, then invert to generation order
    sb = jnp.stack((seg_start[:-1], chunk_base), axis=-1)
    sb = jnp.concatenate([sb, jnp.zeros((1, 2), jnp.int32)])
    sbg = sb[jnp.minimum(sorted_tile, num_tiles)]      # one row-gather
    rel = jnp.arange(max_pairs, dtype=jnp.int32) - sbg[:, 0]
    padslot_sorted = (sbg[:, 1] + rel // kc) * kc + rel % kc
    padslot_sorted = jnp.where(sorted_tile < num_tiles, padslot_sorted, cb * kc)
    _, padslot_of_pair = jax.lax.sort(
        (sorted_pos, padslot_sorted), dimension=0, num_keys=1
    )

    return PairBins(
        sorted_gid=sorted_gid,
        pair_gid=pair_gid,
        padslot_of_pair=padslot_of_pair,
        gs_start=starts.astype(jnp.int32),
        gs_count=rec[:, 0].astype(jnp.int32),
        gs_inv=order_inv,
        meta_a=meta_a,
        meta_b=meta_b,
        tile_counts=counts,
        total_pairs=total,
    )


def _tri(k: int, *, exclusive: bool) -> jnp.ndarray:
    """[K, K] lower-triangular ones: L @ x = prefix sum of x along axis 0."""
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return ((c < r) if exclusive else (c <= r)).astype(jnp.float32)


def _cumsum0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 (log-depth roll ladder; Mosaic has no
    cumsum lowering). 'matmul' trades the ladder for one MXU triangular
    matmul."""
    k = x.shape[0]
    if _SCAN_IMPL == "matmul":
        return jax.lax.dot(
            _tri(k, exclusive=False), x,
            precision=_SCAN_PREC, preferred_element_type=jnp.float32,
        )
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, s, 0)
        x = x + jnp.where(row >= s, shifted, 0.0)
        s *= 2
    return x


def _cumprod0_excl(x: jnp.ndarray) -> jnp.ndarray:
    """EXCLUSIVE prefix product along axis 0 (same roll ladder, multiplicative).

    Composing transmittance as a product scan instead of
    ``exp(cumsum(log1p(-alpha)))`` trades a full [KC, P] ``exp`` (the
    kernels' most expensive VPU op) for one extra masked roll; partial
    products of ``1 - alpha`` stay in [0, 1] so f32 underflow simply flushes
    fully-saturated pixels to exactly 0, which the transmittance cutoff
    treats the same as exp(-inf)."""
    k = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    x = jnp.where(row >= 1, pltpu.roll(x, 1, 0), 1.0)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, s, 0)
        x = x * jnp.where(row >= s, shifted, 1.0)
        s *= 2
    return x


def _scan_chunk_unit(alpha: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(exclusive unit-base transmittance [KC, P], chunk log-T total [1, P]).

    The caller multiplies the unit scan by ``exp(base)`` for its [1, P]
    log-space base. 'roll' keeps the [KC, P] work transcendental-free: the
    product scan's last element also yields the chunk total, so the former
    full-[KC, P] ``log1p`` + tree-sum collapses to ONE [1, P] ``log``
    (clamped: partial products that underflow to 0 map to log(1e-30) ~ -69,
    far past the transmittance cutoff, so saturation semantics and the
    backward's suffix reconstruction — which recomputes this total the same
    way — are unchanged). 'matmul' does the exclusive prefix sum of log1p as
    one MXU triangular matmul and pays a full [KC, P] exp; its chunk total
    is the scan's last element plus the last log1p row."""
    k = alpha.shape[0]
    if _SCAN_IMPL == "matmul":
        log1m = jnp.log1p(-alpha)
        csum_excl = jax.lax.dot(
            _tri(k, exclusive=True), log1m,
            precision=_SCAN_PREC, preferred_element_type=jnp.float32,
        )
        chunk_tot = csum_excl[k - 1:k, :] + log1m[k - 1:k, :]
        return jnp.exp(csum_excl), chunk_tot
    pe = _cumprod0_excl(1.0 - alpha)
    prod_tot = pe[k - 1:k, :] * (1.0 - alpha[k - 1:k, :])
    chunk_tot = jnp.log(jnp.maximum(prod_tot, 1e-30))
    return pe, chunk_tot


def _pixel_grid(tsx: int, tsy: int):
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, tsx * tsy), 1)
    px = (flat % tsx).astype(jnp.float32) + 0.5
    py = (flat // tsx).astype(jnp.float32) + 0.5
    return px, py


def _chunk_pieces(p, cnt, tile, tsx, tsy, tw):
    """Shared fwd/bwd per-chunk math: masked alphas for all (pair, pixel)."""
    kc = p.shape[0]
    px, py = _pixel_grid(tsx, tsy)
    fx = (tile % tw) * tsx
    fy = (tile // tw) * tsy
    px = px + fx.astype(jnp.float32)
    py = py + fy.astype(jnp.float32)
    dx = p[:, 0:1] - px
    dy = p[:, 1:2] - py
    sigma = 0.5 * (p[:, 2:3] * dx * dx + p[:, 4:5] * dy * dy) + p[:, 3:4] * dx * dy
    live = jax.lax.broadcasted_iota(jnp.int32, (kc, 1), 0) < cnt
    alpha_raw = jnp.minimum(p[:, 5:6] * jnp.exp(-sigma), MAX_ALPHA)
    keep = (sigma >= 0) & (alpha_raw >= MIN_ALPHA) & live
    return sigma, alpha_raw, keep, dx, dy


def _slice_window(lo_ref, hi_ref, buf_ref, woff, kc):
    buf_ref[0:kc, :] = lo_ref[...]
    buf_ref[kc:2 * kc, :] = hi_ref[...]
    return buf_ref[pl.ds(woff, kc), :]


def _fwd_kernel(
    a_r, b_r,                                        # scalar prefetch (packed)
    lo_ref, hi_ref, out_ref, logt_ref, ctot_ref, buf_ref, carry_ref,
    ccount_ref,
    *, tsx, tsy, kc, tw, c,
):
    i = pl.program_id(0)
    tile, first, last, cnt = _unpack_a(a_r[i])

    @pl.when(first == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        carry_ref[...] = jnp.zeros_like(carry_ref)
        ccount_ref[...] = jnp.zeros_like(ccount_ref)

    ctot_ref[...] = jnp.zeros_like(ctot_ref)
    saturated = jnp.max(carry_ref[...]) < _LOG_EPS

    @pl.when((cnt > 0) & jnp.logical_not(saturated))
    def _():
        # fully-saturated tiles FREEZE: the whole chunk is skipped and its
        # saved per-chunk total stays zero, so the backward's suffix
        # reconstruction (which adds saved totals for skipped chunks) stays
        # consistent — frozen chunks lie entirely behind every pixel's
        # contributor cutoff, so the rank gate zeroes their gradients anyway.
        p = _slice_window(lo_ref, hi_ref, buf_ref, b_r[i] % _WOFF_PACK, kc)
        sigma, alpha_raw, keep, _, _ = _chunk_pieces(p, cnt, tile, tsx, tsy, tw)
        alpha = jnp.where(keep, alpha_raw, 0.0)

        # product-scan transmittance: exp(carry) is [1, P] and the chunk
        # total comes off the scan's last element, so the only full-[KC, P]
        # transcendental left is exp(-sigma)
        texcl_unit, chunk_tot = _scan_chunk_unit(alpha)
        t_excl = jnp.exp(carry_ref[...]) * texcl_unit
        live = jax.lax.broadcasted_iota(jnp.int32, (kc, 1), 0) < cnt
        # per-pixel contributor count: the backward gates pairs by RANK
        # against this (exact, like CUDA rasterizers' last_contributor)
        # instead of re-deriving the eps cutoff from recomputed
        # transmittance, which flips at the boundary under reassociation
        gate = (t_excl > TRANSMITTANCE_EPS) & live
        w = jnp.where(gate, alpha * t_excl, 0.0)
        ccount_ref[...] = ccount_ref[...] + jnp.sum(
            gate.astype(jnp.float32), axis=0, keepdims=True
        )
        ones = jnp.ones((kc, 1), jnp.float32)
        colmat = jnp.concatenate(
            (p[:, _HDR:_HDR + c], p[:, 6:7], ones), axis=1
        )
        # [COUT, P] accumulation — channel-first keeps the out array thin
        out_ref[0] += jax.lax.dot_general(
            colmat, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # per-chunk log-T total, saved so the backward's dead-chunk early
        # exit can advance its suffix carry without recomputing alphas
        ctot_ref[0] = chunk_tot
        carry_ref[...] = carry_ref[...] + chunk_tot

    @pl.when(last == 1)
    def _():
        logt_ref[0, 0:1, :] = carry_ref[...]
        logt_ref[0, 1:2, :] = ccount_ref[...]


def _bwd_kernel(
    a_r, b_r, dead_r,               # scalar prefetch (packed, reversed maps)
    lo_ref, hi_ref, g_ref, logt_ref, ctot_ref, d_ref, buf_ref, suf_log_ref,
    suf_ws_ref, back_ref,
    *, tsx, tsy, kc, tw, c, cb,
):
    i = pl.program_id(0)
    rc = cb - 1 - i
    tile, first, last, cnt = _unpack_a(a_r[rc])

    @pl.when(last == 1)
    def _():
        suf_log_ref[...] = jnp.zeros_like(suf_log_ref)
        suf_ws_ref[...] = jnp.zeros_like(suf_ws_ref)
        back_ref[0] = 0

    d_ref[...] = jnp.zeros_like(d_ref)

    @pl.when((cnt > 0) & (dead_r[rc] == 1))
    def _():
        # dead-chunk early exit: every row of this chunk is behind every
        # pixel's contributor cutoff (rank gate), so all its gradients are
        # zero — advance the suffix carry from the forward's saved per-chunk
        # log-T total and skip the alpha/gradient math entirely
        suf_log_ref[...] = suf_log_ref[...] + ctot_ref[0]
        back_ref[0] = back_ref[0] + cnt

    @pl.when((cnt > 0) & (dead_r[rc] == 0))
    def _():
        p = _slice_window(lo_ref, hi_ref, buf_ref, b_r[rc] % _WOFF_PACK, kc)
        sigma, alpha_raw, keep, dx, dy = _chunk_pieces(p, cnt, tile, tsx, tsy, tw)
        alpha = jnp.where(keep, alpha_raw, 0.0)
        # product-scan reconstruction (mirrors the forward, including the
        # chunk total off the scan's last element so saved and recomputed
        # totals match bit-exactly): transmittance at the chunk start is a
        # [1, P] exp of saved log totals; within the chunk the exclusive
        # unit scan advances it — no [KC, P] exp or log1p
        texcl_unit, chunk_tot = _scan_chunk_unit(alpha)
        t_excl = jnp.exp(
            logt_ref[0, 0:1, :] - suf_log_ref[...] - chunk_tot
        ) * texcl_unit
        # rank gate: pair contributes iff its back-rank clears the saved
        # non-contributor count — bit-exact with the forward's cutoff
        rows = jax.lax.broadcasted_iota(jnp.int32, (kc, 1), 0)
        back_rank = (back_ref[0] + cnt - 1 - rows).astype(jnp.float32)
        w_live = (back_rank >= logt_ref[0, 1:2, :]) & (rows < cnt)
        w = jnp.where(w_live, alpha * t_excl, 0.0)

        g = g_ref[0]                                   # [C+2, P]
        ones = jnp.ones((kc, 1), jnp.float32)
        colmat = jnp.concatenate((p[:, _HDR:_HDR + c], p[:, 6:7], ones), axis=1)
        s = jnp.dot(colmat, g, preferred_element_type=jnp.float32)    # [KC, P]
        d_colmat = jax.lax.dot_general(
            w, g, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [KC, C+2]

        ws = w * s
        ws_suf = ws - _cumsum0(ws)
        ws_tot = -ws_suf[kc - 1:kc, :] + ws[kc - 1:kc, :]
        ws_suf = ws_suf + ws_tot                       # in-chunk inclusive suffix
        suffix_after = suf_ws_ref[...] + ws_suf - ws
        d_alpha = jnp.where(
            w_live, t_excl * s - suffix_after / jnp.maximum(1.0 - alpha, 1e-6), 0.0
        )
        d_alpha = jnp.where(keep & (alpha_raw < MAX_ALPHA), d_alpha, 0.0)
        d_sigma = -alpha * d_alpha
        # geometry gradients via ONE MXU moment matmul instead of five
        # masked [KC, P] multiply+tree-reduce chains on the VPU: every
        # per-pixel reduction below is a polynomial in the pixel coords, so
        # [d_sigma; e^-sigma d_alpha] x [1, x, y, x^2, xy, y^2]^T gives all
        # the moments, and the per-pair combination is thin column math.
        # Tile-LOCAL coords keep the basis small (|x| < tile width) so the
        # expansion has no catastrophic cancellation.
        pxl, pyl = _pixel_grid(tsx, tsy)
        basis = jnp.concatenate(
            (jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl),
            axis=0,
        )                                               # [6, P]
        e_da = jnp.where(keep, jnp.exp(-sigma) * d_alpha, 0.0)
        mom = jax.lax.dot_general(
            jnp.concatenate((d_sigma, e_da), axis=0), basis,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MOMENT_PREC,
        )                                               # [2*KC, 6]
        m0 = mom[0:kc, 0:1]
        mx = mom[0:kc, 1:2]
        my = mom[0:kc, 2:3]
        mxx = mom[0:kc, 3:4]
        mxy = mom[0:kc, 4:5]
        myy = mom[0:kc, 5:6]
        mux = p[:, 0:1] - ((tile % tw) * tsx).astype(jnp.float32)
        muy = p[:, 1:2] - ((tile // tw) * tsy).astype(jnp.float32)
        ca, cb_, cc = p[:, 2:3], p[:, 3:4], p[:, 4:5]
        sx = mux * m0 - mx
        sy = muy * m0 - my
        d_mu = jnp.concatenate(
            (ca * sx + cb_ * sy, cc * sy + cb_ * sx), axis=-1
        )
        d_con = jnp.concatenate(
            (
                0.5 * (mux * sx - mux * mx + mxx),
                mux * sy - muy * mx + mxy,
                0.5 * (muy * sy - muy * my + myy),
            ),
            axis=-1,
        )
        d_op = jnp.where(p[:, 5:6] > 0, mom[kc:2 * kc, 0:1], 0.0)
        d_ref[0] = jnp.concatenate(
            (d_mu, d_con, d_op, d_colmat[:, c:c + 1], d_colmat[:, :c]), axis=-1
        )
        suf_log_ref[...] = suf_log_ref[...] + chunk_tot
        suf_ws_ref[...] = suf_ws_ref[...] + ws_tot
        back_ref[0] = back_ref[0] + cnt


def _pack_pairs(bins: PairBins, means2d, conics, opacities, colors, depths, kc):
    packed_src = jnp.concatenate(
        (means2d, conics, opacities[:, None], depths[:, None], colors), axis=-1
    )
    packed_src = jnp.concatenate(
        [packed_src, jnp.zeros((1, packed_src.shape[1]), packed_src.dtype)]
    )
    pairs = packed_src[bins.sorted_gid]                # [max_pairs, 7+C]
    # pad so every chunk's hi-window block is in range
    pad = jnp.zeros((2 * kc, pairs.shape[1]), pairs.dtype)
    return jnp.concatenate([pairs, pad])


def _scalar_args(bins: PairBins):
    return (bins.meta_a, bins.meta_b)


def _unpack_a(a):
    tile = a % _TILE_PACK
    rest = a // _TILE_PACK
    first = rest % 2
    rest = rest // 2
    last = rest % 2
    cnt = rest // 2
    return tile, first, last, cnt


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def composite_pairs_pallas(
    bins: PairBins,
    tile_size: int,
    chunk_size: int,
    num_tiles_xy: tuple[int, int],
    means2d, conics, opacities, colors, depths,
):
    out, _, _, _ = _composite_fwd_impl(
        bins, tile_size, chunk_size, num_tiles_xy,
        means2d, conics, opacities, colors, depths,
    )
    return out


def _composite_fwd_impl(
    bins, tile_size, kc, num_tiles_xy, means2d, conics, opacities, colors, depths
):
    tsx, tsy = tile_wh(tile_size)
    tw, th = num_tiles_xy
    num_tiles = tw * th
    cb = bins.meta_a.shape[0]
    c = colors.shape[-1]
    p_sz = tsx * tsy
    pw = _HDR + c
    pairs = _pack_pairs(bins, means2d, conics, opacities, colors, depths, kc)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cb,),
        in_specs=[
            pl.BlockSpec((kc, pw),
                         lambda i, ma, mb: (mb[i] // _WOFF_PACK, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, pw),
                         lambda i, ma, mb: (mb[i] // _WOFF_PACK + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c + 2, p_sz),
                         lambda i, ma, mb: (ma[i] % _TILE_PACK, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, p_sz),
                         lambda i, ma, mb: (ma[i] % _TILE_PACK, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_sz),
                         lambda i, ma, mb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * kc, pw), jnp.float32),
            pltpu.VMEM((1, p_sz), jnp.float32),
            pltpu.VMEM((1, p_sz), jnp.float32),
        ],
    )
    out_acc, fwd_meta, chunk_tots = pl.pallas_call(
        functools.partial(
            _fwd_kernel, tsx=tsx, tsy=tsy, kc=kc, tw=tw, c=c
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles + 1, c + 2, p_sz), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles + 1, 2, p_sz), jnp.float32),
            jax.ShapeDtypeStruct((cb, 1, p_sz), jnp.float32),
        ),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*_scalar_args(bins), pairs, pairs)

    nonempty = (bins.tile_counts > 0)[:, None, None]
    tiles = jnp.where(nonempty, out_acc[:num_tiles], 0.0)  # [T, C+2, P]
    fwd_meta = jnp.where(nonempty, fwd_meta[:num_tiles], 0.0)
    # meta channel 0: total log T; channel 1 becomes D = pairs in the tile
    # that did NOT contribute (back-of-list), the backward's rank gate
    d_back = bins.tile_counts[:, None].astype(jnp.float32) - fwd_meta[:, 1, :]
    bwd_meta = jnp.stack([fwd_meta[:, 0, :], d_back], axis=1)  # [T, 2, P]
    out = (
        jnp.swapaxes(tiles[:, :c, :], 1, 2),   # color [T, P, C]
        tiles[:, c + 1, :],                    # alpha [T, P]
        tiles[:, c, :],                        # depth [T, P]
    )
    return out, bwd_meta, chunk_tots, pairs


def _composite_fwd(bins, tile_size, kc, num_tiles_xy,
                   means2d, conics, opacities, colors, depths):
    out, log_t, chunk_tots, pairs = _composite_fwd_impl(
        bins, tile_size, kc, num_tiles_xy,
        means2d, conics, opacities, colors, depths,
    )
    # save the PACKED pair array instead of the five per-gaussian inputs:
    # the backward reads params exclusively through it, re-packing would cost
    # a max_pairs-row gather (+~20 ms/camera at 1.8M pairs on v5e), and the
    # memory is a wash (max_pairs rows vs N rows of the same width). Store it
    # FLAT: a [max_pairs, 10] f32 residual gets its minor dim lane-padded
    # 10 -> 128 by the TPU (8,128) tiled layout — a 12.8x blowup that OOMs
    # when residuals stack across the camera scan (8 x 4.7M x 128 x 4B =
    # 19 GB at the worst-case pair budget); the 1-D copy is compact. The
    # zero-width token carries (N, pair width) for the backward's statics.
    shape_token = jnp.zeros((colors.shape[0], pairs.shape[1], 0), jnp.float32)
    res = (bins, pairs.reshape(-1), shape_token, log_t, chunk_tots)
    return out, res


def _composite_bwd(tile_size, kc, num_tiles_xy, res, cts):
    bins, pairs_flat, shape_token, log_t, chunk_tots = res
    g_c, g_a, g_d = cts
    tsx, tsy = tile_wh(tile_size)
    tw, th = num_tiles_xy
    num_tiles = tw * th
    cb = bins.meta_a.shape[0]
    n, pw = shape_token.shape[:2]
    pairs = pairs_flat.reshape(-1, pw)
    c = pw - _HDR
    p_sz = tsx * tsy

    # dead-chunk mask: a chunk whose highest back-rank is below every pixel's
    # non-contributor count D can produce only zero gradients (rank gate) —
    # the kernel skips it. back_before = pairs behind this chunk in its tile.
    tile_c = bins.meta_a % _TILE_PACK
    cnt_c = bins.meta_a // (_TILE_PACK * 4)
    s_inc = jnp.cumsum(cnt_c)
    tile_end = jax.ops.segment_max(
        s_inc, tile_c, num_segments=num_tiles + 1
    )
    back_before = tile_end[tile_c] - s_inc
    min_d = jnp.min(log_t[:, 1, :], axis=-1)               # [T]
    min_d_c = jnp.concatenate([min_d, jnp.zeros((1,))])[
        jnp.minimum(tile_c, num_tiles)
    ]
    dead = (
        (back_before + cnt_c).astype(jnp.float32) - 1.0 < min_d_c
    ) & (cnt_c > 0)
    dead = dead.astype(jnp.int32)

    # combined output cotangent in colmat channel order: colors | depth | alpha
    g_acc = jnp.concatenate(
        [g_c, g_d[..., None], g_a[..., None]], axis=-1
    )                                                   # [T, P, C+2]
    g_acc = jnp.swapaxes(g_acc, 1, 2)                   # [T, C+2, P]
    g_acc = jnp.concatenate(
        [g_acc, jnp.zeros((1, c + 2, p_sz), g_acc.dtype)]
    )
    log_t_full = jnp.concatenate(
        [log_t, jnp.zeros((1, 2, p_sz), log_t.dtype)]
    )

    # dead chunks route their window/tile block fetches to a fixed block so
    # consecutive dead iterations elide the DMAs
    def win_lo(i, ma, mb, dd):
        rc = cb - 1 - i
        return (jnp.where(dd[rc] == 1, 0, mb[rc] // _WOFF_PACK), 0)

    def win_hi(i, ma, mb, dd):
        rc = cb - 1 - i
        return (jnp.where(dd[rc] == 1, 0, mb[rc] // _WOFF_PACK + 1), 0)

    def tile_blk(i, ma, mb, dd):
        rc = cb - 1 - i
        return (jnp.where(dd[rc] == 1, num_tiles, ma[rc] % _TILE_PACK), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cb,),
        in_specs=[
            pl.BlockSpec((kc, pw), win_lo, memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, pw), win_hi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c + 2, p_sz), tile_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, p_sz), tile_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_sz),
                         lambda i, ma, mb, dd: (cb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, kc, pw), lambda i, ma, mb, dd: (cb - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * kc, pw), jnp.float32),
            pltpu.VMEM((1, p_sz), jnp.float32),
            pltpu.VMEM((1, p_sz), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    d_padded = pl.pallas_call(
        functools.partial(
            _bwd_kernel, tsx=tsx, tsy=tsy, kc=kc, tw=tw, c=c, cb=cb
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cb, kc, pw), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*_scalar_args(bins), dead, pairs, pairs, g_acc, log_t_full, chunk_tots)

    d_rows = d_padded.reshape(cb * kc, pw)
    d_rows = jnp.concatenate([d_rows, jnp.zeros((1, pw), d_rows.dtype)])
    d_pair = d_rows[bins.padslot_of_pair]               # one gather, gen order
    # scatter-free per-gaussian reduction: generation order is gaussian-major
    # (each gaussian's pairs are one contiguous slot run, under iota AND
    # depth-priority ordering), so the old segment_sum — whose scatter-add
    # lowering ran at 1.6 GiB/s, ~98 ms/camera, the single largest op of the
    # whole stage-1 step in the round-4 trace — collapses to a cumsum + two
    # row-gathers + one permutation gather back to original gaussian ids.
    from .segment_rows import contiguous_segment_sum

    d_perm = contiguous_segment_sum(d_pair, bins.gs_start, bins.gs_count)
    d_g = d_perm[bins.gs_inv]
    return (
        None,                       # bins
        d_g[:, 0:2],                # means2d
        d_g[:, 2:5],                # conics
        d_g[:, 5],                  # opacities
        d_g[:, _HDR:],              # colors
        d_g[:, 6],                  # depths
    )


composite_pairs_pallas.defvjp(_composite_fwd, _composite_bwd)
