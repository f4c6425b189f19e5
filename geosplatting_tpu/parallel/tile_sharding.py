"""Tile-parallel rasterization: shard the image across devices.

The reference handles million-Gaussian scenes with memory tiers on one GPU
(SURVEY.md §2.11); the TPU-native scale-out is to split the image into
horizontal bands over a mesh axis with ``shard_map``: each device bins and
composites only the Gaussians overlapping its band (binning prunes the
rest), Gaussian parameters stay replicated, and the composed image is
exactly the single-device result — compositing is per-pixel, so band
parallelism is loss-free. Combine with the ``dp`` camera-batch axis for
2D meshes (cameras x bands)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.rasterize import rasterize


def rasterize_tile_sharded(
    mesh: Mesh,
    axis: str,
    means, quats, scales, opacities, colors, viewmat, k_mat,
    width: int, height: int,
    **kw,
):
    """Band-sharded version of ops.rasterize.rasterize (same contract minus
    the info dict). Returns (render [H, W, C], alpha [H, W, 1])."""
    n = mesh.shape[axis]
    tile_size = kw.get("tile_size", 16)
    band_h = -(-height // (n * tile_size)) * tile_size
    pad_h = band_h * n

    fx, fy = k_mat[0, 0], k_mat[1, 1]
    cx, cy = k_mat[0, 2], k_mat[1, 2]
    lim_x = 1.3 * (0.5 * width / fx + jnp.abs(cx / fx - 0.5 * width / fx))
    lim_y = 1.3 * (0.5 * height / fy + jnp.abs(cy / fy - 0.5 * height / fy))

    def body_inner(means, quats, scales, opacities, colors, viewmat, k_mat, lim_x, lim_y):
        i = jax.lax.axis_index(axis)
        # shift the principal point so this device renders rows
        # [i*band_h, (i+1)*band_h)
        k_band = k_mat.at[1, 2].add(-band_h * i)
        render, alpha, _ = rasterize(
            means, quats, scales, opacities, colors, viewmat, k_band,
            width, band_h, lim_override=(lim_x, lim_y), **kw,
        )
        return render[None], alpha[None]

    body = functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(),) * 9, out_specs=(P(axis), P(axis)),
        # pallas_call outputs carry no vma metadata; skip the replication check
        check_vma=False,
    )(body_inner)
    render, alpha = body(means, quats, scales, opacities, colors, viewmat,
                         k_mat, lim_x, lim_y)
    render = render.reshape(pad_h, width, -1)[:height]
    alpha = alpha.reshape(pad_h, width, -1)[:height]
    return render, alpha
