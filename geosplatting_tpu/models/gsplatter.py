"""Vanilla 3DGS model — functional render heads over a ``Splats`` pytree.

Parity target: ``rfstudio/model/gsplat.py:21`` (``GSplatter``): render_rgb /
render_rgba / render_depth over the rasterizer with the background-color
policy (:100-107; random bg during training), SH-degree capping (:201-205),
colors-as-SH packing (:210-214), and the densification bookkeeping contract
(``UpdateInfo``/``update_grad_norm`` :360-376) — here returned explicitly as
screen-space gradient hooks instead of mutating module state.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..graphics import gmath
from ..graphics.cameras import Cameras
from ..graphics.splats import Splats
from ..ops.rasterize import rasterize
from ..ops.rasterize_2dgs import rasterize_2dgs
from ..utils.tensorclass import static_field


@dataclasses.dataclass(frozen=True)
class GSplatter:
    """Static render configuration; all state lives in the ``Splats`` pytree."""

    sh_degree: int = 3
    rasterize_mode: str = "classic"      # 'classic' | 'antialiased'
    block_width: int = 16
    background_color: str = "random"     # 'white' | 'black' | 'random'
    tile_capacity: int = 1024
    pairs_per_gaussian: int = 8
    tile_chunk: int = 8
    chunk_size: int = 128  # 50k-scale workloads measured ~4% faster at 128 (BASELINE.md)
    backend: str = "auto"
    camera_batching: str = "map"  # 'map' (sequential) | 'vmap' (batched sorts/kernels)

    # ---- helpers -------------------------------------------------------------
    def get_background_color(self, key: jax.Array | None, training: bool) -> jnp.ndarray:
        if self.background_color == "black":
            return jnp.zeros(3)
        if self.background_color == "white":
            return jnp.ones(3)
        if training and key is not None:
            return jax.random.uniform(key, (3,))
        return jnp.array([0.1490, 0.1647, 0.2157])

    def _colors_and_degree(
        self, splats: Splats, max_sh_degree: int | None
    ) -> tuple[jnp.ndarray, int | None]:
        deg = splats.sh_degree if max_sh_degree is None else min(max_sh_degree, splats.sh_degree)
        if deg == 0:
            return splats.colors, None
        colors = jnp.concatenate(
            (gmath.rgb2sh(splats.colors[:, None, :]), splats.shs), axis=-2
        )
        return colors[:, : gmath.sh_deg2dim(deg), :], deg

    def _raster_kwargs(self) -> dict[str, Any]:
        return dict(
            tile_size=self.block_width,
            tile_capacity=self.tile_capacity,
            pairs_per_gaussian=self.pairs_per_gaussian,
            tile_chunk=self.tile_chunk,
            chunk_size=self.chunk_size,
            rasterize_mode=self.rasterize_mode,
            backend=self.backend,
        )

    # ---- render heads (single camera; vmap for batches) -----------------------
    def render_rgba(
        self,
        splats: Splats,
        camera: Cameras,
        *,
        max_sh_degree: int | None = None,
        means2d_offset: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, dict]:
        """Returns ([H, W, 4] premultiplied rgba, info)."""
        colors, deg = self._colors_and_degree(splats, max_sh_degree)
        if self.rasterize_mode == "2dgs":
            render, alpha, normal, pseudo_normal, distort, median, info = (
                rasterize_2dgs(
                    splats.means,
                    gmath.safe_normalize(splats.quats),
                    jnp.exp(splats.scales),
                    jax.nn.sigmoid(splats.opacities[:, 0]),
                    colors,
                    camera.view_matrix,
                    camera.intrinsic_matrix,
                    camera.width,
                    camera.height,
                    sh_degree=deg,
                    render_mode="RGB+ED",
                    offset2d=means2d_offset,
                    tile_size=self.block_width,
                    tile_capacity=self.tile_capacity,
                    pairs_per_gaussian=self.pairs_per_gaussian,
                    tile_chunk=min(self.tile_chunk, 4),
                )
            )
            info = dict(
                info, normal=normal, pseudo_normal=pseudo_normal,
                distort=distort, median_depth=median, depth=render[..., -1:],
                alpha_map=alpha,
            )
            return jnp.concatenate((render[..., :3], alpha), axis=-1), info
        render, alpha, info = rasterize(
            splats.means,
            gmath.safe_normalize(splats.quats),
            jnp.exp(splats.scales),
            jax.nn.sigmoid(splats.opacities[:, 0]),
            colors,
            camera.view_matrix,
            camera.intrinsic_matrix,
            camera.width,
            camera.height,
            sh_degree=deg,
            render_mode="RGB",
            means2d_offset=means2d_offset,
            **self._raster_kwargs(),
        )
        return jnp.concatenate((render[..., :3], alpha), axis=-1), info

    def render_rgb(
        self,
        splats: Splats,
        camera: Cameras,
        background: jnp.ndarray,
        *,
        max_sh_degree: int | None = None,
        means2d_offset: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, dict]:
        rgba, info = self.render_rgba(
            splats, camera, max_sh_degree=max_sh_degree, means2d_offset=means2d_offset
        )
        rgb = rgba[..., :3] + (1.0 - rgba[..., 3:4]) * background
        return rgb, info

    def render_depth(self, splats: Splats, camera: Cameras) -> jnp.ndarray:
        """Expected depth + alpha, [H, W, 2] (gsplat 'ED' mode, gsplat.py:112-186)."""
        if self.rasterize_mode == "2dgs":
            rgba, info = self.render_rgba(splats, camera)
            return jnp.concatenate((info["depth"], rgba[..., 3:]), axis=-1)
        render, alpha, _ = rasterize(
            splats.means,
            gmath.safe_normalize(splats.quats),
            jnp.exp(splats.scales),
            jax.nn.sigmoid(splats.opacities[:, 0]),
            jax.lax.stop_gradient(splats.colors),
            camera.view_matrix,
            camera.intrinsic_matrix,
            camera.width,
            camera.height,
            render_mode="ED",
            **self._raster_kwargs(),
        )
        return jnp.concatenate((render, alpha), axis=-1)
