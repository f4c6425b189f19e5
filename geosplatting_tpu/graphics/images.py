"""Image math: exact sRGB transfer curve, alpha blending/compositing, resize,
depth->normal estimation, tone mapping.

Parity target: ``rfstudio/graphics/_images.py`` (srgb2rgb/rgb2srgb exact IEC
61966-2-1 curve :139-183, ``blend``/``blend_random`` compositing, resize,
depth->pseudo-normal :373-421). Images here are plain ``[..., H, W, C]``
jnp arrays — batching is an array axis, not a Python list, so everything
jits and shards.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def srgb2rgb(srgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB-encoded [0,1] -> linear radiance (exact IEC curve)."""
    srgb = jnp.clip(srgb, 0.0, 1.0)
    return jnp.where(
        srgb <= 0.04045,
        srgb / 12.92,
        ((srgb + 0.055) / 1.055) ** 2.4,
    )


def rgb2srgb(rgb: jnp.ndarray) -> jnp.ndarray:
    """Linear radiance [0,1] -> sRGB encoding (exact IEC curve)."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return jnp.where(
        rgb <= 0.0031308,
        rgb * 12.92,
        1.055 * jnp.maximum(rgb, 1e-8) ** (1.0 / 2.4) - 0.055,
    )


def blend(rgba: jnp.ndarray, background: jnp.ndarray) -> jnp.ndarray:
    """Composite [..., H, W, 4] over a background color [..., 3] or [3]."""
    rgb, a = rgba[..., :3], rgba[..., 3:4]
    bg = jnp.broadcast_to(
        jnp.reshape(background, background.shape[:-1] + (1, 1, 3)), rgb.shape
    ) if background.ndim > 1 else background
    return rgb + (1.0 - a) * bg


def blend_random(key: jax.Array, rgba: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite over a random background; returns (rgb, bg_color)."""
    bs = rgba.shape[:-3]
    bg = jax.random.uniform(key, bs + (3,))
    return blend(rgba, bg), bg


def tonemap_aces(x: jnp.ndarray) -> jnp.ndarray:
    """ACES filmic approximation (Narkowicz), matching geosplat.py:474-480."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tonemap_naive(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 1.0)


def resize(img: jnp.ndarray, height: int, width: int, method: str = "linear") -> jnp.ndarray:
    """Resize [..., H, W, C] with jax.image."""
    out_shape = img.shape[:-3] + (height, width, img.shape[-1])
    return jax.image.resize(img, out_shape, method=method)


def depth_to_normals(
    depth: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray
) -> jnp.ndarray:
    """Pseudo-normals from a depth map [..., H, W] via central differences in
    camera space (parity with _images.py:373-421's behavior)."""
    dzdx = (jnp.roll(depth, -1, axis=-1) - jnp.roll(depth, 1, axis=-1)) * 0.5
    dzdy = (jnp.roll(depth, -1, axis=-2) - jnp.roll(depth, 1, axis=-2)) * 0.5
    n = jnp.stack((-dzdx * fx, -dzdy * fy, jnp.ones_like(depth)), axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-8)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))
