"""SSIM with the standard 11x11 Gaussian window (torchmetrics-compatible
semantics, parity with ``rfstudio/loss/photometric_loss.py:72-100``).

Implemented as grouped depthwise convolutions — XLA fuses these into a few
HBM-friendly passes; no im2col materialization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(size: int, sigma: float) -> tuple:
    import numpy as np

    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return (g,)  # numpy: safe to cache across traces


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of [..., H, W, C] with 'valid' padding."""
    size = window.shape[0]
    c = img.shape[-1]
    batch = img.shape[:-3]
    x = img.reshape((-1,) + img.shape[-3:])          # [B, H, W, C]
    kh = window.reshape(size, 1, 1, 1) * jnp.ones((1, 1, 1, c))
    kw = window.reshape(1, size, 1, 1) * jnp.ones((1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, (size, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, size, 1, c), ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    return x.reshape(batch + x.shape[1:])


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    *,
    window_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over [..., H, W, C] images."""
    window_size = min(window_size, pred.shape[-2], pred.shape[-3])
    (window,) = _gaussian_kernel(window_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _blur(pred, window)
    mu_y = _blur(target, window)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _blur(pred * pred, window) - mu_xx
    sigma_y = _blur(target * target, window) - mu_yy
    sigma_xy = _blur(pred * target, window) - mu_xy

    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def ssim_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, *, ssim_lambda: float = 0.2) -> jnp.ndarray:
    """The reference's SSIML1 (photometric_loss.py:101): lam*(1-SSIM) + (1-lam)*L1."""
    l1 = jnp.mean(jnp.abs(pred - target))
    return ssim_lambda * (1.0 - ssim(pred, target)) + (1.0 - ssim_lambda) * l1
