"""Loss library (parity: ``rfstudio/loss/``): L1/L2, image PSNR, SSIM(+L1),
masked and HDR variants, chamfer + F-score re-exports."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.chamfer import chamfer_distance, f_score  # noqa: F401 (re-export)
from ..ops.ssim import ssim, ssim_l1_loss  # noqa: F401 (re-export)


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def l2(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((pred - target) ** 2).mean()


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def masked_l1(pred, target, mask) -> jnp.ndarray:
    """Mean L1 over mask>0 pixels (MaskedLoss, photometric_loss.py)."""
    w = (mask > 0).astype(pred.dtype)
    return (jnp.abs(pred - target) * w).sum() / jnp.maximum(
        w.sum() * pred.shape[-1] / max(mask.shape[-1], 1), 1.0
    )


def hdr_l1(pred, target, eps: float = 1e-3) -> jnp.ndarray:
    """Tone-compressed L1 for HDR targets (HDRLoss, photometric_loss.py:145):
    log-space difference is robust to large radiance ranges."""
    return jnp.abs(
        jnp.log(jnp.maximum(pred, 0) + eps) - jnp.log(jnp.maximum(target, 0) + eps)
    ).mean()
