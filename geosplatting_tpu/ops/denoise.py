"""Cross-bilateral denoiser over (normal, depth) guides.

Parity target: ``rfstudio/graphics/_mesh/_optix/c_src/denoising.cu:14-75``:
weights w = exp(-d^2/2sigma^2) * max(n.n', eps)^128 * exp(-|z-z'| / max(dz*d, eps)),
normalized by the accumulated weight. Implemented as a shifted-window
accumulation (pure jnp; XLA fuses the shifts), differentiable into the
color input.

Gradients flow into the COLOR only — the reference backward
(``denoising.cu:76-131`` ``bilateral_denoiser_bwd_kernel``) emits ``col_grad``
and nothing else, so the guide weights are treated as constants. Besides
parity, this matters numerically: differentiating through the
``dot(n, n')^128`` normal weight amplifies guide gradients by up to 128x per
tap and was the root cause of the TPU-only non-finite geometry gradients in
stage 2 (see ARCHITECTURE.md, gradient-anomaly note)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def bilateral_denoise(
    color: jnp.ndarray,    # [H, W, C]
    normal: jnp.ndarray,   # [H, W, 3]
    depth: jnp.ndarray,    # [H, W, 1] (z)
    depth_grad: jnp.ndarray | None = None,  # [H, W, 1] dz scale; default 1
    *,
    sigma: float = 2.0,
) -> jnp.ndarray:
    variance = sigma * sigma
    rad = int(2 * -(-sigma * 2.5 // 1) + 1)
    if depth_grad is None:
        depth_grad = jnp.ones_like(depth)
    # guides are non-differentiable (reference bwd kernel: color grads only)
    normal = jax.lax.stop_gradient(normal)
    depth = jax.lax.stop_gradient(depth)
    depth_grad = jax.lax.stop_gradient(depth_grad)

    acc = jnp.zeros_like(color)
    acc_w = jnp.zeros(color.shape[:2] + (1,))
    h, w = color.shape[:2]
    for fy in range(-rad, rad + 1):
        if abs(fy) >= h:
            continue  # whole row out of bounds (the per-Gaussian [1, N] use)
        for fx in range(-rad, rad + 1):
            if abs(fx) >= w:
                continue
            t_col = jnp.roll(color, (-fy, -fx), axis=(0, 1))
            t_nrm = jnp.roll(normal, (-fy, -fx), axis=(0, 1))
            t_z = jnp.roll(depth, (-fy, -fx), axis=(0, 1))
            dist_sqr = fx * fx + fy * fy
            dist = math.sqrt(dist_sqr)
            w_xy = math.exp(-dist_sqr / (2.0 * variance))
            w_n = jnp.clip((t_nrm * normal).sum(-1, keepdims=True), 1e-4, 1.0) ** 128.0
            w_z = jnp.exp(
                -jnp.abs(t_z - depth) / jnp.maximum(depth_grad * dist, 1e-4)
            )
            # mask out-of-bounds taps (roll wraps)
            yy = jnp.arange(h)[:, None, None]
            xx = jnp.arange(w)[None, :, None]
            in_b = ((yy + fy >= 0) & (yy + fy < h) & (xx + fx >= 0) & (xx + fx < w))
            wgt = jnp.where(in_b, w_xy * w_n * w_z, 0.0)
            acc = acc + t_col * wgt
            acc_w = acc_w + wgt
    return acc / jnp.maximum(acc_w, 1e-4)
