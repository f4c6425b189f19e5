"""Learnable monotone curve mapping (parity: rfstudio/nn/utils/curve_mapping.py).

A per-channel monotone [0, 1] -> [0, 1] piecewise-linear curve whose
control-point GAPS are the softplus-free positives exp(params), so the
curve is monotone by construction and normalized to end at exactly 1 —
useful as a learnable tone/response curve. Functional JAX re-expression of
the reference module: params are a plain {"log_gaps": [K, C]} pytree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_curve(key: jax.Array, num_control_points: int, feature_dim: int) -> dict:
    return {
        "log_gaps": jax.random.normal(
            key, (num_control_points, feature_dim)
        ) * 0.1
    }


def apply_curve(
    params: dict,
    inputs: jnp.ndarray,          # [..., C] in [0, 1]
    *,
    point_distribution: str = "uniform",   # 'uniform' | 'log' | 'exp'
) -> jnp.ndarray:
    """Evaluate the monotone curve per channel (linear interp between the
    normalized cumulative control points; input gradients are stopped like
    the reference's .detach())."""
    log_gaps = params["log_gaps"]
    k = log_gaps.shape[0]
    curve = jnp.cumsum(jnp.exp(log_gaps), axis=0)          # [K, C]
    curve = jnp.concatenate([jnp.zeros_like(curve[:1]), curve])
    curve = curve / curve[-1:]                             # [K+1, C] in [0,1]

    x = jax.lax.stop_gradient(inputs) * (1 - 1e-6)
    if point_distribution == "log":
        x = jnp.log2(x + 1.0)
    elif point_distribution == "exp":
        x = 2.0**x - 1.0
    elif point_distribution != "uniform":
        raise ValueError(point_distribution)

    t = jnp.clip(x, 0.0, 1.0 - 1e-6) * k
    idx = jnp.floor(t).astype(jnp.int32)                   # [..., C]
    w = t - idx
    # per-channel gather: curve[idx[..., c], c]
    ch = jnp.arange(curve.shape[1])
    lo = curve[idx, ch]
    hi = curve[idx + 1, ch]
    return lo * (1 - w) + hi * w


def curve_bins(params: dict) -> jnp.ndarray:
    """Normalized cumulative control points [K, C] (reference get_bins)."""
    cp = jnp.cumsum(jnp.exp(params["log_gaps"]), axis=0)
    return cp / cp[-1:]
