"""Chamfer distance + F-score — replaces the reference's CUDA extension
(``rfstudio/loss/_chamfer/chamfer_distance.py:61``) with a tiled all-pairs
min in pure jnp (squared-distance expansion rides the MXU as a matmul)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _nearest_sqdist(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
    """min_j ||a_i - b_j||^2 for each a_i. a [N,3], b [M,3] -> [N]."""
    b_sq = jnp.sum(b * b, axis=-1)  # [M]

    def one_chunk(ac):
        d = jnp.sum(ac * ac, -1)[:, None] - 2.0 * ac @ b.T + b_sq[None, :]
        return jnp.min(d, axis=-1)

    n = a.shape[0]
    pad = (-n) % chunk
    a_p = jnp.concatenate([a, jnp.zeros((pad, 3), a.dtype)]) if pad else a
    out = jax.lax.map(one_chunk, a_p.reshape(-1, chunk, 3)).reshape(-1)
    return jnp.maximum(out[:n], 0.0)


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric mean chamfer distance between point sets [N,3], [M,3]."""
    return 0.5 * (
        jnp.mean(jnp.sqrt(_nearest_sqdist(a, b) + 1e-20))
        + jnp.mean(jnp.sqrt(_nearest_sqdist(b, a) + 1e-20))
    )


def f_score(a: jnp.ndarray, b: jnp.ndarray, threshold: float = 0.01) -> jnp.ndarray:
    """F-score at a distance threshold (geometric_loss.py:24-51)."""
    d_ab = jnp.sqrt(_nearest_sqdist(a, b) + 1e-20)
    d_ba = jnp.sqrt(_nearest_sqdist(b, a) + 1e-20)
    precision = jnp.mean((d_ab < threshold).astype(jnp.float32))
    recall = jnp.mean((d_ba < threshold).astype(jnp.float32))
    return 2 * precision * recall / jnp.maximum(precision + recall, 1e-8)
