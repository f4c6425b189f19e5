"""3D Gaussian splat container + densification as pure functional ops.

Parity target: ``rfstudio/graphics/_splats.py:18`` (fields :20-32, random
/from_points init :38-80, ``split`` :88, ``densify_and_cull`` :122,
``cull`` :162, ``reset_opacities`` :83, cov3d helpers :194-230,
``as_points`` :257). TPU-first differences:

- immutable pytree; densify/cull return ``(new_splats, param_map)`` where
  ``param_map[i]`` is the source index of new slot ``i`` (or ``-1`` for a
  freshly created Gaussian), consumed by the optimizer state surgery
  (see ``train/optim.py``) — the JAX analog of the reference's
  ``mutate_params`` contract at ``optim/optimizer.py:121-191``.
- densification runs on concrete (non-traced) arrays between jitted train
  steps; the hot render path itself never changes shapes.

``scales`` are log-scales and ``opacities`` are logits, as in the reference.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.tensorclass import TensorClass
from . import gmath


class Splats(TensorClass):
    means: jnp.ndarray      # [N, 3]
    scales: jnp.ndarray     # [N, 3] (log)
    quats: jnp.ndarray      # [N, 4] (wxyz)
    colors: jnp.ndarray     # [N, 3]
    shs: jnp.ndarray        # [N, K, 3] (rest SH coefficients; K may be 0)
    opacities: jnp.ndarray  # [N, 1] (logit)

    @property
    def shape(self) -> tuple[int, ...]:
        return self.means.shape[:-1]

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return gmath.sh_dim2deg(self.shs.shape[-2] + 1)

    # ---- constructors --------------------------------------------------------
    @classmethod
    def random(cls, key: jax.Array, size: int, *, sh_degree: int, random_scale: float) -> "Splats":
        k1, k2 = jax.random.split(key)
        pts = (jax.random.uniform(k1, (size, 3)) - 0.5) * (2 * random_scale)
        d = _mean_knn_distance(pts, k=3)
        return cls(
            means=pts,
            scales=jnp.log(jnp.maximum(d, 1e-8))[:, None].repeat(3, axis=1),
            quats=gmath.random_quaternion(k2, (size,)),
            colors=jnp.full((size, 3), 0.5),
            shs=jnp.zeros((size, gmath.sh_deg2dim(sh_degree) - 1, 3)),
            opacities=jnp.full((size, 1), _logit(0.1)),
        )

    @classmethod
    def from_points(cls, key: jax.Array, positions: jnp.ndarray, colors: jnp.ndarray, *, sh_degree: int) -> "Splats":
        size = positions.shape[0]
        d = _mean_knn_distance(positions, k=3)
        return cls(
            means=positions,
            scales=jnp.log(jnp.maximum(d, 1e-8))[:, None].repeat(3, axis=1),
            quats=gmath.random_quaternion(key, (size,)),
            colors=colors,
            shs=jnp.zeros((size, gmath.sh_deg2dim(sh_degree) - 1, 3)),
            opacities=jnp.full((size, 1), _logit(0.1)),
        )

    # ---- covariance helpers ----------------------------------------------------
    def cov3d_half(self) -> jnp.ndarray:
        r = gmath.quat2rot(gmath.safe_normalize(self.quats))
        return r * jnp.exp(self.scales)[..., None, :]

    def cov3d(self) -> jnp.ndarray:
        m = self.cov3d_half()
        return m @ jnp.swapaxes(m, -1, -2)

    # ---- functional param updates ------------------------------------------------
    def reset_opacities(self, reset_value: float) -> "Splats":
        return self.replace(
            opacities=jnp.minimum(self.opacities, _logit(reset_value))
        )


def _logit(p: float) -> float:
    return float(np.log(p / (1.0 - p)))


def _mean_knn_distance(pts: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mean distance to k nearest neighbors (excluding self). Init-time only.

    Brute force against all points up to 2^19 candidates; beyond that the
    candidate set is a deterministic subsample (init scales only need the
    local density statistic, and a [chunk, N] distance matrix at multi-M N
    would not fit HBM). Chunk size adapts so the matrix stays under ~2 GB."""
    n = pts.shape[0]
    if n <= k:
        return jnp.full((n,), 0.1)
    cand = pts
    if n > (1 << 19):
        idx = jnp.linspace(0, n - 1, 1 << 19).astype(jnp.int32)
        cand = pts[idx]
    m = cand.shape[0]
    chunk = int(max(min(4096, (1 << 29) // max(m, 1)), 64))

    def nearest(block):
        d2 = jnp.sum((block[:, None, :] - cand[None, :, :]) ** 2, axis=-1)
        top = -jax.lax.top_k(-d2, k + 1)[0]  # smallest k+1 (includes self 0)
        return jnp.sqrt(jnp.maximum(top[:, 1:], 0.0)).mean(axis=-1)

    if n <= chunk:
        return nearest(pts)
    pad = (-n) % chunk
    padded = jnp.concatenate([pts, jnp.zeros((pad, 3))], axis=0)
    out = jax.lax.map(nearest, padded.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


# ---- densification (reference semantics, host-side between jit steps) ------------


def split(splats: Splats, key: jax.Array, num_splits: int, scale_factor: float = 1 / 1.6) -> Splats:
    """Sample ``num_splits`` children inside each Gaussian (_splats.py:88-120)."""
    n = splats.num_gaussians
    randn = jax.random.normal(key, (num_splits, n, 3))
    scaled = jnp.exp(splats.scales)[None] * randn
    rots = gmath.quat2rot(gmath.safe_normalize(splats.quats))  # [N, 3, 3]
    offsets = jnp.einsum("nij,snj->sni", rots, scaled)
    new_means = splats.means[None] + offsets

    def tile(x):
        return jnp.broadcast_to(x[None], (num_splits,) + x.shape).reshape((num_splits * n,) + x.shape[1:])

    return Splats(
        means=new_means.reshape(-1, 3),
        scales=tile(splats.scales + float(np.log(scale_factor))),
        quats=tile(splats.quats),
        colors=tile(splats.colors),
        shs=tile(splats.shs),
        opacities=tile(splats.opacities),
    )


def densify_and_cull(
    splats: Splats,
    key: jax.Array,
    *,
    xys_grad_norm: jnp.ndarray,   # [N] accumulated screen-space grad norms
    vis_counts: jnp.ndarray,      # [N] visibility counts
    last_wh: tuple[int, int],
    densify_grad_thresh: float,
    densify_size_thresh: float,
    num_splits: int,
    cull_alpha_thresh: float,
    cull_scale_thresh: float | None,
) -> tuple[Splats, np.ndarray]:
    """Reference densify_and_cull (_splats.py:122-159). Returns (new, param_map).

    ``param_map[i]`` = index into the old arrays for surviving slot ``i``, or
    ``-1`` for new slots (splits + dups), whose optimizer state is zeroed.
    New layout: [kept..., split-children..., duplicated...].
    """
    scale_max = np.asarray(jnp.exp(splats.scales).max(axis=-1))
    vis = np.maximum(np.asarray(vis_counts), 1.0)
    avg_grad = 0.5 * max(last_wh) * (np.asarray(xys_grad_norm) / vis)
    high_grads = avg_grad > densify_grad_thresh
    big = scale_max > densify_size_thresh
    dups = high_grads & ~big
    splits_mask = high_grads & big

    culls = np.asarray(jax.nn.sigmoid(splats.opacities[:, 0])) < cull_alpha_thresh
    if cull_scale_thresh is not None:
        culls = culls | (scale_max > cull_scale_thresh)
    selected = ~(culls | splits_mask)

    sel_idx = np.nonzero(selected)[0]
    split_idx = np.nonzero(splits_mask)[0]
    dup_idx = np.nonzero(dups)[0]

    kept = splats[jnp.asarray(sel_idx)]
    children = split(splats[jnp.asarray(split_idx)], key, num_splits) if len(split_idx) else None
    dupped = splats[jnp.asarray(dup_idx)] if len(dup_idx) else None

    parts = [kept] + ([children] if children is not None else []) + (
        [dupped] if dupped is not None else []
    )
    new = Splats.cat(parts, axis=0)
    param_map = np.concatenate(
        [sel_idx, -np.ones(new.num_gaussians - len(sel_idx), dtype=np.int64)]
    )
    return new, param_map


def cull(
    splats: Splats, *, cull_alpha_thresh: float, cull_scale_thresh: float | None
) -> tuple[Splats, np.ndarray]:
    culls = np.asarray(jax.nn.sigmoid(splats.opacities[:, 0])) < cull_alpha_thresh
    if cull_scale_thresh is not None:
        scale_max = np.asarray(jnp.exp(splats.scales).max(axis=-1))
        culls = culls | (scale_max > cull_scale_thresh)
    sel_idx = np.nonzero(~culls)[0]
    return splats[jnp.asarray(sel_idx)], sel_idx


def as_points(splats: Splats, key: jax.Array, num_samples: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample points from the Gaussian mixture (_splats.py:257-268)."""
    volumes = jnp.exp(splats.scales.sum(-1))
    k1, k2 = jax.random.split(key)
    idx = jax.random.categorical(k1, jnp.log(volumes + 1e-20), shape=(num_samples,))
    randn = jax.random.normal(k2, (num_samples, 3))
    offsets = randn * jnp.exp(splats.scales[idx])
    rots = gmath.quat2rot(gmath.safe_normalize(splats.quats[idx]))
    pos = splats.means[idx] + jnp.einsum("nij,nj->ni", rots, offsets)
    return pos, splats.colors[idx]
