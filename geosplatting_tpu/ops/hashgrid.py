"""Instant-NGP multiresolution hash encoding, exact reference semantics.

Parity target: the reference's pure-torch fallback of ``tcnn.Encoding``
(``rfstudio/model/components/encoding.py:187-229``) with the same hash
constants (:167-185: spatial hash with primes 1 / 2654435761 / 805459861),
level scalings ``floor(min_res * growth^level)``, trilinear interpolation
over ceil/floor corners, input domain [-1, 1] mapped to [0, 1], and the
**grad-scaling trick** (:231-240): input grads scaled by 1/s and output
grads by s to stabilize hash-table optimization.

This is a plain gather+lerp — fully XLA-friendly (one big gather per level
batch, fused trilerp), no kernel needed.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 0.001
    grad_scaling: float | None = None

    @property
    def table_size(self) -> int:
        return 2 ** self.log2_hashmap_size

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def growth_factor(self) -> float:
        if self.num_levels <= 1:
            return 1.0
        return float(
            np.exp((np.log(self.max_res) - np.log(self.min_res)) / (self.num_levels - 1))
        )

    @property
    def scalings(self) -> np.ndarray:
        levels = np.arange(self.num_levels)
        return np.floor(self.min_res * self.growth_factor ** levels)

    def init(self, key: jax.Array) -> jnp.ndarray:
        """[L * table_size, features_per_level] uniform in +-hash_init_scale."""
        return (
            jax.random.uniform(
                key, (self.table_size * self.num_levels, self.features_per_level)
            ) * 2.0 - 1.0
        ) * self.hash_init_scale


def _hash(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """coords [..., L, 3] int32 -> [..., L] table indices (per-level offset
    NOT included). Matches encoding.py:167-185."""
    c = coords.astype(jnp.uint32) * jnp.asarray(_PRIMES)
    x = c[..., 0] ^ c[..., 1] ^ c[..., 2]
    return (x % jnp.uint32(table_size)).astype(jnp.int32)


def hashgrid_encode(
    table: jnp.ndarray, x: jnp.ndarray, config: HashGridConfig
) -> jnp.ndarray:
    """x [..., 3] in [-1, 1] -> features [..., L * F]."""
    if config.grad_scaling is not None:
        s = config.grad_scaling
        x = x / s + jax.lax.stop_gradient(x) * (1 - 1 / s)

    # All heavy intermediates live in [..., L*F] layout: thin trailing dims
    # ([..., L, F] with L=16, F=2) make XLA pick lane-padded layouts that
    # blow memory up 8-64x on TPU; reshaping each corner gather to the
    # flattened feature axis immediately keeps every live array at the
    # output width (measured: the [N, L, {2,3}] form OOMed stage-1 at 72 GB)
    pos = x[..., None, :] * 0.5 + 0.5                              # [..., 1, 3]
    scaled = pos * jnp.asarray(config.scalings, x.dtype)[:, None]  # [..., L, 3]
    f = jnp.floor(scaled)
    fi = f.astype(jnp.int32)
    ci = jnp.ceil(scaled).astype(jnp.int32)
    fdim = config.features_per_level

    lvl_off = (
        jnp.arange(config.num_levels, dtype=jnp.int32) * config.table_size
    )

    def rep(w):  # [..., L] interp weight -> [..., L*F]
        return jnp.repeat(w, fdim, axis=-1, total_repeat_length=config.output_dim)

    def corner(cx, cy, cz):
        coords = jnp.stack((cx, cy, cz), axis=-1)
        idx = _hash(coords, config.table_size) + lvl_off
        g = table[idx]                                 # [..., L, F]
        return g.reshape(g.shape[:-2] + (config.output_dim,))

    f000 = corner(fi[..., 0], fi[..., 1], fi[..., 2])
    f100 = corner(ci[..., 0], fi[..., 1], fi[..., 2])
    f010 = corner(fi[..., 0], ci[..., 1], fi[..., 2])
    f110 = corner(ci[..., 0], ci[..., 1], fi[..., 2])
    f001 = corner(fi[..., 0], fi[..., 1], ci[..., 2])
    f101 = corner(ci[..., 0], fi[..., 1], ci[..., 2])
    f011 = corner(fi[..., 0], ci[..., 1], ci[..., 2])
    f111 = corner(ci[..., 0], ci[..., 1], ci[..., 2])

    offset = scaled - f
    ox = rep(offset[..., 0])
    oy = rep(offset[..., 1])
    oz = rep(offset[..., 2])
    fx0 = f000 * (1 - ox) + f100 * ox
    fx1 = f010 * (1 - ox) + f110 * ox
    fx2 = f001 * (1 - ox) + f101 * ox
    fx3 = f011 * (1 - ox) + f111 * ox
    fy0 = fx0 * (1 - oy) + fx1 * oy
    fy1 = fx2 * (1 - oy) + fx3 * oy
    out = fy0 * (1 - oz) + fy1 * oz                                # [..., L*F]

    if config.grad_scaling is not None:
        s = config.grad_scaling
        out = out * s + jax.lax.stop_gradient(out) * (1 - s)
    return out
