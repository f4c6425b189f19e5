"""Positional / spherical-harmonic / triplane encodings.

Parity targets: ``rfstudio/model/components/encoding.py`` — ``PosEncoding``
(:16, NeRF sin/cos frequencies), ``SHEncoding`` (:52, SH basis of the input
direction up to degree 4), ``TriplaneEncoding`` (:245-325, three orthogonal
feature planes with bilinear sampling, reduced by sum or product). The hash
encoding lives in ops/hashgrid.py."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..graphics import gmath


@dataclasses.dataclass(frozen=True)
class PosEncoding:
    num_frequencies: int = 10
    min_freq_exp: float = 0.0
    max_freq_exp: float = 9.0
    include_input: bool = True

    def output_dim(self, input_dim: int) -> int:
        out = input_dim * self.num_frequencies * 2
        return out + (input_dim if self.include_input else 0)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        freqs = 2.0 ** jnp.linspace(
            self.min_freq_exp, self.max_freq_exp, self.num_frequencies
        )
        scaled = x[..., None, :] * freqs[:, None] * jnp.pi  # [..., F, D]
        enc = jnp.concatenate(
            (jnp.sin(scaled), jnp.cos(scaled)), axis=-1
        ).reshape(x.shape[:-1] + (-1,))
        if self.include_input:
            enc = jnp.concatenate((x, enc), axis=-1)
        return enc


@dataclasses.dataclass(frozen=True)
class SHEncoding:
    degree: int = 4  # levels; output dim = degree^2

    def output_dim(self) -> int:
        return self.degree ** 2

    def apply(self, dirs: jnp.ndarray) -> jnp.ndarray:
        """Unit directions [..., 3] -> SH basis values [..., degree^2]."""
        d = gmath.safe_normalize(dirs)
        basis = jnp.ones(d.shape[:-1] + (1,)) * gmath.SH_C0
        eye = jnp.eye(self.output_dim())
        # evaluate via eval_sh with basis-vector coefficients
        coeffs = eye.reshape((self.output_dim(), self.output_dim(), 1))
        vals = [
            gmath.eval_sh(self.degree - 1, jnp.broadcast_to(
                coeffs[i], d.shape[:-1] + (self.output_dim(), 1)), d)[..., 0]
            for i in range(self.output_dim())
        ]
        del basis
        return jnp.stack(vals, axis=-1)


@dataclasses.dataclass(frozen=True)
class TriplaneEncoding:
    resolution: int = 32
    num_components: int = 64
    init_scale: float = 0.1
    reduce: str = "sum"  # 'sum' | 'product'

    @property
    def output_dim(self) -> int:
        return self.num_components

    def init(self, key: jax.Array) -> jnp.ndarray:
        return (
            jax.random.normal(
                key, (3, self.resolution, self.resolution, self.num_components)
            ) * self.init_scale
        )

    def apply(self, planes: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """x [..., 3] in [-1, 1] -> features [..., C]."""
        r = self.resolution

        def sample(plane, uv):
            g = (uv * 0.5 + 0.5) * r - 0.5
            g0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, r - 1)
            g1 = jnp.minimum(g0 + 1, r - 1)
            f = jnp.clip(g - g0, 0, 1)
            c00 = plane[g0[..., 1], g0[..., 0]]
            c01 = plane[g0[..., 1], g1[..., 0]]
            c10 = plane[g1[..., 1], g0[..., 0]]
            c11 = plane[g1[..., 1], g1[..., 0]]
            wx = f[..., 0:1]
            wy = f[..., 1:2]
            return (
                c00 * (1 - wx) * (1 - wy) + c01 * wx * (1 - wy)
                + c10 * (1 - wx) * wy + c11 * wx * wy
            )

        fxy = sample(planes[0], x[..., jnp.array([0, 1])])
        fxz = sample(planes[1], x[..., jnp.array([0, 2])])
        fyz = sample(planes[2], x[..., jnp.array([1, 2])])
        if self.reduce == "sum":
            return fxy + fxz + fyz
        return fxy * fxz * fyz
