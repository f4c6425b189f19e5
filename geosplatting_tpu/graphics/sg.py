"""Spherical Gaussians: algebra + envmap fitting.

Parity targets: ``rfstudio/graphics/_spherical_gaussians.py:15`` (products,
integrals, cosine integral, BRDF lobe) and ``TextureSG``
(``_mesh/_texture.py:648``, fit from cubemap via Adam at
``_texture.py:488-528``)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from . import gmath


class SphericalGaussians(NamedTuple):
    axis: jnp.ndarray       # [N, 3] unit lobe axes
    sharpness: jnp.ndarray  # [N, 1]
    amplitude: jnp.ndarray  # [N, 3]

    def evaluate(self, dirs: jnp.ndarray) -> jnp.ndarray:
        """Sum of lobes at unit dirs [..., 3] -> [..., 3]."""
        cos = jnp.einsum("...d,nd->...n", dirs, self.axis)
        w = jnp.exp(self.sharpness[:, 0] * (cos - 1.0))
        return jnp.einsum("...n,nc->...c", w, self.amplitude)

    def integral(self) -> jnp.ndarray:
        """Closed-form integral of each lobe over the sphere. [N, 3]."""
        lam = self.sharpness
        return self.amplitude * 2 * jnp.pi / lam * (1 - jnp.exp(-2 * lam))

    def product(self, other: "SphericalGaussians") -> "SphericalGaussians":
        """Pointwise product of two SG sets (paired lobes)."""
        lam = self.sharpness + other.sharpness
        um = (
            self.sharpness * self.axis + other.sharpness * other.axis
        ) / jnp.maximum(lam, 1e-8)
        norm = jnp.sqrt(jnp.sum(um * um, -1, keepdims=True) + 1e-12)
        new_sharp = lam * norm
        amp = self.amplitude * other.amplitude * jnp.exp(new_sharp - lam)
        return SphericalGaussians(
            axis=um / norm, sharpness=new_sharp, amplitude=amp
        )

    def inner_product(self, other: "SphericalGaussians") -> jnp.ndarray:
        """Integral of the product over the sphere (all lobe pairs summed)."""
        lam_sum = self.sharpness[:, None] + other.sharpness[None, :]  # [N, M, 1]
        um = (
            self.sharpness[:, None] * self.axis[:, None]
            + other.sharpness[None, :] * other.axis[None, :]
        )
        dm = jnp.sqrt(jnp.sum(um * um, -1, keepdims=True) + 1e-12)
        expo = jnp.exp(dm - lam_sum)
        other_amp = other.amplitude[None, :]
        return (
            self.amplitude[:, None] * other_amp * 2 * jnp.pi
            * expo * (1 - jnp.exp(-2 * dm)) / jnp.maximum(dm, 1e-8)
        ).sum((0, 1))

    def cosine_integral(self, normal: jnp.ndarray) -> jnp.ndarray:
        """Approximate integral of each lobe times the clamped cosine about
        ``normal``, summed (the standard SG irradiance fit: represent the
        clamped cosine itself as an SG of sharpness ~2.133 / amplitude ~1.17
        and take the closed-form SG inner product)."""
        cos_lobe = SphericalGaussians(
            axis=normal.reshape(-1, 3),
            sharpness=jnp.full((normal.reshape(-1, 3).shape[0], 1), 2.133),
            amplitude=jnp.full((normal.reshape(-1, 3).shape[0], 3), 1.17),
        )
        # pairwise inner products, summed over light lobes per normal
        lam_sum = self.sharpness[None, :] + cos_lobe.sharpness[:, None]
        um = (
            self.sharpness[None, :] * self.axis[None, :]
            + cos_lobe.sharpness[:, None] * cos_lobe.axis[:, None]
        )  # [M, N, 3]
        dm = jnp.sqrt(jnp.sum(um * um, -1, keepdims=True) + 1e-12)
        expo = jnp.exp(dm - lam_sum)
        contrib = (
            self.amplitude[None, :] * cos_lobe.amplitude[:, None]
            * 2 * jnp.pi * expo * (1 - jnp.exp(-2 * dm))
            / jnp.maximum(dm, 1e-8)
        ).sum(1)  # [M, 3]
        return contrib.reshape(normal.shape[:-1] + (3,))


def random_sg(key: jax.Array, num: int) -> SphericalGaussians:
    k1, k2, k3 = jax.random.split(key, 3)
    return SphericalGaussians(
        axis=gmath.safe_normalize(jax.random.normal(k1, (num, 3))),
        sharpness=jax.random.uniform(k2, (num, 1), minval=4.0, maxval=30.0),
        amplitude=jax.random.uniform(k3, (num, 3), minval=0.1, maxval=1.0),
    )


def fit_sg_to_cubemap(
    cube: jnp.ndarray, num_gaussians: int, *, key: jax.Array,
    num_steps: int = 400, lr: float = 0.1,
) -> SphericalGaussians:
    """TextureCubeMap.as_sg analog (_texture.py:488-528): Adam-fit SG lobes
    to cubemap radiance by L1 on sampled directions."""
    from ..ops.cubemap import texel_directions

    dirs = texel_directions(cube.shape[1]).reshape(-1, 3)
    target = cube.reshape(-1, 3)
    sg0 = random_sg(key, num_gaussians)
    params = {
        "axis": sg0.axis,
        "log_sharp": jnp.log(sg0.sharpness),
        "log_amp": jnp.log(sg0.amplitude),
    }

    def build(p):
        return SphericalGaussians(
            axis=gmath.safe_normalize(p["axis"]),
            sharpness=jnp.exp(p["log_sharp"]),
            amplitude=jnp.exp(p["log_amp"]),
        )

    def loss_fn(p):
        return jnp.abs(build(p).evaluate(dirs) - target).mean()

    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        g = jax.grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt

    for _ in range(num_steps):
        params, opt = step(params, opt)
    return build(params)
