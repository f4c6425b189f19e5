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


def sg_brdf_lobe(
    normals: jnp.ndarray, wo: jnp.ndarray, roughness: jnp.ndarray
) -> SphericalGaussians:
    """GGX NDF as a warped SG about the reflection direction
    (SphericalGaussians.from_brdf_lobe, _spherical_gaussians.py)."""
    alpha2 = jnp.maximum(roughness**4, 1e-6)
    n_dot_v = jnp.clip(jnp.sum(normals * wo, -1, keepdims=True), 1e-4, None)
    refl = 2.0 * n_dot_v * normals - wo
    sharpness = 2.0 / alpha2 / (4.0 * n_dot_v)
    amplitude = jnp.broadcast_to(
        1.0 / (jnp.pi * alpha2), normals.shape[:-1] + (3,)
    )
    return SphericalGaussians(
        axis=gmath.safe_normalize(refl), sharpness=sharpness,
        amplitude=amplitude,
    )


class TextureSG(NamedTuple):
    """SG envmap texture container (TextureSG, _texture.py:648-713):
    parameters stored pre-activation (raw axis, log sharpness/amplitude)."""

    axis: jnp.ndarray        # [K, 3] raw (normalized on use)
    sharpness: jnp.ndarray   # [K, 1] log
    amplitude: jnp.ndarray   # [K, 3] log

    @classmethod
    def from_random(cls, key: jax.Array, num_gaussians: int) -> "TextureSG":
        k1, k2, k3 = jax.random.split(key, 3)
        return cls(
            axis=jax.random.normal(k1, (num_gaussians, 3)),
            sharpness=3.0 + jax.random.normal(k2, (num_gaussians, 1)) / 3.0,
            amplitude=jax.random.normal(k3, (num_gaussians, 3)) / 3.0 - 2.0,
        )

    @classmethod
    def from_cubemap(cls, cube: jnp.ndarray, num_gaussians: int, *,
                     key: jax.Array, **kw) -> "TextureSG":
        sg = fit_sg_to_cubemap(cube, num_gaussians, key=key, **kw)
        return cls(
            axis=sg.axis, sharpness=jnp.log(sg.sharpness),
            amplitude=jnp.log(jnp.maximum(sg.amplitude, 1e-8)),
        )

    def as_sg(self) -> SphericalGaussians:
        return SphericalGaussians(
            axis=gmath.safe_normalize(self.axis),
            sharpness=jnp.exp(self.sharpness),
            amplitude=jnp.exp(self.amplitude),
        )

    def sample(self, directions: jnp.ndarray) -> jnp.ndarray:
        return self.as_sg().evaluate(directions)

    def visualize(self, *, width: int = 800, height: int = 400) -> jnp.ndarray:
        """Latlng radiance image [H, W, 3] (_texture.py:662-671)."""
        gy = (jnp.arange(height) + 0.5) / height * jnp.pi
        gx = ((jnp.arange(width) + 0.5) / width * 2.0 - 1.0) * jnp.pi
        theta, phi = jnp.meshgrid(gy, gx, indexing="ij")
        sin_t = jnp.sin(theta)
        dirs = jnp.stack(
            (sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)), -1
        )
        return self.sample(dirs)

    def integral(
        self,
        normals: jnp.ndarray,      # [M, 3]
        wo: jnp.ndarray,           # [M, 3]
        *,
        albedo: jnp.ndarray,       # [M, 3]
        roughness: jnp.ndarray,    # [M, 1]
        metallic: jnp.ndarray,     # [M, 1]
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(diffuse, specular) shading terms (_texture.py:677-713): light SG
        x warped GGX lobe products with Schlick Fresnel + Smith G."""
        light = self.as_sg()
        spec = sg_brdf_lobe(normals, wo, roughness)

        new_half = gmath.safe_normalize(spec.axis + wo)
        v_dot_h = jnp.clip(jnp.sum(wo * new_half, -1, keepdims=True), 1e-4, None)
        f0 = 0.04 * (1 - metallic) + metallic * albedo
        fres = f0 + (1.0 - f0) * 2.0 ** (-(5.55473 * v_dot_h + 6.8316) * v_dot_h)
        n_dot_v = jnp.clip(jnp.sum(normals * wo, -1, keepdims=True), 1e-4, None)
        n_dot_l = jnp.clip(jnp.sum(spec.axis * normals, -1, keepdims=True), 1e-4, None)
        k = roughness**2 / 2.0
        g1 = n_dot_v / (n_dot_v * (1 - k) + k + 1e-6)
        g2 = n_dot_l / (n_dot_l * (1 - k) + k + 1e-6)
        moi = fres * g1 * g2 / (4 * n_dot_v * n_dot_l + 1e-6)

        # per-point product of every light lobe with the point's BRDF lobe,
        # then the cosine integral about the normal
        def per_point(sp_axis, sp_sharp, sp_amp, n):
            point_sg = SphericalGaussians(
                axis=sp_axis[None], sharpness=sp_sharp[None], amplitude=sp_amp[None]
            )
            lam = light.sharpness + point_sg.sharpness
            um = (
                light.sharpness * light.axis
                + point_sg.sharpness * point_sg.axis
            ) / jnp.maximum(lam, 1e-8)
            norm = jnp.sqrt(jnp.sum(um * um, -1, keepdims=True) + 1e-12)
            prod = SphericalGaussians(
                axis=um / norm, sharpness=lam * norm,
                amplitude=light.amplitude * point_sg.amplitude
                * jnp.exp(lam * norm - lam),
            )
            spec_term = prod.cosine_integral(jnp.broadcast_to(n, (1, 3)))[0]
            diff_term = light.cosine_integral(jnp.broadcast_to(n, (1, 3)))[0]
            return diff_term, spec_term

        diff_term, spec_term = jax.vmap(per_point)(
            spec.axis, spec.sharpness, spec.amplitude, normals
        )
        return diff_term * (albedo / jnp.pi), spec_term * moi
