"""2D toy pipeline: flatland cameras + analytic circle scenes.

Parity: ``rfstudio/graphics/_2d.py:27-330`` (``Cameras2D``, ``RGBA2DImages``
as plain [N, W, 4] arrays, ``CircleShape2D`` with its analytic ray-circle
renderer and the position-derived shading ``_shading2D``) and the
``Synthetic2DDataparser`` scene generator (``syn2d_dataparser.py``). The toy
is the debugging playground for splatting/ray-marching ideas: 1-D images
make every quantity plottable."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.tensorclass import TensorClass, static_field


def shading2d(x: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Position -> RGB (the reference's _shading2D, _2d.py:86-88)."""
    colors = jnp.clip(x / (2 * scale) + 0.5, 0.0, 1.0)
    return jnp.concatenate(
        (colors, 1.0 - colors[..., 0:1] * colors[..., 1:2]), axis=-1
    )


class Cameras2D(TensorClass):
    c2w: jnp.ndarray            # [..., 2, 3] rotation (2x2) | translation
    focal: jnp.ndarray          # [...]
    width: int = static_field(default=800)
    near: float = static_field(default=1e-3)
    far: float = static_field(default=1e3)

    @property
    def shape(self) -> tuple[int, ...]:
        return self.c2w.shape[:-2]

    @classmethod
    def from_lookat(
        cls,
        eye: jnp.ndarray,           # [..., 2]
        target: jnp.ndarray,        # [..., 2]
        *,
        width: int = 800,
        hfov_degrees: float = 90.0,
        near: float = 1e-3,
        far: float = 1e3,
    ) -> "Cameras2D":
        eye = jnp.asarray(eye, jnp.float32)
        target = jnp.broadcast_to(jnp.asarray(target, jnp.float32), eye.shape)
        fwd = target - eye
        fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True).clip(1e-8)
        right = jnp.stack((fwd[..., 1], -fwd[..., 0]), axis=-1)
        c2w = jnp.concatenate(
            (jnp.stack((right, -fwd), axis=-1), eye[..., None]), axis=-1
        )  # columns: right | forward(-z analog) | eye
        focal = 0.5 * width / jnp.tan(jnp.deg2rad(hfov_degrees) / 2.0)
        return cls(
            c2w=c2w,
            focal=jnp.broadcast_to(jnp.asarray(focal, jnp.float32), eye.shape[:-1]),
            width=width, near=near, far=far,
        )

    @classmethod
    def from_orbit(
        cls, *, center=(0.0, 0.0), radius: float = 1.0, num_samples: int = 8,
        **kwargs,
    ) -> "Cameras2D":
        center = jnp.asarray(center, jnp.float32)
        phi = jnp.linspace(0.0, 2.0 * jnp.pi, num_samples, endpoint=False)
        eye = center + radius * jnp.stack((jnp.cos(phi), jnp.sin(phi)), axis=-1)
        return cls.from_lookat(eye, jnp.broadcast_to(center, eye.shape), **kwargs)

    def generate_rays(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-pixel rays: (origins [..., W, 2], directions [..., W, 2])."""
        xs = jnp.arange(self.width, dtype=jnp.float32) + 0.5 - self.width / 2.0
        shp = self.shape
        d_cam = jnp.stack(
            (
                jnp.broadcast_to(xs, shp + (self.width,)),
                -jnp.broadcast_to(
                    self.focal[..., None], shp + (self.width,)
                ),
            ),
            axis=-1,
        )  # [..., W, 2] camera space (forward = -y axis of cam frame)
        rot = self.c2w[..., :2, :2].reshape(shp + (1, 2, 2))
        d_world = (rot @ d_cam[..., None])[..., 0]
        d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True).clip(1e-8)
        origins = jnp.broadcast_to(
            self.c2w[..., :2, 2].reshape(shp + (1, 2)), d_world.shape
        )
        return origins, d_world


class CircleShape2D(TensorClass):
    origins: jnp.ndarray   # [C, 2]
    radius: jnp.ndarray    # [C, 1]

    @classmethod
    def random(cls, key: jax.Array, size: int) -> "CircleShape2D":
        k1, k2 = jax.random.split(key)
        radius = jax.random.uniform(k1, (size, 1)) * 0.2 + 0.1
        origins = (jax.random.uniform(k2, (size, 2)) * 2 - 1) * ((1 - radius) * 0.8)
        return cls(origins=origins, radius=radius)

    def render(self, cameras: Cameras2D) -> jnp.ndarray:
        """Analytic closest-hit render -> rgba [..., W, 4] (_2d.py:104-122)."""
        o, d = cameras.generate_rays()              # [..., W, 2]
        oc = o[..., None, :, :] - self.origins[:, None, :]   # [..., C, W, 2]
        b = 2.0 * jnp.sum(d[..., None, :, :] * oc, -1)       # [..., C, W]
        c = jnp.sum(oc * oc, -1) - (self.radius**2)[..., :1]
        disc = b * b - 4 * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) / 2.0
        t2 = (-b + sq) / 2.0
        far2 = 2.0 * cameras.far
        t1 = jnp.where((t1 > cameras.near) & (disc >= 0), t1, far2)
        t2 = jnp.where((t2 > cameras.near) & (disc >= 0), t2, far2)
        ts = jnp.min(jnp.minimum(t1, t2), axis=-2)[..., None]   # [..., W, 1]
        hit_p = o + ts * d
        alpha = (ts < cameras.far).astype(jnp.float32)
        return jnp.concatenate((shading2d(hit_p) * alpha, alpha), axis=-1)

    def visualize(self, *, width: int, height: int, scale: float = 1.0) -> jnp.ndarray:
        """Top-down rgba [H, W, 4] view of the scene (_2d.py:124-134)."""
        xs = jnp.linspace(-scale, scale, width)
        ys = jnp.linspace(-scale, scale, height)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        q = jnp.stack((gx, gy), axis=-1)[::-1]
        d2 = jnp.sum(
            (q - self.origins[:, None, None, :]) ** 2, -1, keepdims=True
        )
        alpha = jnp.any(
            d2 < (self.radius[:, None, None, :] ** 2), axis=0
        ).astype(jnp.float32)
        return jnp.concatenate((shading2d(q) * alpha, alpha), axis=-1)
