"""Pinhole cameras as a pytree, with the reference's coordinate conventions.

Parity target: ``rfstudio/graphics/_cameras.py:34`` — ``c2w`` is an
OpenGL-style camera-to-world [..., 3, 4] (camera looks down **-z**, y up);
``view_matrix`` flips y/z to the rasterizer convention (+z forward, y down,
_cameras.py:300-315); ``projection_matrix`` is the OpenGL frustum
(:317-333); ``intrinsic_matrix`` standard K (:290-298). Width/height are
static ints so image shapes are compile-time constants under ``jit``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils.tensorclass import TensorClass, static_field
from . import gmath


class Cameras(TensorClass):
    c2w: jnp.ndarray  # [..., 3, 4]
    fx: jnp.ndarray  # [...]
    fy: jnp.ndarray  # [...]
    cx: jnp.ndarray  # [...]
    cy: jnp.ndarray  # [...]
    width: int = static_field(default=800)
    height: int = static_field(default=800)
    near: float = static_field(default=0.01)
    far: float = static_field(default=1e3)

    @property
    def shape(self) -> tuple[int, ...]:
        return self.c2w.shape[:-2]

    # ---- constructors ------------------------------------------------------
    @classmethod
    def from_lookat(
        cls,
        eye: jnp.ndarray,
        target: jnp.ndarray,
        up: jnp.ndarray | None = None,
        *,
        fov_degrees: float = 60.0,
        width: int = 800,
        height: int = 800,
        near: float = 0.01,
        far: float = 1e3,
    ) -> "Cameras":
        eye = jnp.asarray(eye, jnp.float32)
        target = jnp.asarray(target, jnp.float32)
        if up is None:
            up = jnp.array([0.0, 0.0, 1.0])
        up = jnp.broadcast_to(jnp.asarray(up, jnp.float32), eye.shape)
        forward = gmath.safe_normalize(target - eye)  # camera -z
        right = gmath.safe_normalize(jnp.cross(forward, up))
        true_up = jnp.cross(right, forward)
        rot = jnp.stack((right, true_up, -forward), axis=-1)  # columns
        c2w = jnp.concatenate((rot, eye[..., :, None]), axis=-1)
        focal = 0.5 * height / jnp.tan(jnp.deg2rad(fov_degrees) * 0.5)
        bs = eye.shape[:-1]
        return cls(
            c2w=c2w,
            fx=jnp.broadcast_to(focal, bs),
            fy=jnp.broadcast_to(focal, bs),
            cx=jnp.full(bs, width / 2.0),
            cy=jnp.full(bs, height / 2.0),
            width=width,
            height=height,
            near=near,
            far=far,
        )

    @classmethod
    def from_orbit(
        cls,
        *,
        center: jnp.ndarray,
        radius: float,
        elevation_degrees: float,
        num_samples: int,
        **kwargs,
    ) -> "Cameras":
        center = jnp.asarray(center, jnp.float32)
        phi = jnp.linspace(0.0, 2.0 * jnp.pi, num_samples, endpoint=False)
        el = jnp.deg2rad(elevation_degrees)
        eye = center + radius * jnp.stack(
            (
                jnp.cos(el) * jnp.cos(phi),
                jnp.cos(el) * jnp.sin(phi),
                jnp.full_like(phi, jnp.sin(el)),
            ),
            axis=-1,
        )
        return cls.from_lookat(eye, jnp.broadcast_to(center, eye.shape), **kwargs)

    @classmethod
    def from_hemisphere(
        cls, key: jax.Array, *, center: jnp.ndarray, radius: float, num_samples: int, **kwargs
    ) -> "Cameras":
        d = gmath.sample_sphere(key, (num_samples,))
        d = d.at[:, 2].set(jnp.abs(d[:, 2]))
        center = jnp.asarray(center, jnp.float32)
        eye = center + radius * d
        return cls.from_lookat(eye, jnp.broadcast_to(center, eye.shape), **kwargs)

    @classmethod
    def from_sphere(
        cls, key: jax.Array, *, center: jnp.ndarray, radius: float, num_samples: int, **kwargs
    ) -> "Cameras":
        """Uniform full-sphere view sampling (Cameras.from_sphere,
        _cameras.py constructors family)."""
        d = gmath.sample_sphere(key, (num_samples,))
        center = jnp.asarray(center, jnp.float32)
        eye = center + radius * d
        return cls.from_lookat(eye, jnp.broadcast_to(center, eye.shape), **kwargs)

    # ---- matrices -----------------------------------------------------------
    @property
    def intrinsic_matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        k = jnp.stack(
            (self.fx, z, self.cx, z, self.fy, self.cy, z, z, o), axis=-1
        )
        return k.reshape(self.shape + (3, 3))

    @property
    def view_matrix(self) -> jnp.ndarray:
        """World-to-camera [..., 4, 4] in +z-forward/y-down convention."""
        r = self.c2w[..., :3, :3] * jnp.array([1.0, -1.0, -1.0])
        t = self.c2w[..., :3, 3:4]
        r_inv = jnp.swapaxes(r, -1, -2)
        t_inv = -r_inv @ t
        top = jnp.concatenate((r_inv, t_inv), axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0]), self.shape + (1, 4)
        )
        return jnp.concatenate((top, bottom), axis=-2)

    @property
    def projection_matrix(self) -> jnp.ndarray:
        """OpenGL-style frustum [..., 4, 4] over the +z-forward view space."""
        n, f = self.near, self.far
        t = self.cy * (n / self.fy)
        b = (self.cy - self.height) * (n / self.fy)
        r = self.cx * (n / self.fx)
        l = (self.cx - self.width) * (n / self.fx)  # noqa: E741
        zeros = jnp.zeros_like(self.fx)
        p00 = 2 * n / (r - l)
        p02 = (r + l) / (r - l)
        p11 = 2 * n / (t - b)
        p12 = (t + b) / (t - b)
        p22 = jnp.full_like(self.fx, (f + n) / (f - n))
        p23 = jnp.full_like(self.fx, -2 * f * n / (f - n))
        p32 = jnp.ones_like(self.fx)
        rows = jnp.stack(
            (
                p00, zeros, p02, zeros,
                zeros, p11, p12, zeros,
                zeros, zeros, p22, p23,
                zeros, zeros, p32, zeros,
            ),
            axis=-1,
        )
        return rows.reshape(self.shape + (4, 4))

    # ---- rays ---------------------------------------------------------------
    def generate_rays(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-pixel world-space ray (origins, directions), shape [..., H, W, 3]."""
        xs = jnp.arange(self.width, dtype=jnp.float32) + 0.5
        ys = jnp.arange(self.height, dtype=jnp.float32) + 0.5
        px, py = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]
        shp = self.shape

        def expand(v):
            return v.reshape(shp + (1, 1))

        dx = (px - expand(self.cx)) / expand(self.fx)
        dy = (py - expand(self.cy)) / expand(self.fy)
        # OpenGL camera: x right, y up, looking -z => flip image-space y
        d_cam = jnp.stack((dx, -dy, -jnp.ones_like(dx)), axis=-1)  # [..., H, W, 3]
        rot = self.c2w[..., :3, :3].reshape(shp + (1, 1, 3, 3))
        d_world = gmath.safe_normalize((rot @ d_cam[..., None])[..., 0])
        origins = jnp.broadcast_to(
            self.c2w[..., :3, 3].reshape(shp + (1, 1, 3)), d_world.shape
        )
        return origins, d_world

    def resize(self, width: int, height: int) -> "Cameras":
        sx = width / self.width
        sy = height / self.height
        return dataclasses.replace(
            self,
            fx=self.fx * sx,
            fy=self.fy * sy,
            cx=self.cx * sx,
            cy=self.cy * sy,
            width=width,
            height=height,
        )
