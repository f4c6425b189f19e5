"""Texture containers wrapping the cubemap/latlng ops as pytrees.

Parity targets in ``rfstudio/graphics/_mesh/_texture.py``: ``Texture2D``
(:29, bilinear sampling :168-176), ``TextureLatLng`` (:264, pdf tables
:287-305, ``as_cubemap`` :359), ``TextureCubeMap`` (:386, ``downsample``
:407, ``as_latlng`` :454, ``as_splitsum`` :530), ``TextureSplitSum`` (:560,
``sample`` :571-614), ``TextureSG`` (:648). Everything is a pytree; ops live
in ops/cubemap.py and ops/envshade.py."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import cubemap as cm
from ..ops import envshade as es
from ..utils.tensorclass import TensorClass, static_field
from . import gmath


class Texture2D(TensorClass):
    data: jnp.ndarray  # [H, W, C]

    def sample(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Bilinear sample at uv in [0, 1]^2 (clamp boundary). [..., C]."""
        h, w = self.data.shape[:2]
        fu = jnp.clip(uv[..., 0], 0, 1) * w - 0.5
        fv = jnp.clip(uv[..., 1], 0, 1) * h - 0.5
        x0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        wx = jnp.clip(fu - x0, 0, 1)[..., None]
        wy = jnp.clip(fv - y0, 0, 1)[..., None]
        return (
            self.data[y0, x0] * (1 - wx) * (1 - wy)
            + self.data[y0, x1] * wx * (1 - wy)
            + self.data[y1, x0] * (1 - wx) * wy
            + self.data[y1, x1] * wx * wy
        )


class TextureLatLng(TensorClass):
    data: jnp.ndarray  # [H, W, 3]

    def compute_pdf(self) -> es.LightPdf:
        return es.compute_light_pdf(self.data)

    def sample(self, dirs: jnp.ndarray) -> jnp.ndarray:
        uv = gmath.dir_to_latlng_uv(dirs)
        return Texture2D(data=self.data).sample(uv)

    def as_cubemap(self, resolution: int = 512) -> "TextureCubeMap":
        dirs = cm.texel_directions(resolution)
        return TextureCubeMap(data=self.sample(dirs))


class TextureCubeMap(TensorClass):
    data: jnp.ndarray  # [6, R, R, 3]

    def sample(self, dirs: jnp.ndarray) -> jnp.ndarray:
        return cm.sample_cubemap(self.data, dirs)

    def downsample(self) -> "TextureCubeMap":
        return TextureCubeMap(data=cm.downsample(self.data))

    def as_latlng(self, width: int = 512, height: int = 256) -> TextureLatLng:
        from ..models.geosplat_mc import cubemap_to_latlng

        return TextureLatLng(data=cubemap_to_latlng(self.data, height, width))

    def as_splitsum(self, **kw) -> "TextureSplitSum":
        base, mips = cm.prefilter_splitsum(self.data, **kw)
        return TextureSplitSum(base=base, mips=tuple(mips))

    def render(self, camera) -> jnp.ndarray:
        """Envmap background for camera rays (_texture.py:422-452)."""
        _, dirs = camera.generate_rays()
        return self.sample(dirs)


class TextureSplitSum(TensorClass):
    base: jnp.ndarray             # [6, r, r, 3] diffuse
    mips: tuple = ()              # tuple of [6, R_i, R_i, 3] specular mips
    min_roughness: float = static_field(default=0.08)
    max_roughness: float = static_field(default=0.5)

    def sample(self, normals, directions, roughness):
        return cm.sample_splitsum(
            self.base, list(self.mips), normals, directions, roughness,
            min_roughness=self.min_roughness, max_roughness=self.max_roughness,
        )
