"""Synthetic dataparsers that render a known mesh into train/val/test views.

Parity targets:
- ``rfstudio/data/dataparser/mvs_dataparser.py:46-129``
  (MeshViewSynthesisDataparser: lambertian-shaded known models),
- ``dr_dataparser.py:52-133`` (MeshDRDataparser: depth images),
- ``pbr_dataparser.py:43-132`` (MeshPBRDataparser: split-sum PBR + envmap),
- ``shapenet_dataparser.py:16-97`` (ShapeNetDataparser: pure-shaded
  model_normalized.obj).

The reference renders GT via nvdiffrast at parse time; here the same is done
with the in-repo tile mesh rasterizer + shader library. View sampling uses a
fixed jax key per parser (the analog of ``create_random_seed_context``), so
splits are reproducible across runs.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...graphics import shaders
from ...graphics.cameras import Cameras
from ...graphics.mesh import TriangleMesh
from ...graphics.mesh_io import load_mesh
from ..io import load_float32_image
from .blender_family import ParsedSplit

_MVS_MODELS = {
    "spot": ("spot_triangulated.obj", 45.0, 3.0),
    "cube": ("cube.obj", 45.0, 3.0),
    "damicornis": ("usnm_93379-150k.obj", 15.0, 3.0),
}
_DR_MODELS = {
    "spot": ("spot.obj", 45.0, 3.0, False),
    "inputmodels": ("block.obj", 45.0, 3.0, False),
    "damicornis": ("usnm_93379-150k.obj", 15.0, 3.0, False),
    "lego": ("lego.ply", 45.0, 3.0, True),
}
_PBR_MODELS = {
    "spot": ("spot.obj", 45.0, 3.0, None),
    "damicornis": ("usnm_93379-150k.obj", 15.0, 3.0, (0.0, 0.25, 0.0)),
}


def _normalized_mesh(path: Path) -> TriangleMesh:
    data = load_mesh(path)
    v = data["vertices"]
    center = 0.5 * (v.min(0) + v.max(0))
    v = v - center
    v = v / max(np.abs(v).max(), 1e-8)
    return TriangleMesh(
        vertices=jnp.asarray(v), indices=jnp.asarray(data["indices"])
    )


def _split_cameras(
    seed: int, split: str, *, radius: float, pitch: float,
    n_train: int, n_val: int, n_test: int, width: int, height: int,
) -> Cameras:
    kw = dict(width=width, height=height, near=1e-2, far=1e2,
              fov_degrees=45.0)
    if split == "val":
        return Cameras.from_orbit(
            center=jnp.zeros(3), radius=radius, elevation_degrees=pitch,
            num_samples=n_val, **kw,
        )
    cams = Cameras.from_sphere(
        jax.random.key(seed), center=jnp.zeros(3), radius=radius,
        num_samples=n_train + n_test, **kw,
    )
    if split == "train":
        return cams[jnp.arange(n_train)]
    if split == "test":
        return cams[jnp.arange(n_train + n_test - n_test, n_train + n_test)]
    raise ValueError(f"unknown split: {split}")


def _rendered_split(cams: Cameras, render_one, meta: Any) -> ParsedSplit:
    images = np.stack(
        [np.asarray(render_one(cams[i])) for i in range(cams.shape[0])]
    )
    c2w = np.asarray(cams.c2w)
    return ParsedSplit(
        c2w=c2w,
        focal=float(np.asarray(cams.fx)[0]),
        fx=np.asarray(cams.fx), fy=np.asarray(cams.fy),
        cx=np.asarray(cams.cx), cy=np.asarray(cams.cy),
        width=cams.width, height=cams.height,
        near=cams.near, far=cams.far,
        image_paths=[], images=images, meta=meta,
    )


@dataclasses.dataclass(frozen=True)
class MeshViewSynthesisDataparser:
    """Known-model lambertian renders (mvs_dataparser.py:46)."""

    resolution: int = 512
    num_train_views: int = 192
    num_val_views: int = 64
    num_test_views: int = 128
    view_sampling_seed: int = 123

    def parse(self, path: Path, split: str) -> ParsedSplit:
        name, pitch, radius = _MVS_MODELS[path.name]
        mesh = _normalized_mesh(path / name)
        cams = _split_cameras(
            self.view_sampling_seed, split, radius=radius, pitch=pitch,
            n_train=self.num_train_views, n_val=self.num_val_views,
            n_test=self.num_test_views,
            width=self.resolution, height=self.resolution,
        )
        return _rendered_split(
            cams, lambda c: shaders.render_pretty(mesh, c), {"mesh": mesh}
        )

    @staticmethod
    def recognize(path: Path) -> bool:
        return path.name in _MVS_MODELS and (
            path / _MVS_MODELS[path.name][0]
        ).exists()


@dataclasses.dataclass(frozen=True)
class MeshDRDataparser:
    """Known-model depth renders for depth-supervised recon
    (dr_dataparser.py:52)."""

    resolution: int = 800
    num_train_views: int = 100
    num_val_views: int = 100
    num_test_views: int = 200
    view_sampling_seed: int = 123

    def parse(self, path: Path, split: str) -> ParsedSplit:
        name, pitch, radius, _z_up = _DR_MODELS[path.name]
        mesh = _normalized_mesh(path / name)
        cams = _split_cameras(
            self.view_sampling_seed, split, radius=radius, pitch=pitch,
            n_train=self.num_train_views, n_val=self.num_val_views,
            n_test=self.num_test_views,
            width=self.resolution, height=self.resolution,
        )

        def render_depth_rgba(c):
            d = shaders.render_depth(mesh, c)      # [H, W, 2] depth+alpha
            depth = d[..., 0:1]
            a = d[..., 1:2]
            return jnp.concatenate((depth, depth, depth, a), -1)

        return _rendered_split(cams, render_depth_rgba, {"mesh": mesh})

    @staticmethod
    def recognize(path: Path) -> bool:
        return path.name in _DR_MODELS and (
            path / _DR_MODELS[path.name][0]
        ).exists()


@dataclasses.dataclass(frozen=True)
class MeshPBRDataparser:
    """Known-model split-sum PBR renders under an HDR envmap
    (pbr_dataparser.py:43)."""

    resolution: int = 800
    num_train_views: int = 100
    num_val_views: int = 100
    num_test_views: int = 200
    view_sampling_seed: int = 123
    envmap_path: str = "data/irrmaps/aerodynamics_workshop_2k.hdr"

    def parse(self, path: Path, split: str) -> ParsedSplit:
        from ...graphics.textures import TextureLatLng
        from ...ops import cubemap as cm

        name, pitch, radius, ks_const = _PBR_MODELS[path.name]
        data = load_mesh(path / name)
        mesh = _normalized_mesh(path / name)
        v = mesh.num_vertices
        kd = jnp.asarray(
            data.get("colors", np.full((v, 3), 0.75, np.float32))
        )
        ks = jnp.broadcast_to(
            jnp.asarray(ks_const or (0.0, 0.5, 0.0))[1:3], (v, 2)
        )
        env = load_float32_image(self.envmap_path)[..., :3]
        cube = TextureLatLng(data=jnp.asarray(env)).as_cubemap(128).data
        env_base, env_mips = cm.prefilter_splitsum(cube)
        cams = _split_cameras(
            self.view_sampling_seed, split, radius=radius, pitch=pitch,
            n_train=self.num_train_views, n_val=self.num_val_views,
            n_test=self.num_test_views,
            width=self.resolution, height=self.resolution,
        )
        return _rendered_split(
            cams,
            lambda c: shaders.render_pbr(
                mesh, c, kd=kd, ks=ks, env_base=env_base, env_mips=env_mips
            ),
            {"mesh": mesh},
        )

    @staticmethod
    def recognize(path: Path) -> bool:
        return path.name in _PBR_MODELS and (
            path / _PBR_MODELS[path.name][0]
        ).exists()


@dataclasses.dataclass(frozen=True)
class ShapeNetDataparser:
    """ShapeNet model_normalized.obj pure-shaded renders
    (shapenet_dataparser.py:16)."""

    resolution: int = 800
    num_train_views: int = 100
    num_val_views: int = 20
    num_test_views: int = 20
    view_sampling_seed: int = 1

    def parse(self, path: Path, split: str) -> ParsedSplit:
        mesh = _normalized_mesh(path / "models" / "model_normalized.obj")
        cams = _split_cameras(
            self.view_sampling_seed, split, radius=3.0, pitch=45.0,
            n_train=self.num_train_views, n_val=self.num_val_views,
            n_test=self.num_test_views,
            width=self.resolution, height=self.resolution,
        )
        return _rendered_split(
            cams, lambda c: shaders.render_pure(mesh, c), {"mesh": mesh}
        )

    @staticmethod
    def recognize(path: Path) -> bool:
        return (path / "models" / "model_normalized.obj").exists() and (
            path / "models" / "model_normalized.mtl"
        ).exists()
