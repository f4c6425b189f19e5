"""GeoSplatterDefer — stage 3: deferred G-buffer shading + relighting API.

Parity target: ``rfstudio/model/geosplat_defer.py:34-450`` (stage-2 export
load with Gaussians as direct parameters :56-76, envmap as hue*exp(value)
decomposition :79-85, fresh ks encoder :42-52, deferred render_report
:152-294, ``set_relight_envmap`` with albedo scaling :104-108) and
``RenderableAttrs.splat_mc_deferred`` (``geosplat.py:247-376``): a
14-channel G-buffer (normal, kd, roughness/metallic, occ) rasterized and
alpha-normalized, fragment positions from mesh rasterization, per-pixel MC
environment shading, residual indirect light, composite times alpha.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..graphics import gmath
from ..graphics.cameras import Cameras
from ..graphics.mesh import TriangleMesh
from ..ops import envshade as es
from ..ops.hashgrid import HashGridConfig
from ..ops.mesh_raster import rasterize_mesh, interpolate
from ..ops import rasterize as rasterize_mod
from ..ops.rasterize import rasterize
from ..ops.sdf_visibility import make_sdf_visibility
from .geosplat import (
    HashEncoding, apply_ks_bundle, tone_aces, tone_naive,
)
from .mlp import MLPConfig

KS_ENC = HashEncoding(
    grid=HashGridConfig(max_res=4096, log2_hashmap_size=18, grad_scaling=16.0),
    mlp=MLPConfig(layers=(-1, 32, 2), activation="none", bias=False,
                  initialization="kaiming-uniform"),
)


@dataclasses.dataclass(frozen=True)
class GeoSplatterDefer:
    background_color: str = "random"
    ks_enc: HashEncoding = KS_ENC
    min_roughness: float = 0.1
    max_metallic: float = 1.0
    scale: float = 1.05
    resolution: int = 32
    num_samples_x: int = 4
    shadow_scale: float = 1.0
    shadow_steps: int = 24
    tile_capacity: int = 1024
    pairs_per_gaussian: int = 6
    pairs_budget: int | None = None
    chunk_size: int = 128
    tile_shape: str = "16"    # pairs-kernel tile "WxH" (see GeoSplatter)
    # vmap the gradient-free binning sorts over the camera batch
    # (see GeoSplatter.batched_binning); pairs backend only
    batched_binning: bool = False
    tile_chunk: int = 8
    mesh_tile_capacity: int = 256
    backend: str = "auto"

    # --- init from stage-2 export (geosplat_defer.py:54-93) --------------------
    def init_from_stage2(self, export: dict, key: jax.Array) -> dict[str, Any]:
        latlng = jnp.asarray(export["latlng"])
        return {
            "exposure": jnp.asarray(export["exposure"]),
            "means": jnp.asarray(export["means"]),
            "scales": jnp.asarray(export["scales"]),
            "quats": jnp.asarray(export["quats"]),
            "opacities": jnp.asarray(export["opacities"]),
            "normals": jnp.asarray(export["normals"]),
            "kd": jnp.asarray(export["kd"]),
            "occ": jnp.asarray(export["occ"]),
            "ks_enc": export["ks_enc"] if isinstance(export["ks_enc"], dict)
            else self.ks_enc.init(key),
            "latlng_hue": latlng / (latlng + 1.0),
            "latlng_value": jnp.log(latlng + 1.00001),
        }

    @staticmethod
    def frozen_geometry(export: dict) -> dict[str, Any]:
        """Non-trainable stage-2 geometry consumed by the forward."""
        return {
            "mesh_v": jnp.asarray(export["mc_vertices"]),
            "mesh_i": jnp.asarray(export["mc_indices"]),
            "mesh_mask": jnp.asarray(export["mc_face_mask"])
            if export.get("mc_face_mask") is not None else None,
            "initial_guess": jnp.asarray(export["initial_guess"]),
            "sdf": jnp.asarray(export["sdf"]),
        }

    def get_background(self, key, training: bool) -> jnp.ndarray:
        if self.background_color == "black":
            return jnp.zeros(3)
        if self.background_color == "white":
            return jnp.ones(3)
        if training and key is not None:
            return jax.random.uniform(key, (3,))
        return jnp.array([0.1490, 0.1647, 0.2157])

    def get_envmap(
        self, params: dict, relight_envmap: jnp.ndarray | None = None
    ) -> es.LightPdf:
        if relight_envmap is not None:
            return es.compute_light_pdf(relight_envmap)
        return es.compute_light_pdf(
            params["latlng_hue"] * jnp.exp(params["latlng_value"])
        )

    # --- the stage-3 forward ------------------------------------------------------
    def render(
        self,
        params: dict,
        geometry: dict,
        cameras: Cameras,
        key: jax.Array,
        *,
        ks_weight: jnp.ndarray | float = 0.0,
        mode: str = "pbr",
        tone_type: str = "naive",
        relight_envmap: jnp.ndarray | None = None,
        albedo_scaling: jnp.ndarray | None = None,
        num_samples_override: int | None = None,
        shade_keys: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
        """Returns (rgba [B, H, W, 4], regularization, aux)."""
        normals = gmath.safe_normalize(params["normals"])
        means = params["means"]
        k1, k2, k3 = jax.random.split(key, 3)
        enc_in = jnp.clip(means / self.scale, -1, 1)
        ig = geometry["initial_guess"]
        ks = jax.nn.sigmoid(
            apply_ks_bundle(params["ks_enc"], enc_in, self.ks_enc) + ig
        )
        jit_in = jnp.clip(
            (means + jax.random.normal(k1, means.shape) * 0.01) / self.scale, -1, 1
        )
        ks_jitter = jax.nn.sigmoid(
            apply_ks_bundle(params["ks_enc"], jit_in, self.ks_enc) + ig
        )
        reg = jnp.abs(ks - ks_jitter).mean() * ks_weight

        kd = params["kd"]
        occ = params["occ"]
        if albedo_scaling is not None:
            # relighting: scale albedo, collapse occ (geosplat_defer.py:170-178)
            occ = occ.mean(-1, keepdims=True) * jnp.concatenate(
                (jnp.ones_like(kd), kd), -1
            )
            kd = kd * albedo_scaling

        light = self.get_envmap(params, relight_envmap)
        exposure = (
            jnp.exp(params["exposure"][0]) if albedo_scaling is None else jnp.asarray(1.0)
        )
        mesh = TriangleMesh(
            vertices=geometry["mesh_v"], indices=geometry["mesh_i"],
            face_mask=geometry["mesh_mask"],
        )
        vis_fn = make_sdf_visibility(
            geometry["sdf"], (self.resolution,) * 3, self.scale,
            num_steps=self.shadow_steps,
        ) if self.shadow_scale > 0 else None

        bsz = cameras.shape[0]
        precomp = None
        if self.batched_binning:
            # vmap the gradient-free binning sorts over the camera batch
            # (see GeoSplatter.batched_binning). The per-camera opacity kill
            # for back-facing gaussians feeds binning, so it is recomputed
            # batched here (and again, cheaply, inside render_one for the
            # G-buffer colors).
            lookat_b = -cameras.c2w[:, :, 2]                     # [B, 3]
            bend_b = (
                jax.lax.stop_gradient(normals) @ lookat_b.T
            ).T[..., None] > 0                                   # [B, N, 1]
            opac_b = jnp.where(bend_b, -2.0, params["opacities"][None])
            precomp = rasterize_mod.bin_cameras_batched(
                means, gmath.safe_normalize(params["quats"]),
                jnp.exp(params["scales"]),
                jax.nn.sigmoid(opac_b[..., 0]),
                cameras.view_matrix, cameras.intrinsic_matrix,
                cameras.width, cameras.height,
                rasterize_mode="antialiased",
                pairs_per_gaussian=self.pairs_per_gaussian,
                max_pairs_override=self.pairs_budget,
                chunk_size=self.chunk_size,
                tile_size=self.tile_shape,
            )

        @jax.checkpoint
        def render_one(args):
            if precomp is None:
                cam, sk = args
            else:
                cam, sk, proj, bins = args
            camera_pos = cam.c2w[:, 3]
            camera_lookat = -cam.c2w[:, 2]
            bend = jnp.sum(
                jax.lax.stop_gradient(normals) * camera_lookat, -1, keepdims=True
            ) > 0
            frag_normals = jnp.where(bend, -normals, normals)
            opac = jnp.where(bend, -2.0, params["opacities"])

            gbuf_colors = jnp.concatenate((frag_normals, kd, ks, occ), -1)  # 14ch
            if precomp is None:
                render, alpha, info = rasterize(
                    means, gmath.safe_normalize(params["quats"]),
                    jnp.exp(params["scales"]), jax.nn.sigmoid(opac[:, 0]),
                    gbuf_colors, cam.view_matrix, cam.intrinsic_matrix,
                    cam.width, cam.height,
                    rasterize_mode="antialiased",
                    tile_capacity=self.tile_capacity,
                    pairs_per_gaussian=self.pairs_per_gaussian,
                    max_pairs_override=self.pairs_budget,
                    chunk_size=self.chunk_size,
                    tile_chunk=self.tile_chunk,
                    tile_size=self.tile_shape,
                    backend=self.backend,
                )
            else:
                render, alpha, info = rasterize_mod.composite_from_bins(
                    proj, bins, gbuf_colors, kc=precomp[2], max_pairs=precomp[3],
                    width=cam.width, height=cam.height,
                    tile_size=self.tile_shape,
                )
            render = render / jnp.maximum(jax.lax.stop_gradient(alpha), 1e-6)
            frag_n = gmath.safe_normalize(render[..., 0:3])
            frag_kd = render[..., 3:6]
            frag_rough = render[..., 6:7] * (1 - self.min_roughness) + self.min_roughness
            frag_metal = render[..., 7:8] * self.max_metallic
            frag_occ = render[..., 8:14]

            rast = rasterize_mesh(
                mesh, cam, tile_capacity=self.mesh_tile_capacity,
            )
            frag_pos = interpolate(mesh.vertices, mesh, rast)  # [H, W, 3]

            hw = cam.height * cam.width
            flat = lambda x: x.reshape(hw, -1)  # noqa: E731
            arm = jnp.concatenate(
                (jnp.zeros_like(frag_rough), frag_rough, frag_metal), -1
            )
            diff, spec, resi = es.env_shade(
                sk,
                flat(frag_pos),
                flat(frag_n),
                camera_pos,
                flat(frag_kd),
                flat(arm),
                light,
                num_samples_x=num_samples_override or self.num_samples_x,
                visibility_fn=vis_fn,
                shadow_scale=self.shadow_scale,
            )
            sh = (cam.height, cam.width)
            diff = jnp.maximum(diff.reshape(sh + (3,)), 1e-4)
            spec = jnp.maximum(spec.reshape(sh + (3,)), 1e-4)
            resi = jnp.clip(resi.reshape(sh + (2,)), 0.0, 1.0)

            residual_light = jax.nn.sigmoid(frag_occ - 3.0)
            diff = diff + resi[..., 0:1] * residual_light[..., :3]
            spec = spec + resi[..., 1:2] * residual_light[..., 3:]
            kd_factor = frag_kd * (1 - frag_metal)
            if mode == "pbr":
                colors = diff * kd_factor + spec
            elif mode == "diffuse":
                colors = diff * kd_factor
            else:
                colors = spec
            rgba = jnp.concatenate(
                (colors * jax.lax.stop_gradient(alpha), alpha), -1
            )
            if tone_type == "naive":
                rgb = tone_naive(rgba[..., :3], exposure)
            elif tone_type == "aces":
                rgb = tone_aces(rgba[..., :3], exposure)
            else:
                rgb = rgba[..., :3] * exposure
            return jnp.concatenate((rgb, rgba[..., 3:]), -1), info["total_pairs"]

        keys_b = (  # see GeoSplatterMC.render shade_keys
            shade_keys if shade_keys is not None
            else jax.random.split(k3, bsz)
        )
        xs = (
            (cameras, keys_b) if precomp is None
            else (cameras, keys_b, precomp[0], precomp[1])
        )
        rgba, total_pairs = jax.lax.map(render_one, xs)
        aux = {
            "num_gaussians": means.shape[0],
            "total_pairs": total_pairs.max(),
            "max_pairs": jnp.asarray(
                min(self.pairs_per_gaussian * means.shape[0], self.pairs_budget or (1 << 62)),
                jnp.int32,
            ),
        }
        return rgba, reg, aux

    # --- auxiliary renders (albedo / roughness / normals; eval surface) ---------
    def gaussian_ks(self, params: dict, geometry: dict) -> jnp.ndarray:
        enc_in = jnp.clip(params["means"] / self.scale, -1, 1)
        return jax.nn.sigmoid(
            apply_ks_bundle(params["ks_enc"], enc_in, self.ks_enc)
            + geometry["initial_guess"]
        )

    def render_attribute(
        self, params: dict, cameras: Cameras, attribute: str,
        albedo_scaling: jnp.ndarray | None = None,
        geometry: dict | None = None,
    ) -> jnp.ndarray:
        """Rasterize a per-Gaussian attribute map (kd / ks / normal) with
        alpha, matching the eval renders at geosplat_defer.py:243-287."""
        normals = gmath.safe_normalize(params["normals"])
        kd = params["kd"] if albedo_scaling is None else params["kd"] * albedo_scaling
        if attribute == "kd":
            colors = kd
        elif attribute == "ks":
            assert geometry is not None
            ks = self.gaussian_ks(params, geometry)
            colors = jnp.concatenate(
                (
                    jnp.zeros_like(ks[:, :1]),
                    ks[:, 0:1] * (1 - self.min_roughness) + self.min_roughness,
                    ks[:, 1:2] * self.max_metallic,
                ),
                -1,
            )
        elif attribute == "normal":
            colors = normals * 0.5 + 0.5
        else:
            raise ValueError(attribute)

        def render_one(cam):
            camera_lookat = -cam.c2w[:, 2]
            bend = jnp.sum(normals * camera_lookat, -1, keepdims=True) > 0
            opac = jnp.where(bend, -2.0, params["opacities"])
            r, a, _ = rasterize(
                params["means"], gmath.safe_normalize(params["quats"]),
                jnp.exp(params["scales"]), jax.nn.sigmoid(opac[:, 0]),
                colors, cam.view_matrix, cam.intrinsic_matrix,
                cam.width, cam.height,
                rasterize_mode="antialiased",
                tile_capacity=self.tile_capacity,
                tile_chunk=self.tile_chunk,
                tile_size=self.tile_shape,
                backend=self.backend,
            )
            return jnp.concatenate((r / jnp.maximum(a, 1e-6) * a, a), -1)

        return jax.lax.map(render_one, cameras)
