"""GeoSplatterPrior — mesh-prior variant (user-supplied initial mesh).

Parity target: ``rfstudio/model/geosplat_prior.py:63-439``: vertices of a
loaded mesh are directly optimized via learnable offsets with uniform-
Laplacian / normal-consistency / edge-length / offset regularizers
(:123-136), MGAdapter Gaussians + neural (or direct per-Gaussian, :106-111,
:170-178) materials, MC environment shading against a latlng map, optional
z-up -> y-up conversion (:95-96). Used for unbounded scenes (GOF-extracted
meshes) and object scans.

Visibility note: the reference traces an OptiX BVH over the prior mesh;
here shadows come from occupancy-grid transmittance marching over the live
mesh (ops/sdf_visibility.make_mesh_visibility) — the BVH-free analog of
the reference's per-step optix_build_bvh + shadow rays.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..graphics import gmath
from ..graphics.cameras import Cameras
from ..graphics.mesh import (
    TriangleMesh, mesh_edge_loss, mesh_normal_consistency,
    uniform_laplacian_smoothing,
)
from ..ops import envshade as es
from ..ops.denoise import bilateral_denoise
from ..ops.sdf_visibility import make_mesh_visibility
from ..ops.rasterize import rasterize
from .geosplat import (
    GaussianField, MGAdapter, RenderableAttrs, SharedField,
    export_ks_bundle, get_gaussians_from_face, tone_aces, tone_naive,
)
from .geosplat_mc import OCC_ENC


def z_up_to_y_up(vertices: jnp.ndarray) -> jnp.ndarray:
    """geosplat_prior.py:95-96: axis permute + flip + 1.25 * 2/3 scale."""
    v = vertices[..., jnp.array([1, 2, 0])] * jnp.array([-1.0, 1.0, -1.0])
    return v * (1.25 * 2 / 3)


@dataclasses.dataclass(frozen=True)
class GeoSplatterPrior:
    background_color: str = "random"
    smooth_type: str = "jitter"
    min_roughness: float = 0.1
    max_metallic: float = 1.0
    scale: float = 1.0
    field: Any = SharedField(with_occ=True)
    num_samples_x: int = 8
    shadow_scale: float = 0.95
    visibility_resolution: int = 64
    denoise: bool = True
    tile_capacity: int = 1024
    max_render_faces: int | None = None  # prior meshes are real, not padded
    field_eval_chunk: int = 262144
    pairs_per_gaussian: int = 6
    pairs_budget: int | None = None
    chunk_size: int = 128
    tile_shape: str = "16"    # pairs-kernel tile "WxH" (see GeoSplatter)
    tile_chunk: int = 8
    backend: str = "auto"

    def init(self, base_mesh: TriangleMesh, key: jax.Array) -> dict[str, Any]:
        params = {
            "deform": jnp.zeros_like(base_mesh.vertices),
            "latlng": jnp.full((256, 512, 3), 0.5),
            "exposure": jnp.zeros((1,)),
            "field": self.field.init(key),
        }
        if self.smooth_type != "jitter":
            f = base_mesh.num_faces
            params["kdks"] = jnp.zeros((f * 6, 5))
            params["zs"] = jnp.zeros((f * 6, 1))
        return params

    def initial_guess_bias(self) -> jnp.ndarray:
        return jnp.zeros(2)

    def get_geometry(
        self, params: dict, base_mesh: TriangleMesh
    ) -> tuple[TriangleMesh, jnp.ndarray]:
        mesh = base_mesh.replace(vertices=base_mesh.vertices + params["deform"])
        reg = (
            uniform_laplacian_smoothing(mesh) * 1e-3
            + mesh_normal_consistency(mesh) * 3e-4
            + mesh_edge_loss(mesh) * 0.1
            + (params["deform"] ** 2).sum(-1).mean() * 0.1
        )
        return mesh, reg

    def get_background(self, key, training: bool) -> jnp.ndarray:
        if self.background_color == "black":
            return jnp.zeros(3)
        if self.background_color == "white":
            return jnp.ones(3)
        if training and key is not None:
            return jax.random.uniform(key, (3,))
        return jnp.array([0.1490, 0.1647, 0.2157])

    def render(
        self,
        params: dict,
        base_mesh: TriangleMesh,
        cameras: Cameras,
        key: jax.Array,
        *,
        reg_weights: dict | None = None,
        kd_perturb_std: float = 0.01,
        ks_perturb_std: float = 0.01,
        tone_type: str = "naive",
        shade_keys: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
        w = {"occ": 0.0, "light": 0.0, "kd_grad": 0.0, "ks_grad": 0.0}
        if reg_weights:
            w.update(reg_weights)
        mesh, reg = self.get_geometry(params, base_mesh)
        k_field, k_shade = jax.random.split(key)

        if self.smooth_type == "jitter":
            splats, attrs, offsets, valid = get_gaussians_from_face(
                self.field, params["field"], mesh,
                scale=self.scale,
                initial_guess=self.initial_guess_bias(),
                kd_perturb_std=kd_perturb_std,
                ks_perturb_std=ks_perturb_std,
                key=k_field,
                max_faces=self.max_render_faces,
                eval_chunk=self.field_eval_chunk,
            )
        else:
            splats, offsets, valid = MGAdapter().make(mesh)
            offsets = offsets * jax.nn.sigmoid(params["zs"])
            splats = splats.replace(means=splats.means - offsets)
            attrs = RenderableAttrs(
                kd=jax.nn.sigmoid(params["kdks"][:, :3]),
                ks=jax.nn.sigmoid(
                    params["kdks"][:, 3:] + self.initial_guess_bias()
                ),
                normals=splats.colors,
            )
        if attrs.kd_jitter is not None:
            reg = reg + w["kd_grad"] * jnp.abs(attrs.kd_jitter - attrs.kd).mean()
        if attrs.ks_jitter is not None:
            reg = reg + w["ks_grad"] * jnp.abs(attrs.ks_jitter - attrs.ks).mean()
        if attrs.occ is not None:
            reg = reg + w["occ"] * jnp.abs(attrs.occ).mean()

        light = es.compute_light_pdf(params["latlng"])
        exposure = jnp.exp(params["exposure"][0])
        mc_positions = splats.means + offsets

        vis_fn = None
        if self.shadow_scale > 0:
            # BVH-free mesh shadows: occupancy-grid transmittance marching
            # (replaces kernel.cu shadow_test for mesh-only scenes)
            k_shade, k_vox = jax.random.split(k_shade)
            vis_fn = make_mesh_visibility(
                mesh, k_vox, resolution=self.visibility_resolution,
                scale=self.scale * 1.05,
            )

        @jax.checkpoint
        def render_one(args):
            cam, sk = args
            camera_pos = cam.c2w[:, 3]
            camera_lookat = -cam.c2w[:, 2]
            bend = jnp.sum(
                jax.lax.stop_gradient(attrs.normals) * camera_lookat, -1, keepdims=True
            ) > 1e-3
            frag_n = jnp.where(bend, -attrs.normals, attrs.normals)
            roughness = attrs.ks[:, 0:1] * (1 - self.min_roughness) + self.min_roughness
            metallic = attrs.ks[:, 1:2] * self.max_metallic
            arm = jnp.concatenate((jnp.zeros_like(roughness), roughness, metallic), -1)
            diff, spec, resi = es.env_shade(
                sk, mc_positions, frag_n, camera_pos, attrs.kd, arm, light,
                num_samples_x=self.num_samples_x,
                visibility_fn=vis_fn,
                shadow_scale=self.shadow_scale,
            )
            diff = jnp.maximum(diff, 1e-4)
            spec = jnp.maximum(spec, 1e-4)
            if self.denoise:
                frag_depth = jnp.sum(
                    (mc_positions - camera_pos) * camera_lookat, -1, keepdims=True
                )
                diff = bilateral_denoise(diff[None], frag_n[None], frag_depth[None], sigma=2.0)[0]
                spec = bilateral_denoise(spec[None], frag_n[None], frag_depth[None], sigma=2.0)[0]
            if attrs.occ is not None:
                residual_light = jax.nn.sigmoid(attrs.occ - 3.0)
                resi_c = jnp.clip(resi, 0, 1)
                diff = diff + resi_c[:, 0:1] * residual_light[:, :3]
                spec = spec + resi_c[:, 1:2] * residual_light[:, 3:]
            colors = diff * (attrs.kd * (1 - metallic)) + spec
            render, alpha, info = rasterize(
                splats.means, gmath.safe_normalize(splats.quats),
                jnp.exp(splats.scales), jax.nn.sigmoid(splats.opacities[:, 0]),
                colors, cam.view_matrix, cam.intrinsic_matrix,
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
            rgb = render[..., :3]
            if tone_type == "naive":
                rgb = tone_naive(rgb, exposure)
            elif tone_type == "aces":
                rgb = tone_aces(rgb, exposure)
            else:
                rgb = rgb * exposure
            return jnp.concatenate((rgb, alpha), -1), info["total_pairs"]

        bsz = cameras.shape[0]
        # explicit per-camera MC keys: the trainer passes GLOBAL-batch keys so
        # the per-camera accum dispatches (and dp shards) match the fused
        # map bit-for-bit (see GeoSplatterMC.render shade_keys)
        keys_b = (
            jax.random.split(k_shade, bsz) if shade_keys is None else shade_keys
        )
        rgba, total_pairs = jax.lax.map(render_one, (cameras, keys_b))
        aux = {
            "num_gaussians": valid.sum(),
            "total_pairs": total_pairs.max(),
            "max_pairs": jnp.asarray(
                min(self.pairs_per_gaussian * splats.means.shape[0], self.pairs_budget or (1 << 62)),
                jnp.int32,
            ),
        }
        return rgba, reg, aux

    def export_model(self, params: dict, base_mesh: TriangleMesh, key: jax.Array) -> dict:
        mesh, _ = self.get_geometry(params, base_mesh)
        splats, attrs, offsets, valid = get_gaussians_from_face(
            self.field, params["field"], mesh,
            scale=self.scale, initial_guess=self.initial_guess_bias(),
        )
        return {
            "geom_scale": self.scale,
            "min_roughness": self.min_roughness,
            "max_metallic": self.max_metallic,
            "exposure": params["exposure"],
            "latlng": params["latlng"],
            "means": splats.means,
            "scales": splats.scales,
            "quats": splats.quats,
            "opacities": splats.opacities,
            "normals": attrs.normals,
            "kd": attrs.kd,
            "ks": attrs.ks,
            "occ": attrs.occ,
            "ks_enc": export_ks_bundle(self.field, params["field"]),
            "mc_positions": splats.means + offsets,
            "mc_vertices": mesh.vertices,
            "mc_indices": mesh.indices,
            "mc_face_mask": mesh.face_mask,
            "sdf": None,
            "initial_guess": self.initial_guess_bias(),
        }
