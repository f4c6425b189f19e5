"""GeoSplatter stage 1 — FlexiCubes -> MGAdapter Gaussians -> split-sum PBR.

Parity targets in ``rfstudio/model/geosplat.py``:
- ``MGAdapter`` (:379-472): 2 concentric rings x 3 edge-midpoint anisotropic
  flat Gaussians per face, quats from the tangent frame, interpolated vertex
  normals as per-Gaussian normals, sqrt(area) normal offsets.
- ``GaussianField`` (:483-674): hash-encoded kd (sigmoid MLP), ks (+initial
  guess bias, sigmoid), z offsets, optional occ; face- and vertex-sampling
  modes; jittered re-evaluation for smoothness regularization.
- ``RenderableAttrs.splat`` (:44-132): split-sum GGX shading per Gaussian
  (FG LUT, prefiltered env sampling, metallic/roughness remap), optional
  back-face culling, naive/ACES tone mapping.
- ``GeoSplatter`` (:678-942): parameters (sdf/deform/alpha-beta-gamma
  weights/cubemap/exposure), get_geometry regularizers, white-balance light
  reg, render_report with jitter smoothness regs.

TPU-first: the model is a frozen config + a params pytree; everything below
is shape-static (padded mesh -> fixed 6*F Gaussians with masked opacities)
so one jitted train step covers the whole stage.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graphics import flexicubes as fc
from ..graphics import gmath
from ..graphics.cameras import Cameras
from ..graphics.mesh import TriangleMesh
from ..graphics.splats import Splats
from ..ops import cubemap as cm
from ..ops.hashgrid import HashGridConfig, hashgrid_encode
from ..ops.rasterize import rasterize, rasterize_batched
from .encodings import TriplaneEncoding
from .mlp import MLPConfig


# --- tone mapping (geosplat.py:474-480) ---------------------------------------


def tone_naive(rgb: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    x = rgb * exposure
    return 1.0 - jax.nn.softplus((1.0 - x) * 100.0) / 100.0


def tone_aces(rgb: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    x = rgb * exposure
    return (x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14)


# --- MGAdapter (geosplat.py:379-472) --------------------------------------------


@dataclasses.dataclass(frozen=True)
class MGAdapter:
    scale_ratio1: float = 0.5
    scale_ratio2: float = 1.3
    g_scale_ratio: float = 1.6
    l_scale_ratio1: float = 1 / 3
    l_scale_ratio2: float = 3.0
    bias1: float = -1 / 24
    bias2: float = 0.0

    def bary2gs(self, p0, p1, area, normals, *, max_scale_ratio):
        """Segment (p0, p1) + patch area + face normal -> flat anisotropic
        Gaussian (means/scales/quats); 'colors' carry the shading normal."""
        means = (p0 + p1) / 2
        max_rots = p1 - means
        max_scales = jnp.maximum(
            jnp.sqrt(jnp.sum(max_rots**2, -1, keepdims=True) + 1e-24), 1e-10
        )
        min_scales = area / 4 / max_scales
        max_rots = max_rots / max_scales
        scales = jnp.concatenate(
            (
                jnp.log(self.g_scale_ratio * max_scale_ratio * max_scales),
                jnp.log(jnp.maximum(self.g_scale_ratio / max_scale_ratio * min_scales, 1e-12)),
                jnp.full_like(max_scales, -10.0),
            ),
            axis=-1,
        )
        min_rots = jnp.cross(normals, max_rots)
        rot = jnp.stack((max_rots, min_rots, normals), axis=-1)  # columns
        quats = gmath.rot2quat(rot)
        return means, scales, quats

    def make(
        self, mesh: TriangleMesh
    ) -> tuple[Splats, jnp.ndarray, jnp.ndarray]:
        """Mesh -> 6 Gaussians/face. Returns (splats [6F], offsets [6F, 3],
        valid [6F]); masked faces yield opacity ~0 Gaussians."""
        vn = mesh.vertex_normals()
        idx = mesh.indices
        p0, p1, p2 = (mesh.vertices[idx[:, k]] for k in range(3))
        vn0, vn1, vn2 = (vn[idx[:, k]] for k in range(3))
        fmask = mesh.face_mask_or_ones()

        cross = jnp.cross(p1 - p0, p2 - p0)
        area = jnp.maximum(
            jnp.sqrt(jnp.sum(cross**2, -1, keepdims=True) + 1e-24), 1e-10
        ) / 2
        normals = gmath.safe_normalize(
            jnp.where(fmask[:, None], cross, jnp.array([0.0, 0.0, 1.0]))
        )
        offsets = jax.lax.stop_gradient(normals) * jnp.sqrt(
            jax.lax.stop_gradient(area)
        )

        all_means, all_scales, all_quats, all_normals = [], [], [], []
        for u_coeff, a_coeff, s_ratio in zip(
            (1 / 9 + self.bias1, 2 / 9 + self.bias2),
            (1 / 4 * self.l_scale_ratio1, 1 / 12 * self.l_scale_ratio2),
            (self.scale_ratio1, self.scale_ratio2),
        ):
            u0 = p0 * (1 - 2 * u_coeff) + (p1 + p2) * u_coeff
            u1 = p1 * (1 - 2 * u_coeff) + (p2 + p0) * u_coeff
            u2 = p2 * (1 - 2 * u_coeff) + (p0 + p1) * u_coeff
            n0 = vn0 * (1 - 2 * u_coeff) + (vn1 + vn2) * u_coeff
            n1 = vn1 * (1 - 2 * u_coeff) + (vn2 + vn0) * u_coeff
            n2 = vn2 * (1 - 2 * u_coeff) + (vn0 + vn1) * u_coeff
            a = area * a_coeff
            for (qa, qb), nn in (
                ((u0, u1), (n0 + n1) / 2),
                ((u1, u2), (n1 + n2) / 2),
                ((u2, u0), (n2 + n0) / 2),
            ):
                m, s, q = self.bary2gs(qa, qb, a, normals, max_scale_ratio=s_ratio)
                all_means.append(m)
                all_scales.append(s)
                all_quats.append(q)
                all_normals.append(gmath.safe_normalize(nn))

        means = jnp.concatenate(all_means)
        f = idx.shape[0]
        valid = jnp.tile(fmask, 6)
        op = jnp.where(valid, float(np.log(0.99 / 0.01)), -20.0)[:, None]
        splats = Splats(
            means=means,
            scales=jnp.concatenate(all_scales),
            quats=jnp.concatenate(all_quats),
            colors=jnp.concatenate(all_normals),  # shading normals
            opacities=op,
            shs=jnp.zeros((6 * f, 0, 3)),
        )
        return splats, jnp.tile(offsets, (6, 1)), valid


# --- hash encodings -------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HashEncoding:
    """hashgrid + MLP head (encoding.py:100-241 semantics)."""

    grid: HashGridConfig
    mlp: MLPConfig

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        return {
            "table": self.grid.init(k1),
            "mlp": self.mlp.init(k2, input_dim=self.grid.output_dim),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        feats = hashgrid_encode(params["table"], x, self.grid)
        return self.mlp.apply(params["mlp"], feats)


def _default_enc(out_dim: int, activation: str, hidden: tuple[int, ...]) -> HashEncoding:
    return HashEncoding(
        grid=HashGridConfig(max_res=4096, log2_hashmap_size=18, grad_scaling=16.0),
        mlp=MLPConfig(
            layers=(-1,) + hidden + (out_dim,),
            activation=activation,
            bias=False,
            initialization="kaiming-uniform",
        ),
    )


@dataclasses.dataclass(frozen=True)
class GaussianField:
    """Neural material field (geosplat.py:483-674)."""

    kd_enc: HashEncoding = _default_enc(3, "sigmoid", (32, 32))
    ks_enc: HashEncoding = _default_enc(2, "none", (32,))
    z_enc: HashEncoding = _default_enc(1, "none", (32,))
    occ_enc: HashEncoding | None = None

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 4)
        params = {
            "kd_enc": self.kd_enc.init(ks[0]),
            "ks_enc": self.ks_enc.init(ks[1]),
            "z_enc": self.z_enc.init(ks[2]),
        }
        if self.occ_enc is not None:
            params["occ_enc"] = self.occ_enc.init(ks[3])
        return params


@dataclasses.dataclass(frozen=True)
class SharedField:
    """TPU-fast material field: ONE triplane trunk + small MLP heads.

    The reference's GaussianField uses four independent hash encoders
    (kd/ks/z/occ) — 8 corners x 16 levels x 4 encoders = 512 gathered rows
    per gaussian, which at production gaussian counts costs seconds per step
    on TPU (arbitrary-index gathers run at ~5-9 ns/row). This redesign keeps
    the same attribute heads but shares a single bilinear triplane trunk
    (12 gathered rows per evaluation point) and can evaluate per FACE
    instead of per gaussian (the jitter smoothness regularizer already
    enforces sub-face smoothness, so sharing across a face's 6 gaussians
    loses nothing the optimized field represents). ~100x fewer gathers.
    The hash-encoder field remains available for reference parity.
    """

    trunk: TriplaneEncoding = TriplaneEncoding(
        resolution=512, num_components=32, init_scale=0.03
    )
    hidden: int = 64
    with_occ: bool = False
    per_face: bool = True

    def _head(self, out_dim: int, activation: str) -> MLPConfig:
        return MLPConfig(
            layers=(-1, self.hidden, out_dim),
            activation=activation,
            bias=False,
            initialization="kaiming-uniform",
        )

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 5)
        params = {
            "planes": self.trunk.init(ks[0]),
            "kd": self._head(3, "sigmoid").init(
                ks[1], input_dim=self.trunk.output_dim
            ),
            "ks": self._head(2, "none").init(
                ks[2], input_dim=self.trunk.output_dim
            ),
            "z": self._head(1, "none").init(
                ks[3], input_dim=self.trunk.output_dim
            ),
        }
        if self.with_occ:
            params["occ"] = self._head(6, "none").init(
                ks[4], input_dim=self.trunk.output_dim
            )
        return params

    def apply_all(
        self, params: dict, x: jnp.ndarray, x_jitter: jnp.ndarray | None = None
    ) -> dict:
        """Evaluate every head. ``x`` [P, 3] in [-1, 1]. The z head uses a
        position-stop-gradient twin of the trunk (XLA CSE merges the
        duplicated gathers, only the lerp-weight backward differs)."""
        feats = self.trunk.apply(params["planes"], x)
        feats_sg = self.trunk.apply(params["planes"], jax.lax.stop_gradient(x))
        h = self._head(3, "sigmoid")
        out = {
            "kd": h.apply(params["kd"], feats),
            "ks_raw": self._head(2, "none").apply(params["ks"], feats),
            "z_raw": self._head(1, "none").apply(params["z"], feats_sg),
            "occ_raw": (
                self._head(6, "none").apply(params["occ"], feats)
                if self.with_occ else None
            ),
        }
        if x_jitter is not None:
            feats_j = self.trunk.apply(params["planes"], x_jitter)
            out["kd_jitter"] = h.apply(params["kd"], feats_j)
            out["ks_jitter_raw"] = self._head(2, "none").apply(
                params["ks"], feats_j
            )
        return out


def evaluate_field(field, field_params: dict, x: jnp.ndarray) -> dict:
    """Evaluate every material head at positions ``x`` for either field
    implementation. Returns kd (activated), ks_raw, z_raw, occ_raw."""
    if isinstance(field, SharedField):
        return field.apply_all(field_params, x)
    return {
        "kd": field.kd_enc.apply(field_params["kd_enc"], x),
        "ks_raw": field.ks_enc.apply(field_params["ks_enc"], x),
        "z_raw": field.z_enc.apply(
            field_params["z_enc"], jax.lax.stop_gradient(x)
        ),
        "occ_raw": (
            field.occ_enc.apply(field_params["occ_enc"], x)
            if field.occ_enc is not None else None
        ),
    }


def field_group_names(field) -> tuple:
    """Optimizer group names for a field WITHOUT materializing its params
    (trainer __init__ only needs the names)."""
    if isinstance(field, SharedField):
        return ("kd", "ks", "z", "planes") + (("occ",) if field.with_occ else ())
    return ("kd", "ks", "z") + (("occ",) if field.occ_enc is not None else ())


def field_to_groups(field_params: dict) -> dict:
    """Field params -> optimizer groups (kd/ks/z[/occ][/planes]) for either
    field layout — keeps the reference's per-attribute LR structure
    (geosplat_trainer.py:82-139) working across implementations."""
    fp = field_params
    if "kd_enc" in fp:
        g = {"kd": fp["kd_enc"], "ks": fp["ks_enc"], "z": fp["z_enc"]}
        if "occ_enc" in fp:
            g["occ"] = fp["occ_enc"]
        return g
    g = {"kd": fp["kd"], "ks": fp["ks"], "z": fp["z"], "planes": fp["planes"]}
    if "occ" in fp:
        g["occ"] = fp["occ"]
    return g


def field_from_groups(groups: dict, template: dict) -> dict:
    """Inverse of field_to_groups (``template`` fixes the layout)."""
    if "kd_enc" in template:
        fp = {
            "kd_enc": groups["kd"], "ks_enc": groups["ks"],
            "z_enc": groups["z"],
        }
        if "occ_enc" in template:
            fp["occ_enc"] = groups["occ"]
        return fp
    fp = {
        "kd": groups["kd"], "ks": groups["ks"], "z": groups["z"],
        "planes": groups["planes"],
    }
    if "occ" in template:
        fp["occ"] = groups["occ"]
    return fp


def apply_ks_bundle(bundle: dict, x: jnp.ndarray, hash_enc) -> jnp.ndarray:
    """Apply an exported roughness-predictor bundle (either field layout) at
    positions ``x``; stage 3 consumes this (geosplat_defer.py:42-52)."""
    if "planes" in bundle:
        planes = bundle["planes"]
        trunk = TriplaneEncoding(
            resolution=planes.shape[1], num_components=planes.shape[-1]
        )
        head = MLPConfig(
            layers=(-1, 64, 2), activation="none", bias=False,
            initialization="kaiming-uniform",
        )
        return head.apply(bundle["ks"], trunk.apply(planes, x))
    return hash_enc.apply(bundle, x)


def export_ks_bundle(field, field_params: dict) -> dict:
    """The stage-1 -> stage-2/3 roughness-predictor hand-off payload
    (geosplat.py:839-854 exports ks_encoder). For the shared field this is
    the trunk planes + the ks head."""
    if isinstance(field, SharedField):
        return {"planes": field_params["planes"], "ks": field_params["ks"]}
    return field_params["ks_enc"]


class RenderableAttrs(NamedTuple):
    """Per-Gaussian shading inputs (geosplat.py:44-51)."""

    kd: jnp.ndarray                 # [N, 3]
    ks: jnp.ndarray                 # [N, 2] (roughness, metallic) pre-remap
    normals: jnp.ndarray            # [N, 3]
    occ: jnp.ndarray | None = None  # [N, 6]
    kd_jitter: jnp.ndarray | None = None
    ks_jitter: jnp.ndarray | None = None


def compact_faces(mesh: TriangleMesh, max_faces: int) -> TriangleMesh:
    """Gather valid faces into a tighter static budget. The TPU analog of the
    reference's gaussian memory tiers (geosplat.py:687-703): the DMC face
    buffer is worst-case sized, but everything downstream (field evals,
    rasterization) should scale with a configurable cap, not the worst case.
    Overflow drops faces beyond the cap (observable: count valid vs cap)."""
    f = mesh.num_faces
    if max_faces >= f:
        return mesh
    mask = mesh.face_mask_or_ones()
    idx = jnp.nonzero(mask, size=max_faces, fill_value=f)[0]
    indices = jnp.concatenate(
        [mesh.indices, jnp.zeros((1, 3), mesh.indices.dtype)]
    )[idx]
    return mesh.replace(indices=indices, face_mask=idx < f)


def get_gaussians_from_face(
    field: GaussianField,
    field_params: dict,
    mesh: TriangleMesh,
    *,
    scale: float,
    initial_guess: jnp.ndarray,        # [2]
    kd_perturb_std: float = 0.0,
    ks_perturb_std: float = 0.0,
    key: jax.Array | None = None,
    max_faces: int | None = None,
    eval_chunk: int | None = 262144,
) -> tuple[Splats, RenderableAttrs, jnp.ndarray, jnp.ndarray]:
    """(splats, attrs, offsets, valid): geosplat.py:622-674."""
    if max_faces is not None:
        mesh = compact_faces(mesh, max_faces)
    splats, offsets, valid = MGAdapter().make(mesh)
    means = jnp.clip(splats.means / scale, -1, 1)

    if isinstance(field, SharedField):
        return _shared_field_gaussians(
            field, field_params, mesh, splats, offsets, valid, means,
            scale=scale, initial_guess=initial_guess,
            kd_perturb_std=kd_perturb_std, ks_perturb_std=ks_perturb_std,
            key=key,
        )

    # gradient-checkpointed + chunked encodings: hashgrid gather residuals
    # dominate memory at large gaussian counts (the reference's
    # use_checkpoint tier + batchify, geosplat.py:697-703); the sequential
    # lax.map bounds backward peak memory to one chunk of corner buffers
    def ckpt(enc, p, x):
        n = x.shape[0]
        inner = jax.checkpoint(lambda pp, xx: enc.apply(pp, xx))
        if eval_chunk is None or n <= eval_chunk:
            return inner(p, x)
        pad = (-n) % eval_chunk
        xp = jnp.concatenate([x, jnp.zeros((pad, x.shape[-1]), x.dtype)])
        out = jax.lax.map(
            lambda xx: inner(p, xx), xp.reshape(-1, eval_chunk, x.shape[-1])
        )
        return out.reshape(n + pad, -1)[:n]

    zs = jax.nn.sigmoid(
        ckpt(field.z_enc, field_params["z_enc"], jax.lax.stop_gradient(means))
    )
    offsets = offsets * zs
    shifted = splats.means - offsets

    kd_jitter = ks_jitter = None
    if kd_perturb_std > 0 and key is not None:
        k1, k2 = jax.random.split(key)
        pk = jax.random.normal(k1, means.shape) * kd_perturb_std
        kd_jitter = ckpt(
            field.kd_enc, field_params["kd_enc"], jnp.clip(means + pk, -1, 1)
        )
        if ks_perturb_std > 0:
            ps = jax.random.normal(k2, means.shape) * ks_perturb_std
            ks_jitter = jax.nn.sigmoid(
                ckpt(field.ks_enc, field_params["ks_enc"], jnp.clip(means + ps, -1, 1))
                + initial_guess
            )

    attrs = RenderableAttrs(
        kd=ckpt(field.kd_enc, field_params["kd_enc"], means),
        ks=jax.nn.sigmoid(
            ckpt(field.ks_enc, field_params["ks_enc"], means) + initial_guess
        ),
        normals=splats.colors,
        occ=(
            ckpt(field.occ_enc, field_params["occ_enc"], means)
            if field.occ_enc is not None
            else None
        ),
        kd_jitter=kd_jitter,
        ks_jitter=ks_jitter,
    )
    return splats.replace(means=shifted), attrs, offsets, valid


def _shared_field_gaussians(
    field: SharedField, field_params, mesh, splats, offsets, valid, means,
    *, scale, initial_guess, kd_perturb_std, ks_perturb_std, key,
):
    """SharedField evaluation path: one trunk, per-face granularity option.
    One shared jitter position serves both smoothness regularizers (std =
    kd_perturb_std, falling back to ks_perturb_std when only ks jitters) —
    a second trunk evaluation per attribute is not worth the gathers."""
    if field.per_face:
        centroids = mesh.face_vertices().mean(1)       # [F, 3]
        pts = jnp.clip(centroids / scale, -1, 1)
        expand = lambda v: jnp.tile(v, (6, 1))  # noqa: E731
    else:
        pts = means
        expand = lambda v: v  # noqa: E731

    x_jitter = None
    jit_std = kd_perturb_std if kd_perturb_std > 0 else ks_perturb_std
    if jit_std > 0 and key is not None:
        noise = jax.random.normal(key, pts.shape) * jit_std
        x_jitter = jnp.clip(pts + noise, -1, 1)

    res = field.apply_all(field_params, pts, x_jitter)
    zs = jax.nn.sigmoid(expand(res["z_raw"]))
    offsets = offsets * zs
    attrs = RenderableAttrs(
        kd=expand(res["kd"]),
        ks=jax.nn.sigmoid(expand(res["ks_raw"]) + initial_guess),
        normals=splats.colors,
        occ=expand(res["occ_raw"]) if res["occ_raw"] is not None else None,
        kd_jitter=(
            expand(res["kd_jitter"])
            if "kd_jitter" in res and kd_perturb_std > 0 else None
        ),
        ks_jitter=(
            jax.nn.sigmoid(expand(res["ks_jitter_raw"]) + initial_guess)
            if "ks_jitter_raw" in res and ks_perturb_std > 0 else None
        ),
    )
    return splats.replace(means=splats.means - offsets), attrs, offsets, valid


def get_gaussians_from_vertex(
    field: GaussianField,
    field_params: dict,
    mesh: TriangleMesh,
    *,
    scale: float,
    initial_guess: jnp.ndarray,
) -> tuple[Splats, RenderableAttrs, jnp.ndarray]:
    """Vertex-area Gaussians for the warmup phase (geosplat.py:520-620).
    Returns (splats, attrs, valid)."""
    vn = mesh.vertex_normals()
    idx = mesh.indices
    fmask = mesh.face_mask_or_ones()
    fv = mesh.face_vertices()
    weighted_fn = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    weighted_fn = jnp.where(fmask[:, None], weighted_fn, 0.0)
    # vertex area = sum over faces of (face_normal . vertex_normal) / 6
    products = jnp.sum(
        weighted_fn[:, None, :] * vn[idx], axis=-1
    )  # [F, 3]
    vertex_areas = jnp.zeros((mesh.num_vertices,))
    for k in range(3):
        vertex_areas = vertex_areas.at[idx[:, k]].add(
            jnp.where(fmask, products[:, k], 0.0)
        )
    valid = vertex_areas > 1e-10
    areas = jnp.maximum(vertex_areas, 1e-10)[:, None] / 6.0
    # padded vertices have zero normals; give them a unit default so the
    # shading backward stays bounded (their opacity is zeroed anyway)
    vn = jnp.where(valid[:, None], vn, jnp.array([0.0, 0.0, 1.0]))

    log_sqrt_areas = jnp.log(areas / 2.5) * 0.5
    enc_in = jnp.clip(mesh.vertices / scale, -1, 1)
    heads = evaluate_field(field, field_params, enc_in)
    zs = jax.nn.sigmoid(heads["z_raw"])
    z_off = jnp.exp(jax.lax.stop_gradient(log_sqrt_areas)) * zs
    positions = mesh.vertices - vn * z_off

    base_rot = gmath.rotation_from_relative_vectors(
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), vn.shape),
        jax.lax.stop_gradient(vn),
    )
    scales = jnp.concatenate(
        (log_sqrt_areas, log_sqrt_areas, jnp.full_like(log_sqrt_areas, -23.0)),
        axis=-1,
    )
    attrs = RenderableAttrs(
        kd=heads["kd"],
        ks=jax.nn.sigmoid(heads["ks_raw"] + initial_guess),
        normals=vn,
        occ=heads["occ_raw"],
    )
    v = positions.shape[0]
    op = jnp.where(valid, float(np.log(0.99 / 0.01)), -20.0)[:, None]
    splats = Splats(
        means=positions,
        scales=scales,
        quats=gmath.rot2quat(base_rot),
        colors=vn,
        opacities=op,
        shs=jnp.zeros((v, 0, 3)),
    )
    return splats, attrs, valid


def shade_colors_splitsum(
    splats: Splats,
    attrs: RenderableAttrs,
    camera_pos: jnp.ndarray,           # [3]
    *,
    env_base: jnp.ndarray,
    env_mips: list[jnp.ndarray],
    min_roughness: float,
    max_metallic: float,
    mode: str = "pbr",
    culling: bool = False,
    env_quality: str = "fast",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-Gaussian split-sum GGX radiance (the shading half of
    RenderableAttrs.splat, geosplat.py:53-132). Returns (colors [N, 3],
    opacities [N]); camera enters only through its position, so a camera
    batch is a plain vmap over ``camera_pos``."""
    wo = gmath.safe_normalize(camera_pos - splats.means)
    opacities = jax.nn.sigmoid(splats.opacities[:, 0])
    if culling:
        front = jnp.sum(attrs.normals * wo, -1) > 0.0
        opacities = jnp.where(jax.lax.stop_gradient(front), opacities, 0.0)

    roughness = attrs.ks[:, 0:1] * (1 - min_roughness) + min_roughness
    metallic = attrs.ks[:, 1:2] * max_metallic
    specular = (1.0 - metallic) * 0.04 + attrs.kd * metallic
    diffuse = attrs.kd * (1.0 - metallic)

    n_dot_v = jnp.clip(jnp.sum(attrs.normals * wo, -1, keepdims=True), 1e-6, None)
    fast = env_quality == "fast"
    fg = (
        cm.fg_analytic(n_dot_v, roughness) if fast
        else cm.sample_fg_lut(n_dot_v, roughness)
    )  # [N, 2]
    inv_wi = 2.0 * jnp.sum(wo * attrs.normals, -1, keepdims=True) * attrs.normals - wo
    l_diff, l_spec = cm.sample_splitsum(
        env_base, env_mips, attrs.normals, inv_wi, roughness,
        with_diffuse=(mode == "diffuse") or not fast,
        filter_mode="nearest" if fast else "bilinear",
        mip_filter="nearest" if fast else "trilinear",
    )
    reflectance = specular * fg[:, 0:1] + fg[:, 1:2]
    if mode == "pbr":
        colors = diffuse + l_spec * reflectance
    elif mode == "diffuse":
        colors = l_diff * diffuse
    elif mode == "specular":
        colors = l_spec * reflectance
    else:
        raise ValueError(mode)
    return colors, opacities


def shade_splitsum(
    splats: Splats,
    attrs: RenderableAttrs,
    camera: Cameras,
    *,
    exposure: jnp.ndarray,             # []
    env_base: jnp.ndarray,
    env_mips: list[jnp.ndarray],
    min_roughness: float,
    max_metallic: float,
    mode: str = "pbr",
    tone_type: str = "naive",
    culling: bool = False,
    tile_capacity: int = 1024,
    pairs_per_gaussian: int = 6,
    pairs_budget: int | None = None,
    chunk_size: int = 128,
    tile_chunk: int = 8,
    tile_shape: str = "16",
    backend: str = "auto",
    env_quality: str = "fast",   # 'fast' (nearest env + analytic FG) | 'exact'
    checkpoint_shading: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """RenderableAttrs.splat (geosplat.py:53-132): per-Gaussian split-sum GGX
    radiance, antialiased rasterization, tone mapping.

    Returns ([H, W, 4] rgba, pair-budget info {total_pairs, max_pairs}) —
    the info lets trainers observe silent pair truncation (rasterize drops
    pairs beyond max_pairs = pairs_per_gaussian * N).

    ``checkpoint_shading`` rematerializes only the per-Gaussian shading
    (cheap: one env gather + arithmetic) in the backward while the
    rasterizer's custom-vjp residuals stay saved — recomputing the whole
    rasterizer forward per camera (binning sorts + composite kernel) costs
    far more than storing its ~100 MB of residuals."""

    def shade(splats, attrs, env_base, env_mips, exposure):
        return shade_colors_splitsum(
            splats, attrs, camera.c2w[:, 3],
            env_base=env_base, env_mips=env_mips,
            min_roughness=min_roughness, max_metallic=max_metallic,
            mode=mode, culling=culling, env_quality=env_quality,
        )

    if checkpoint_shading:
        shade = jax.checkpoint(shade)
    colors, opacities = shade(splats, attrs, env_base, env_mips, exposure)

    render, alpha, info = rasterize(
        splats.means,
        gmath.safe_normalize(splats.quats),
        jnp.exp(splats.scales),
        opacities,
        colors,
        camera.view_matrix,
        camera.intrinsic_matrix,
        camera.width,
        camera.height,
        rasterize_mode="antialiased",
        tile_capacity=tile_capacity,
        pairs_per_gaussian=pairs_per_gaussian,
        max_pairs_override=pairs_budget,
        chunk_size=chunk_size,
        tile_chunk=tile_chunk,
        tile_size=tile_shape,
        backend=backend,
    )
    rgb = render[..., :3]
    if tone_type == "naive":
        rgb = tone_naive(rgb, exposure)
    elif tone_type == "aces":
        rgb = tone_aces(rgb, exposure)
    elif tone_type != "none":
        raise ValueError(tone_type)
    if tone_type == "none":
        rgb = rgb * exposure
    pair_info = {
        "total_pairs": info["total_pairs"],
        "max_pairs": jnp.asarray(info["max_pairs"], jnp.int32),
    }
    return jnp.concatenate((rgb, alpha), axis=-1), pair_info


# --- GeoSplatter (stage-1 model) -------------------------------------------------

_INITIAL_GUESS = {
    "outdoor": (0.0, 0.0),
    "diffuse": (0.0, -3.0),
    "hybrid": (-3.0, -3.0),
    "specular": (-3.0, 0.0),
    "glossy": (-3.0, 0.0),
}


@dataclasses.dataclass(frozen=True)
class GeoSplatter:
    background_color: str = "random"
    resolution: int = 32
    light_resolution: int = 512
    field: Any = SharedField()
    scale: float = 1.05
    min_roughness: float = 0.1
    max_metallic: float = 1.0
    initial_guess: str = "hybrid"
    smooth_type: str = "jitter"
    surf_cube_budget: float = 8.0
    surf_edge_budget: float = 8.0
    tile_capacity: int = 1024
    # memory tiers (the reference's geosplat.py:687-703 analog): cap the
    # faces that reach field-eval/rasterization, chunk the field evals, and
    # budget screen pairs tightly (mesh-anchored gaussians are small)
    max_render_faces: int = 1 << 18
    field_eval_chunk: int = 262144
    pairs_per_gaussian: int = 3
    pairs_budget: int | None = None   # absolute screen-pair cap (see pair_fill)
    remat_mode: str = "shading"       # 'shading' (fast) | 'full' (low-memory)
    chunk_size: int = 128             # pair-kernel chunk rows (tight-bounds binning re-flipped 256->128: BASELINE.md round-3 table)
    # pairs-kernel tile shape "WxH" ("16" = square). 16x8 puts 128 px — one
    # f32 lane register — per tile: ~half the [KC, P] VPU work per pair for
    # the small mesh-anchored gaussians (BASELINE.md round-4 A/B). The CPU
    # reference backend squares this silently (tiling is not semantics).
    tile_shape: str = "16"
    tile_chunk: int = 8
    env_num_samples: int = 64
    prefilter_method: str = "conv"   # 'conv' (fast, training) | 'sampled'
    env_quality: str = "fast"        # 'fast' (training) | 'exact'
    backend: str = "auto"
    # vmap the gradient-free binning front-end (projection + pair sorts)
    # over the whole camera batch instead of re-sorting per camera inside
    # the scan — batched TPU sorts cost about the same as one unbatched
    # sort. Pairs backend only.
    batched_binning: bool = False

    def make_grid(self) -> fc.FlexiCubesGrid:
        return fc.make_grid(
            self.resolution,
            scale=self.scale,
            surf_cube_budget=self.surf_cube_budget,
            surf_edge_budget=self.surf_edge_budget,
        )

    def init(self, key: jax.Array) -> dict[str, Any]:
        grid = self.make_grid()
        k1, k2 = jax.random.split(key)
        return {
            "sdf": jax.random.uniform(k1, (grid.num_vertices,)) - 0.1,
            "deform": jnp.zeros((grid.num_vertices, 3)),
            "weights": jnp.zeros((grid.num_cubes, 21)),
            "cubemap": jnp.full(
                (6, self.light_resolution, self.light_resolution, 3), 0.5
            ),
            "exposure": jnp.zeros((1,)),
            "field": self.field.init(k2),
        }

    def initial_guess_bias(self) -> jnp.ndarray:
        return jnp.asarray(_INITIAL_GUESS[self.initial_guess])

    # --- stage pieces (geosplat.py:751-785) ---------------------------------
    def get_geometry(self, params: dict, sdf_weight: float = 0.0) -> tuple[
        TriangleMesh, jnp.ndarray, fc.ExtractedMesh
    ]:
        grid = self.make_grid()
        out = fc.extract(
            grid,
            params["sdf"],
            params["deform"],
            alpha=params["weights"][:, :8],
            beta=params["weights"][:, 8:20],
            gamma=params["weights"][:, 20:],
        )
        reg = out.l_dev * 0.5 + jnp.abs(params["weights"][:, :20]).mean() * 0.1
        if sdf_weight > 0:
            reg = reg + fc.sdf_entropy(grid, params["sdf"]) * sdf_weight
        return out.mesh, reg, out

    def get_envmap(
        self, params: dict, method: str | None = None
    ) -> tuple[jnp.ndarray, list, jnp.ndarray]:
        cubemap = params["cubemap"]
        white = cubemap.mean(-1, keepdims=True)
        white_balance_reg = jnp.abs(cubemap - white).mean()
        base, mips = cm.prefilter_splitsum(
            cubemap, num_samples=self.env_num_samples,
            method=method or self.prefilter_method,
        )
        return base, mips, white_balance_reg

    def get_background(self, key: jax.Array | None, training: bool) -> jnp.ndarray:
        if self.background_color == "black":
            return jnp.zeros(3)
        if self.background_color == "white":
            return jnp.ones(3)
        if training and key is not None:
            return jax.random.uniform(key, (3,))
        return jnp.array([0.1490, 0.1647, 0.2157])

    # --- full differentiable forward over a camera batch ---------------------
    def render(
        self,
        params: dict,
        cameras: Cameras,               # batched [B]
        key: jax.Array,
        *,
        reg_weights: dict | None = None,  # traced scalars: sdf/occ/light/kd_grad/ks_grad
        kd_perturb_std: float = 0.01,     # static (only gates extra encodings)
        ks_perturb_std: float = 0.01,
        sampling: str = "face",
        quality: str | None = None,       # override env_quality ('exact' for eval)
    ) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
        """Returns (rgba [B, H, W, 4] tone-mapped linear, regularization, aux).

        ``reg_weights`` are traced so the per-step linear schedules
        (geosplat_trainer.py:224-259) don't trigger recompiles."""
        w = {"sdf": 0.0, "occ": 0.0, "light": 0.0, "kd_grad": 0.0, "ks_grad": 0.0}
        if reg_weights:
            w.update(reg_weights)
        grid = self.make_grid()
        mesh, reg, extracted = self.get_geometry(params)
        reg = reg + fc.sdf_entropy(grid, params["sdf"]) * w["sdf"]

        k_field, _ = jax.random.split(key)
        use_jitter = self.smooth_type == "jitter"
        num_faces_valid = mesh.face_mask_or_ones().sum().astype(jnp.int32)
        if sampling == "face":
            splats, attrs, _, valid = get_gaussians_from_face(
                self.field,
                params["field"],
                mesh,
                scale=self.scale,
                initial_guess=self.initial_guess_bias(),
                kd_perturb_std=kd_perturb_std if use_jitter else 0.0,
                ks_perturb_std=ks_perturb_std if use_jitter else 0.0,
                key=k_field,
                max_faces=self.max_render_faces,
                eval_chunk=self.field_eval_chunk,
            )
        elif sampling == "vertex":
            splats, attrs, valid = get_gaussians_from_vertex(
                self.field,
                params["field"],
                mesh,
                scale=self.scale,
                initial_guess=self.initial_guess_bias(),
            )
        else:
            raise ValueError(sampling)
        # eval/export renders take the exact prefilter + differentiable env
        # sampling automatically (quality='exact'); training keeps the fast
        # path (ADVICE r1: don't rely on callers to override)
        base, mips, light_reg = self.get_envmap(
            params, method="sampled" if quality == "exact" else None
        )
        exposure = jnp.exp(params["exposure"][0])

        if attrs.kd_jitter is not None:
            reg = reg + w["kd_grad"] * jnp.abs(attrs.kd_jitter - attrs.kd).mean()
        if attrs.ks_jitter is not None:
            reg = reg + w["ks_grad"] * jnp.abs(attrs.ks_jitter - attrs.ks).mean()
        if attrs.occ is not None:
            reg = reg + w["occ"] * jnp.abs(attrs.occ).mean()
        reg = reg + light_reg * w["light"]

        # remat policy: the per-camera [B, N, ...] shading residuals (massive
        # lane padding for trailing dim 3) must NOT be saved across the
        # camera scan — but the rasterizer's custom-vjp residuals should be:
        # re-running binning sorts + the composite kernel per camera in the
        # backward costs ~2x the whole rasterizer ('shading' mode saves them
        # and rematerializes only the cheap shading; 'full' is the fallback
        # if residual memory is tight)
        if self.batched_binning:
            attrs2 = attrs._replace(kd_jitter=None, ks_jitter=None)
            env_q = quality or self.env_quality

            def shade_b(splats, attrs, env_base, env_mips):
                return jax.vmap(
                    lambda cp: shade_colors_splitsum(
                        splats, attrs, cp,
                        env_base=env_base, env_mips=env_mips,
                        min_roughness=self.min_roughness,
                        max_metallic=self.max_metallic,
                        env_quality=env_q,
                    )
                )(cameras.c2w[:, :, 3])

            if self.remat_mode == "shading":
                shade_b = jax.checkpoint(shade_b)
            colors_b, opac_b = shade_b(splats, attrs2, base, mips)
            render_b, alpha_b, info = rasterize_batched(
                splats.means,
                gmath.safe_normalize(splats.quats),
                jnp.exp(splats.scales),
                opac_b,
                colors_b,
                cameras.view_matrix,
                cameras.intrinsic_matrix,
                cameras.width,
                cameras.height,
                rasterize_mode="antialiased",
                pairs_per_gaussian=self.pairs_per_gaussian,
                max_pairs_override=self.pairs_budget,
                chunk_size=self.chunk_size,
                tile_size=self.tile_shape,
            )
            rgba = jnp.concatenate(
                (tone_naive(render_b, exposure), alpha_b), axis=-1
            )
            aux = {
                "num_gaussians": valid.sum(),
                "num_surf_cubes": extracted.num_surf_cubes,
                "num_surf_edges": extracted.num_surf_edges,
                "num_faces_valid": num_faces_valid,
                "max_render_faces": jnp.asarray(self.max_render_faces, jnp.int32),
                "total_pairs": info["total_pairs"],
                "max_pairs": jnp.asarray(info["max_pairs"], jnp.int32),
            }
            return rgba, reg, aux

        def render_one(cam):
            return shade_splitsum(
                splats,
                attrs._replace(kd_jitter=None, ks_jitter=None),
                cam,
                exposure=exposure,
                env_base=base,
                env_mips=mips,
                min_roughness=self.min_roughness,
                max_metallic=self.max_metallic,
                tile_capacity=self.tile_capacity,
                pairs_per_gaussian=self.pairs_per_gaussian,
                pairs_budget=self.pairs_budget,
                chunk_size=self.chunk_size,
                tile_chunk=self.tile_chunk,
                tile_shape=self.tile_shape,
                backend=self.backend,
                env_quality=quality or self.env_quality,
                checkpoint_shading=self.remat_mode == "shading",
            )

        if self.remat_mode == "full":
            render_one = jax.checkpoint(render_one)

        rgba, pair_info = jax.lax.map(render_one, cameras)
        aux = {
            "num_gaussians": valid.sum(),
            "num_surf_cubes": extracted.num_surf_cubes,
            "num_surf_edges": extracted.num_surf_edges,
            # overflow observables: silent truncation at either cap degrades
            # quality invisibly unless trainers watch these
            "num_faces_valid": num_faces_valid,
            "max_render_faces": jnp.asarray(self.max_render_faces, jnp.int32),
            "total_pairs": pair_info["total_pairs"].max(),
            "max_pairs": pair_info["max_pairs"][0],
        }
        return rgba, reg, aux
