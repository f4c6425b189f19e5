"""Self-contained quality benchmark: a synthetic PBR scene with analytically
known geometry, albedo, roughness and environment lighting.

The reference pipeline is always evaluated on datasets (Synthetic4Relight /
TensoIR, tests/model/test_geosplat_defer.py:407-493) that do not ship in this
image; this module replaces them with a two-sphere scene whose ground truth —
novel views, relit renders under a held-out envmap, albedo and roughness maps
— is rendered analytically (exact ray-sphere intersection + exact binary
shadow rays) through the same MC estimator (`ops.envshade.env_shade`) at high
sample count. The full 3-stage chain then trains on the GT views and is scored
with the same metric path as `engine.eval_tasks` (PSNR / SSIM, albedo scaling).

Scene (everything inside the [-1, 1]^3 reconstruction box):
  - sphere A: center (0, 0, -0.12), r 0.42 — checkered two-tone albedo,
    rough (0.65)
  - sphere B: center (0.28, 0.3, 0.38), r 0.22 — warm constant albedo,
    glossy (0.18)
  - train envmap: ambient + warm key blob + cool rim blob
  - relight envmap: ambient + two blobs from opposite directions
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..graphics import images as gimages
from ..graphics.cameras import Cameras
from ..ops import envshade as es

SPHERE_CENTERS = np.array([[0.0, 0.0, -0.12], [0.28, 0.30, 0.38]], np.float32)
SPHERE_RADII = np.array([0.42, 0.22], np.float32)
ROUGHNESS = np.array([0.65, 0.18], np.float32)
KD_A1 = np.array([0.70, 0.25, 0.20], np.float32)
KD_A2 = np.array([0.20, 0.45, 0.70], np.float32)
KD_B = np.array([0.75, 0.60, 0.25], np.float32)


def _intersect_sphere(origins, dirs, center, radius):
    """Smallest positive t, +inf if missed. origins/dirs [..., 3]."""
    oc = origins - center
    b = jnp.sum(oc * dirs, -1)
    c = jnp.sum(oc * oc, -1) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 1e-4, t0, t1)
    return jnp.where((disc > 0) & (t > 1e-4), t, jnp.inf)


def scene_hit(origins, dirs):
    """(hit, pos, normal, obj) for the closest of the two spheres."""
    ts = jnp.stack(
        [
            _intersect_sphere(origins, dirs, SPHERE_CENTERS[i], SPHERE_RADII[i])
            for i in range(2)
        ],
        -1,
    )
    obj = jnp.argmin(ts, -1)
    t = jnp.min(ts, -1)
    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 2.0)
    pos = origins + dirs * t_safe[..., None]
    center = jnp.asarray(SPHERE_CENTERS)[obj]
    radius = jnp.asarray(SPHERE_RADII)[obj]
    normal = (pos - center) / radius[..., None]
    return hit, pos, normal, obj


def scene_kd(pos, obj):
    """Linear-space albedo at surface points."""
    checker = jnp.sin(9.0 * pos[..., 0]) * jnp.sin(9.0 * pos[..., 1]) * jnp.sin(
        9.0 * pos[..., 2]
    ) > 0
    kd_a = jnp.where(checker[..., None], jnp.asarray(KD_A1), jnp.asarray(KD_A2))
    return jnp.where((obj == 0)[..., None], kd_a, jnp.asarray(KD_B))


def scene_roughness(obj):
    return jnp.asarray(ROUGHNESS)[obj]


def visibility(origins, dirs):
    """Exact binary shadow rays against both spheres ([M] in {0, 1})."""
    blocked = jnp.zeros(origins.shape[:-1], bool)
    for i in range(2):
        t = _intersect_sphere(origins, dirs, SPHERE_CENTERS[i], SPHERE_RADII[i])
        blocked = blocked | jnp.isfinite(t)
    return 1.0 - blocked.astype(jnp.float32)


def _blob(dirs, center_dir, sharpness, color):
    c = jnp.asarray(center_dir, jnp.float32)
    c = c / np.linalg.norm(np.asarray(center_dir))
    cos = jnp.sum(dirs * c, -1, keepdims=True)
    return jnp.asarray(color) * jnp.exp(sharpness * (cos - 1.0))


def make_envmap(h: int = 64, w: int = 128, kind: str = "train") -> jnp.ndarray:
    """Procedural HDR latlng envmap [h, w, 3] (linear radiance)."""
    u = (jnp.arange(w) + 0.5) / w
    v = (jnp.arange(h) + 0.5) / h
    uv = jnp.stack(jnp.meshgrid(u, v, indexing="xy"), -1)
    dirs = es._tc_to_dir(uv)
    if kind == "train":
        env = (
            0.22
            + _blob(dirs, [0.5, 0.8, 0.3], 28.0, [9.0, 7.5, 5.5])
            + _blob(dirs, [-0.7, 0.2, -0.5], 10.0, [0.6, 0.9, 1.5])
        )
    elif kind == "relight":
        env = (
            0.15
            + _blob(dirs, [-0.4, 0.7, 0.55], 32.0, [4.0, 8.0, 10.0])
            + _blob(dirs, [0.8, 0.1, -0.55], 14.0, [2.2, 1.0, 0.5])
        )
    else:
        raise ValueError(kind)
    return jnp.broadcast_to(env, (h, w, 3)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("spp_x", "shadows"))
def _render_gt_one(cam: Cameras, env: jnp.ndarray, key, spp_x: int = 16,
                   shadows: bool = True):
    origins, dirs = cam.generate_rays()        # [H, W, 3]
    h, w = origins.shape[:2]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    hit, pos, normal, obj = scene_hit(o, d)
    kd = scene_kd(pos, obj)
    rough = scene_roughness(obj)
    arm = jnp.stack((jnp.zeros_like(rough), rough, jnp.zeros_like(rough)), -1)
    light = es.compute_light_pdf(env)
    diff, spec, _ = es.env_shade(
        key, pos, normal, cam.c2w[:, 3], kd, arm, light,
        num_samples_x=spp_x,
        visibility_fn=visibility if shadows else None,
        shadow_scale=1.0 if shadows else 0.0,
    )
    rgb = diff * kd + spec                      # metallic = 0
    a = hit.astype(jnp.float32)[..., None]
    srgb = gimages.rgb2srgb(jnp.clip(rgb, 0.0, 1.0)) * a
    return jnp.concatenate((srgb, a), -1).reshape(h, w, 4)


def render_gt_views(cams: Cameras, env: jnp.ndarray, key, spp_x: int = 16,
                    shadows: bool = True) -> jnp.ndarray:
    """[B, H, W, 4] sRGB premultiplied GT views (the dataset analog)."""
    outs = []
    for i in range(cams.shape[0]):
        outs.append(
            _render_gt_one(cams[i], env, jax.random.fold_in(key, i),
                           spp_x, shadows)
        )
    return jnp.stack(outs)


def gt_material_maps(cams: Cameras) -> tuple[jnp.ndarray, jnp.ndarray]:
    """([B, H, W, 4] sRGB albedo, [B, H, W, 2] (roughness, alpha)) GT maps."""
    albedos, roughs = [], []
    for i in range(cams.shape[0]):
        cam = cams[i]
        origins, dirs = cam.generate_rays()
        o = origins.reshape(-1, 3)
        d = dirs.reshape(-1, 3)
        hit, pos, _, obj = scene_hit(o, d)
        a = hit.astype(jnp.float32)[..., None]
        kd = gimages.rgb2srgb(jnp.clip(scene_kd(pos, obj), 0, 1)) * a
        albedos.append(
            jnp.concatenate((kd, a), -1).reshape(origins.shape[:2] + (4,))
        )
        roughs.append(
            jnp.concatenate((scene_roughness(obj)[..., None] * a, a), -1)
            .reshape(origins.shape[:2] + (2,))
        )
    return jnp.stack(albedos), jnp.stack(roughs)


def make_cameras(kind: str, n: int, *, width: int, height: int) -> Cameras:
    if kind == "train":
        lo = Cameras.from_orbit(center=jnp.zeros(3), radius=2.2,
                                elevation_degrees=10.0, num_samples=n - n // 2,
                                width=width, height=height)
        hi = Cameras.from_orbit(center=jnp.zeros(3), radius=2.2,
                                elevation_degrees=42.0, num_samples=n // 2,
                                width=width, height=height)
        return Cameras.cat([lo, hi])
    if kind == "test":
        cams = Cameras.from_orbit(center=jnp.zeros(3), radius=2.2,
                                  elevation_degrees=26.0, num_samples=2 * n,
                                  width=width, height=height)
        # offset phase vs train orbits by taking odd samples
        return cams[jnp.arange(n) * 2 + 1]
    raise ValueError(kind)
