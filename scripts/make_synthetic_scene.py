#!/usr/bin/env python
"""Generate a Synthetic4Relight-layout dataset from the analytic two-sphere
PBR scene (geosplatting_tpu/bench/quality.py) so the product CLI chain —
`./eval.sh hotdog data/Synthetic4Relight/twosphere` — runs end-to-end
without any external download (VERDICT r3 #6 dress rehearsal).

Layout written (parity: Syn4RelightDataparser / reference
syn4relight_dataparser.py:20-137):
  <out>/transforms_{train,test}.json        stored-space c2w + camera_angle_x
  <out>/train/r_i_rgb.hdr + r_i_mask.png    LINEAR HDR frames + masks
  <out>/test/r_i_rgba.png                   sRGB premultiplied NVS GT
  <out>/test/r_i_albedo.png, r_i_rough.png  material GT
  <out>/test_rli/envmap6_r_i.png, envmap12_r_i.png   relit GT
  <out>/../envmap6.hdr, envmap12.hdr        GT light probes (latlng linear;
                                            .hdr because this image has no
                                            EXR plugin — the parser accepts
                                            either suffix)

The stored JSON uses the INVERSE of the parser's axis swap + 2/3 scale: we
write an orbit, parse it back through the real Dataset, and render GT from
the PARSED cameras — guaranteeing pixel-consistency with what the trainer
will see, exactly like tests/test_engine_tasks.py's fixture.

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/make_synthetic_scene.py
Env: SCENE_DIR (data/Synthetic4Relight/twosphere), N_TRAIN (100), N_TEST (8),
RES (800), GT_SPP_X (16).
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)

import jax
import jax.numpy as jnp

from geosplatting_tpu.bench import quality as q
from geosplatting_tpu.data.dataset import Dataset
from geosplatting_tpu.data.io import dump_float32_image
from geosplatting_tpu.graphics import images as gimages

OUT = Path(os.environ.get("SCENE_DIR", "data/Synthetic4Relight/twosphere"))
N_TRAIN = int(os.environ.get("N_TRAIN", 100))
N_TEST = int(os.environ.get("N_TEST", 8))
RES = int(os.environ.get("RES", 800))
SPP_X = int(os.environ.get("GT_SPP_X", 16))
CAMERA_ANGLE_X = 0.8575560272  # ~49 deg: the [-1,1] box fills the frame


def stored_orbit_c2w(n: int, radius: float, elev_deg: float, phase: float):
    """[n, 4, 4] stored-space lookat-origin orbit. The parser maps stored ->
    parsed by rows (-y, z, -x) and 2/3 translation scale; an orbit is closed
    under signed axis permutation, so parsed cameras orbit the origin at
    radius*2/3 with permuted up — we only care that they cover the sphere."""
    out = []
    for i in range(n):
        th = 2 * np.pi * (i + phase) / n
        el = np.deg2rad(elev_deg)
        eye = radius * np.array([
            np.cos(th) * np.cos(el), np.sin(th) * np.cos(el), np.sin(el)
        ])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= max(np.linalg.norm(right), 1e-8)
        up2 = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = up2
        c2w[:3, 2] = -fwd
        c2w[:3, 3] = eye
        out.append(c2w)
    return np.stack(out)


def write_transforms(split: str, n: int, elev_deg: float, phase: float):
    c2ws = stored_orbit_c2w(n, radius=2.2 * 1.5, elev_deg=elev_deg, phase=phase)
    frames = [
        {"file_path": f"./{split}/r_{i}", "transform_matrix": c2ws[i].tolist()}
        for i in range(n)
    ]
    (OUT / split).mkdir(parents=True, exist_ok=True)
    with open(OUT / f"transforms_{split}.json", "w") as f:
        json.dump({"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}, f)


def latlng_to_image(env: jnp.ndarray) -> np.ndarray:
    return np.asarray(env, np.float32)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    # alternate low/high elevation by interleaving two orbits worth of phase
    write_transforms("train", N_TRAIN, elev_deg=22.0, phase=0.0)
    write_transforms("test", N_TEST, elev_deg=32.0, phase=0.37)

    env_train = q.make_envmap(kind="train")
    env_relight = q.make_envmap(kind="relight")
    # a second held-out probe: the relight env yawed half a turn (still
    # exact GT — env_shade just samples the rolled map)
    env_relight2 = jnp.roll(env_relight, env_relight.shape[1] // 2, axis=1)
    dump_float32_image(OUT.parent / "envmap6.hdr", latlng_to_image(env_relight))
    dump_float32_image(OUT.parent / "envmap12.hdr", latlng_to_image(env_relight2))

    # placeholder frames so the eager dataset parse can load SOMETHING; the
    # real GT (rendered from the PARSED cameras) overwrites them below
    ph_rgb = np.zeros((800, 800, 3), np.float32)
    ph_a = np.zeros((800, 800, 1), np.float32)
    ph_rgba = np.zeros((800, 800, 4), np.float32)
    for i in range(N_TRAIN):
        dump_float32_image(OUT / "train" / f"r_{i}_rgb.hdr", ph_rgb)
        dump_float32_image(OUT / "train" / f"r_{i}_mask.png", ph_a)
    (OUT / "test_rli").mkdir(exist_ok=True)
    for i in range(N_TEST):
        dump_float32_image(OUT / "test" / f"r_{i}_rgba.png", ph_rgba)
        dump_float32_image(OUT / "test" / f"r_{i}_albedo.png", ph_rgba)
        dump_float32_image(OUT / "test" / f"r_{i}_rough.png", ph_rgba)
        for name in ("envmap6", "envmap12"):
            dump_float32_image(OUT / "test_rli" / f"{name}_r_{i}.png", ph_rgba)

    # parse back through the REAL dataset stack -> GT from parsed cameras.
    # The S4R layout is fixed at 800^2; rendering happens at RES via
    # scale_factor and stored files are nearest-upsampled back to 800^2
    # (exactly consistent: the trainer's own scale_factor re-downsamples),
    # so tiny validation runs and the production RES=800 share one path.
    assert 800 % RES == 0, f"RES must divide 800, got {RES}"
    up = 800 // RES
    ds = Dataset(OUT, scale_factor=RES / 800.0)
    print("recognized parser:", type(ds.dataparser).__name__, flush=True)

    def upsample(img: np.ndarray) -> np.ndarray:
        if up == 1:
            return img
        return np.kron(img, np.ones((up, up, 1), np.float32))

    cams_train, _, _ = ds.get_split("train")
    cams_test, _, _ = ds.get_split("test")

    print(f"rendering {N_TRAIN} train views ({RES}^2, spp_x={SPP_X})...",
          flush=True)
    key = jax.random.key(11)
    for i in range(N_TRAIN):
        rgba = np.asarray(q.render_gt_views(
            cams_train[jnp.array([i])], env_train, jax.random.fold_in(key, i),
            SPP_X,
        ))[0]
        # stored frames are LINEAR HDR + separate mask (the S4R layout);
        # GT renderer gives premultiplied sRGB — decode + unpremultiply
        a = rgba[..., 3:]
        srgb = np.where(a > 0, rgba[..., :3] / np.maximum(a, 1e-6), 0.0)
        linear = np.asarray(gimages.srgb2rgb(jnp.asarray(srgb)))
        dump_float32_image(OUT / "train" / f"r_{i}_rgb.hdr",
                           upsample(np.clip(linear, 0, None).astype(np.float32)))
        dump_float32_image(OUT / "train" / f"r_{i}_mask.png", upsample(a))
        if (i + 1) % 20 == 0:
            print(f"  train {i + 1}/{N_TRAIN}", flush=True)

    print(f"rendering {N_TEST} test views + materials + relight...", flush=True)
    (OUT / "test_rli").mkdir(exist_ok=True)
    albedo, rough = q.gt_material_maps(cams_test)
    albedo, rough = np.asarray(albedo), np.asarray(rough)
    for i in range(N_TEST):
        nvs = np.asarray(q.render_gt_views(
            cams_test[jnp.array([i])], env_train, jax.random.fold_in(key, 7000 + i),
            SPP_X,
        ))[0]
        dump_float32_image(OUT / "test" / f"r_{i}_rgba.png", upsample(nvs))
        dump_float32_image(OUT / "test" / f"r_{i}_albedo.png", upsample(albedo[i]))
        r1 = rough[i][..., 0:1]
        dump_float32_image(
            OUT / "test" / f"r_{i}_rough.png",
            upsample(np.concatenate(
                [np.repeat(r1, 3, axis=-1), rough[i][..., 1:2]], -1)),
        )
        for name, env in (("envmap6", env_relight), ("envmap12", env_relight2)):
            rl = np.asarray(q.render_gt_views(
                cams_test[jnp.array([i])], env,
                jax.random.fold_in(key, 9000 + i), SPP_X,
            ))[0]
            dump_float32_image(OUT / "test_rli" / f"{name}_r_{i}.png",
                               upsample(rl))
    print(f"done: {OUT}", flush=True)


if __name__ == "__main__":
    main()
