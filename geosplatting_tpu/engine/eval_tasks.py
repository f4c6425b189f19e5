"""Evaluation: NVS / relighting / material-recovery metrics for stage 3.

Parity target: ``tests/model/test_geosplat_defer.py:368-493``
(``RelightEvaler``): per-channel albedo scaling estimation (least-square or
median) against GT albedo, NVS PSNR/SSIM/LPIPS over the test split, relight
metrics per GT envmap after ``set_relight_envmap``, albedo PSNR/SSIM(/LPIPS)
after scaling, roughness MSE. LPIPS needs pretrained VGG weights — absent
in a zero-egress environment it reports None (see ops/lpips.py)."""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..graphics import images as gimages
from ..graphics.cameras import Cameras
from ..models.geosplat_defer import GeoSplatterDefer
from ..ops.ssim import ssim


def render_chunked(render_fn, cameras: Cameras, chunk: int = 8) -> np.ndarray:
    """Render every camera through ONE jitted fixed-shape chunk function.

    The reference eval renders test splits one camera at a time in Python
    (fine at 4 views, pathological at Syn4Relight's 200); here the camera
    axis is chunked to a static shape (last chunk padded by repeating the
    final camera) so XLA compiles exactly once per render kind."""
    n = cameras.shape[0]
    chunk = max(1, min(chunk, n))
    jfn = jax.jit(render_fn)
    outs = []
    for s in range(0, n, chunk):
        idx = np.arange(s, min(s + chunk, n))
        pad = chunk - len(idx)
        idx_p = (
            np.concatenate([idx, np.full(pad, n - 1, idx.dtype)])
            if pad else idx
        )
        out = jfn(cameras[jnp.asarray(idx_p)])
        outs.append(np.asarray(out)[: len(idx)])
    return np.concatenate(outs)


def estimate_albedo_scaling(
    model: GeoSplatterDefer,
    params: dict,
    cameras: Cameras,
    gt_albedos: jnp.ndarray,   # [N, H, W, 4] sRGB rgba
    *,
    method: str = "least-square",
) -> jnp.ndarray:
    """Per-channel albedo scaling (test_geosplat_defer.py:385-404)."""
    kd_all = render_chunked(
        lambda cb: model.render_attribute(params, cb, "kd"), cameras
    )
    scalings = []
    for i in range(cameras.shape[0]):
        kd_rgba = kd_all[i]
        # Linear-space albedo, black-composited (kd is stored linear; alpha
        # multiplication composites over black as the reference eval does).
        albedo = jnp.clip(kd_rgba[..., :3], 0, 1) * kd_rgba[..., 3:]
        gt = gt_albedos[i]
        if method == "least-square":
            gt_lin = gimages.srgb2rgb(gt[..., :3]) * gt[..., 3:]
            num = (albedo * gt_lin).reshape(-1, 3).sum(0)
            den = jnp.maximum((albedo**2).reshape(-1, 3).sum(0), 1e-8)
            scalings.append(num / den)
        elif method == "median":
            gt_lin = gimages.srgb2rgb(gt[..., :3])
            mask = np.asarray(gt[..., 3] > 0)
            ratio = np.asarray(gt_lin / jnp.maximum(albedo, 1e-3))[mask]
            scalings.append(jnp.asarray(np.median(ratio, axis=0)))
        else:
            raise ValueError(method)
    s = jnp.stack(scalings)
    return s.mean(0) if method == "least-square" else jnp.median(s, axis=0)


_LPIPS_WARNED = False


def image_metrics(pred: jnp.ndarray, gt: jnp.ndarray, fast: bool = False) -> dict:
    mse = float(jnp.mean((pred - gt) ** 2))
    out = {"psnr": -10.0 * np.log10(max(mse, 1e-12))}
    if not fast:
        out["ssim"] = float(ssim(pred, gt))
        try:
            from ..ops.lpips import lpips

            out["lpips"] = lpips(pred, gt)
        except (ImportError, FileNotFoundError):
            global _LPIPS_WARNED
            if not _LPIPS_WARNED:
                _LPIPS_WARNED = True
                print(
                    "lpips: weights absent — set GEOSPLAT_LPIPS_WEIGHTS to a "
                    "vgg16+lin .npz to enable (graph validated in "
                    "tests/test_lpips.py); reporting lpips: null",
                    flush=True,
                )
            out["lpips"] = None
    return out


@dataclasses.dataclass
class RelightEvaler:
    """NVS + relighting + material metrics over a RelightDataset test split."""

    model: GeoSplatterDefer
    params: dict
    geometry: dict
    scaling: str = "least-square"
    fast: bool = True
    skip_nvs: bool = False
    skip_rlit: bool = False
    skip_mat: bool = False
    seed: int = 0

    def run(self, dataset) -> dict[str, Any]:
        cams, gt_images, meta = dataset.get_split("test")
        results: dict[str, Any] = {}
        bg = jnp.zeros(3)
        key = jax.random.key(self.seed)

        gt_albedos = None
        if meta and meta.get("albedo"):
            from ..data.io import load_masked_image

            gt_albedos = jnp.stack(
                [jnp.asarray(load_masked_image(p)) for p in meta["albedo"]]
            )
            scale = estimate_albedo_scaling(
                self.model, self.params, cams, gt_albedos, method=self.scaling
            )
            results["albedo_scaling"] = np.asarray(scale).tolist()
        else:
            scale = None

        def render_srgb(cam_batch, **kw):
            rgba, _, _ = self.model.render(
                self.params, self.geometry, cam_batch, key, **kw
            )
            rgb = gimages.rgb2srgb(jnp.clip(rgba[..., :3], 0, 1))
            return jnp.clip(rgb * rgba[..., 3:] + (1 - rgba[..., 3:]) * bg, 0, 1)

        if not self.skip_nvs:
            preds = render_chunked(render_srgb, cams)
            vals = []
            for i in range(cams.shape[0]):
                gt = jnp.clip(
                    gt_images[i][..., :3] * gt_images[i][..., 3:]
                    + (1 - gt_images[i][..., 3:]) * bg, 0, 1,
                )
                vals.append(
                    image_metrics(jnp.asarray(preds[i]), jnp.asarray(gt), self.fast)
                )
            results["nvs"] = _mean_metrics(vals)

        if not self.skip_rlit and meta and meta.get("relight"):
            from ..data.io import load_float32_image, load_masked_image

            for name, frames in meta["relight"].items():
                env_path = meta["envmaps"][name]
                try:
                    env = jnp.asarray(load_float32_image(env_path))[..., :3]
                except Exception:
                    continue
                n_frames = len(frames)
                preds = render_chunked(
                    lambda cb: render_srgb(
                        cb, relight_envmap=env, albedo_scaling=scale
                    ),
                    cams[jnp.arange(n_frames)],
                )
                vals = []
                for i, frame_path in enumerate(frames):
                    gt = jnp.asarray(load_masked_image(frame_path))
                    gt_c = jnp.clip(gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:]) * bg, 0, 1)
                    vals.append(
                        image_metrics(jnp.asarray(preds[i]), gt_c, self.fast)
                    )
                results[f"relight/{name}"] = _mean_metrics(vals)

        if not self.skip_mat and gt_albedos is not None:
            vals, rough_mses = [], []
            gt_roughs = None
            if meta.get("roughness"):
                from ..data.io import load_masked_image

                gt_roughs = [load_masked_image(p) for p in meta["roughness"]]
            kd_all = render_chunked(
                lambda cb: self.model.render_attribute(
                    self.params, cb, "kd", albedo_scaling=scale
                ),
                cams,
            )
            ks_all = None
            if gt_roughs is not None:
                ks_all = render_chunked(
                    lambda cb: self.model.render_attribute(
                        self.params, cb, "ks", geometry=self.geometry
                    ),
                    cams,
                )
            for i in range(cams.shape[0]):
                kd_rgba = kd_all[i]
                albedo = jnp.clip(jnp.asarray(kd_rgba[..., :3]), 0, 1)
                gt_a = jnp.clip(
                    gt_albedos[i][..., :3] * gt_albedos[i][..., 3:], 0, 1
                )
                vals.append(image_metrics(albedo * kd_rgba[..., 3:], gt_a, self.fast))
                if gt_roughs is not None:
                    rough = jnp.asarray(ks_all[i][..., 1:2])
                    gt_r = jnp.asarray(gt_roughs[i][..., 0:1]) * jnp.asarray(
                        gt_roughs[i][..., 3:4]
                    )
                    rough_mses.append(float(jnp.mean((rough - gt_r) ** 2)))
            results["albedo"] = _mean_metrics(vals)
            if rough_mses:
                results["roughness_mse"] = float(np.mean(rough_mses))
        return results


def _mean_metrics(vals: list[dict]) -> dict:
    out = {}
    for k in vals[0]:
        xs = [v[k] for v in vals if v[k] is not None]
        out[k] = float(np.mean(xs)) if xs else None
    return out
