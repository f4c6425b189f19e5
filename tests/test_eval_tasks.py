"""Relight evaluation harness over a synthetic stage-3 model + duck-typed
dataset (albedo scaling estimation, NVS/albedo metrics plumbing)."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.engine.eval_tasks import (
    RelightEvaler, estimate_albedo_scaling, image_metrics,
)
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat_defer import GeoSplatterDefer

W = H = 24


def tiny_stage3():
    n = 64
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    from geosplatting_tpu.graphics import gmath

    means = jax.random.uniform(ks[0], (n, 3), minval=-0.4, maxval=0.4)
    export = {
        "exposure": jnp.zeros(1),
        "means": means,
        "scales": jnp.full((n, 3), -2.5),
        "quats": gmath.safe_normalize(jax.random.normal(ks[1], (n, 4))),
        "opacities": jnp.full((n, 1), 2.0),
        "normals": gmath.safe_normalize(means),
        "kd": jax.random.uniform(ks[2], (n, 3), minval=0.2, maxval=0.8),
        "occ": jnp.zeros((n, 6)),
        "ks_enc": None,
        "latlng": jnp.full((16, 32, 3), 0.8),
        "mc_vertices": jax.random.uniform(ks[3], (16, 3), minval=-0.4, maxval=0.4),
        "mc_indices": jax.random.randint(ks[4], (20, 3), 0, 16),
        "mc_face_mask": jnp.ones(20, bool),
        "sdf": jnp.linalg.norm(
            jax.random.uniform(ks[5], ((11) ** 3, 3)) - 0.5, axis=-1
        ) - 0.3,
        "initial_guess": jnp.array([-3.0, -3.0]),
    }
    model = GeoSplatterDefer(
        resolution=10, scale=1.0, tile_capacity=64, tile_chunk=4,
        num_samples_x=2, mesh_tile_capacity=32,
    )
    params = model.init_from_stage2(export, jax.random.key(1))
    geom = model.frozen_geometry(export)
    return model, params, geom


class FakeDataset:
    def __init__(self, cams, images, meta):
        self._data = (cams, images, meta)

    def get_split(self, split):
        return self._data


def test_image_metrics():
    a = jnp.zeros((8, 8, 3))
    m = image_metrics(a, a, fast=False)
    assert m["psnr"] > 100
    assert abs(m["ssim"] - 1.0) < 1e-5
    assert m["lpips"] is None  # no weights in this environment


def test_albedo_scaling_and_eval():
    model, params, geom = tiny_stage3()
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=10.0,
        num_samples=2, width=W, height=H,
    )
    kd_map = model.render_attribute(params, cams, "kd")
    gt_albedos = jnp.concatenate(
        [jnp.clip(kd_map[..., :3] * 1.5, 0, 1), kd_map[..., 3:]], -1
    )
    s = estimate_albedo_scaling(model, params, cams, gt_albedos)
    assert s.shape == (3,)
    assert np.isfinite(np.asarray(s)).all()
    assert (np.asarray(s) > 0.9).all()  # gt brighter than render

    gt_imgs = np.asarray(jnp.concatenate(
        [jnp.clip(kd_map[..., :3], 0, 1), kd_map[..., 3:]], -1))
    ds = FakeDataset(cams, gt_imgs, None)
    ev = RelightEvaler(model=model, params=params, geometry=geom,
                       fast=True, skip_rlit=True, skip_mat=True)
    results = ev.run(ds)
    assert "nvs" in results
    assert np.isfinite(results["nvs"]["psnr"])
