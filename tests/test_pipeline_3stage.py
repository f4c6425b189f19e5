"""The full three-stage pipeline chained at test scale, mirroring eval.sh:
stage-1 train -> export -> stage-2 (MC) train -> export -> stage-3
(deferred) train, each stage consuming the previous export.

Runs in a subprocess: this is the heaviest compilation workload in the
suite and CPU XLA has shown an ordering-dependent crash when it runs after
many other compilations in the same process (passes standalone)."""
import os
import subprocess
import sys
from pathlib import Path


def test_three_stage_chain_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, "-c",
         "import tests.test_pipeline_3stage as m; m._run_chain()"],
        env=env, capture_output=True, text=True,
        cwd=Path(__file__).resolve().parents[1], timeout=3000,
    )
    assert result.returncode == 0, (
        f"subprocess failed:\nstdout:{result.stdout[-2000:]}\n"
        f"stderr:{result.stderr[-2000:]}"
    )


import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import images as gimages
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat import GeoSplatter
from geosplatting_tpu.models.geosplat_mc import GeoSplatterMC, export_stage1
from geosplatting_tpu.models.geosplat_defer import GeoSplatterDefer
from geosplatting_tpu.train.geosplat_trainer import GeoSplatTrainer, GeoSplatTrainerConfig
from geosplatting_tpu.train.geosplat_mc_trainer import GeoSplatMCTrainer, GeoSplatMCTrainerConfig
from geosplatting_tpu.train.geosplat_defer_trainer import (
    GeoSplatDeferTrainer, GeoSplatDeferTrainerConfig,
)

W = H = 32
RES = 10


def gt_views(cams):
    origins, dirs = cams.generate_rays()
    b = jnp.sum(origins * dirs, -1)
    c = jnp.sum(origins * origins, -1) - 0.25
    disc = b * b - c
    hit = (disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0)) > 0)
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    p = origins + t[..., None] * dirs
    n = p / 0.5
    shade = jnp.clip(jnp.sum(n * jnp.array([0.577, 0.577, 0.577]), -1), 0.1, 1.0)
    rgb = jnp.where(hit[..., None], shade[..., None] * jnp.ones(3) * 0.8, 0.0)
    a = hit[..., None].astype(jnp.float32)
    return jnp.concatenate((gimages.rgb2srgb(rgb) * a, a), -1)


def _run_chain():
    key = jax.random.key(0)
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=4, width=W, height=H,
    )
    gt = gt_views(cams)

    # ---- stage 1 -------------------------------------------------------------
    s1 = GeoSplatter(resolution=RES, light_resolution=32, scale=1.0,
                     tile_capacity=96, tile_chunk=4, env_num_samples=8)
    p1 = s1.init(jax.random.key(1))
    grid = s1.make_grid()
    p1["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    t1 = GeoSplatTrainer(GeoSplatTrainerConfig(batch_size=2, vertex_sample_warmup=2), s1)
    st1 = t1.init_state(p1)
    for step in range(6):
        key, sub = jax.random.split(key)
        st1, m1 = t1.train_step(
            st1, cams[jnp.array([step % 4, (step + 1) % 4])],
            gt[jnp.array([step % 4, (step + 1) % 4])], sub,
            jnp.asarray(step, jnp.float32), sampling=t1.sampling_at(step),
        )
    assert np.isfinite(float(m1["loss"]))
    export1 = export_stage1(s1, st1["params"])
    assert export1["cubemap"].shape[0] == 6

    # ---- stage 2 -------------------------------------------------------------
    s2 = GeoSplatterMC(resolution=RES, scale=1.0, tile_capacity=96,
                       tile_chunk=4, num_samples_x=2, denoise=False)
    p2 = s2.init_from_stage1(export1, jax.random.key(2))
    assert p2["latlng"].shape == (256, 512, 3)
    t2 = GeoSplatMCTrainer(GeoSplatMCTrainerConfig(batch_size=2, geometry_warm_up=2), s2)
    st2 = t2.init_state(p2)
    for step in range(3):
        key, sub = jax.random.split(key)
        st2, m2 = t2.train_step(
            st2, cams[jnp.array([0, 1])], gt[jnp.array([0, 1])], sub,
            jnp.asarray(step, jnp.float32),
        )
    assert np.isfinite(float(m2["loss"])), m2
    assert float(m2["num_gaussians"]) > 0
    export2 = s2.export_model(st2["params"], jax.random.key(3))
    assert export2["means"].shape[0] == export2["kd"].shape[0]

    # ---- stage 3 -------------------------------------------------------------
    s3 = GeoSplatterDefer(resolution=RES, scale=1.0, tile_capacity=96,
                          tile_chunk=4, num_samples_x=2, mesh_tile_capacity=64)
    p3 = s3.init_from_stage2(export2, jax.random.key(4))
    geom = s3.frozen_geometry(export2)
    t3 = GeoSplatDeferTrainer(GeoSplatDeferTrainerConfig(batch_size=2, kd_reg=0.1), s3)
    st3 = t3.init_state(p3)
    losses = []
    for step in range(3):
        key, sub = jax.random.split(key)
        st3, m3 = t3.train_step(
            st3, geom, cams[jnp.array([0, 1])], gt[jnp.array([0, 1])], sub,
            jnp.asarray(step, jnp.float32),
        )
        losses.append(float(m3["loss"]))
    assert np.isfinite(losses).all(), losses
    # kd clamp applied
    assert float(st3["params"]["kd"].min()) >= 0.01
    assert float(st3["params"]["latlng_hue"].max()) <= 0.99

    # ---- relighting API --------------------------------------------------------
    new_env = jax.random.uniform(jax.random.key(5), (32, 64, 3), minval=0.1, maxval=2.0)
    rgba, _, _ = s3.render(
        st3["params"], geom, cams[jnp.array([0])], jax.random.key(6),
        relight_envmap=new_env, albedo_scaling=jnp.array([1.1, 0.9, 1.0]),
    )
    assert rgba.shape == (1, H, W, 4)
    assert np.isfinite(np.asarray(rgba)).all()

    # attribute renders for material eval
    kd_map = s3.render_attribute(st3["params"], cams[jnp.array([0])], "kd")
    ks_map = s3.render_attribute(st3["params"], cams[jnp.array([0])], "ks", geometry=geom)
    assert kd_map.shape == (1, H, W, 4)
    assert np.isfinite(np.asarray(ks_map)).all()
