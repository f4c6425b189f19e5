"""End-to-end 3DGS vertical slice: fit random Gaussians to views rendered
from a ground-truth Gaussian scene, with densification mid-run. The minimum
end-to-end slice of SURVEY.md §7 step 3."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import gmath
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.graphics.splats import Splats
from geosplatting_tpu.models.gsplatter import GSplatter
from geosplatting_tpu.train.gsplat_trainer import (
    GSplatTrainer, GSplatTrainerConfig, params_to_splats,
)

W, H = 48, 48


def make_gt_scene(key):
    ks = jax.random.split(key, 5)
    n = 24
    means = jax.random.uniform(ks[0], (n, 3), minval=-0.6, maxval=0.6)
    return Splats(
        means=means,
        scales=jnp.full((n, 3), -2.0),
        quats=gmath.random_quaternion(ks[1], (n,)),
        colors=jax.random.uniform(ks[2], (n, 3), minval=0.2, maxval=1.0),
        shs=jnp.zeros((n, 0, 3)),
        opacities=jnp.full((n, 1), 3.0),
    )


def test_gsplat_training_improves_psnr():
    key = jax.random.key(0)
    gt = make_gt_scene(key)
    model = GSplatter(sh_degree=0, tile_capacity=128, background_color="black",
                      tile_chunk=4)

    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.5, elevation_degrees=20.0,
        num_samples=8, width=W, height=H, fov_degrees=60.0,
    )
    black = jnp.zeros(3)

    def render_gt(cam):
        rgba, _ = model.render_rgba(gt, cam)
        return rgba

    gt_rgba = jax.lax.map(render_gt, cams)  # [V, H, W, 4]

    init = Splats.random(jax.random.key(1), 64, sh_degree=0, random_scale=0.7)
    cfg = GSplatTrainerConfig(
        batch_size=4, warmup_length=10, refine_every=25,
        reset_alpha_every=1000, sh_degree_interval=1000, stop_split_at=1000,
        densify_grad_thresh=1e-5, cull_alpha_thresh=0.02,
    )
    trainer = GSplatTrainer(cfg, model, dataset_size=8)
    state = trainer.init_state(init)

    def eval_psnr(state):
        splats = params_to_splats(state["params"])

        def rr(cam):
            rgb, _ = model.render_rgb(splats, cam, black)
            return rgb

        pred = jax.lax.map(rr, cams)
        gt_rgb = gt_rgba[..., :3] * gt_rgba[..., 3:4]
        mse = jnp.mean((pred - gt_rgb) ** 2)
        return float(-10 * jnp.log10(mse))

    psnr0 = eval_psnr(state)
    steps = 60
    rng = np.random.default_rng(0)
    for step in range(1, steps + 1):
        idx = jnp.asarray(rng.choice(8, size=4, replace=False))
        batch_cams = cams[idx]
        batch_gt = gt_rgba[idx]
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(
            state, batch_cams, batch_gt, sub,
            trainer.max_sh_degree_at(step) or None,
        )
        key, sub = jax.random.split(key)
        state = trainer.after_update(state, step, sub, (W, H))

    psnr1 = eval_psnr(state)
    assert np.isfinite(psnr1)
    assert psnr1 > psnr0 + 1.0, f"PSNR did not improve: {psnr0} -> {psnr1}"


def test_densification_changes_count_and_keeps_optimizing():
    model = GSplatter(sh_degree=0, tile_capacity=64, background_color="black",
                      tile_chunk=4)
    init = Splats.random(jax.random.key(2), 32, sh_degree=0, random_scale=0.5)
    cfg = GSplatTrainerConfig(
        batch_size=2, warmup_length=1, refine_every=2, reset_alpha_every=1000,
        stop_split_at=1000, densify_grad_thresh=1e-9, densify_size_thresh=1e-4,
        cull_alpha_thresh=0.01,
    )
    trainer = GSplatTrainer(cfg, model, dataset_size=2)
    state = trainer.init_state(init)
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=0.0,
        num_samples=2, width=32, height=32,
    )
    gt = jnp.ones((2, 32, 32, 4)) * 0.5
    key = jax.random.key(3)
    n0 = state["params"]["means"].shape[0]
    for step in range(1, 11):
        key, s1, s2 = jax.random.split(key, 3)
        state, metrics = trainer.train_step(state, cams, gt, s1, None)
        state = trainer.after_update(state, step, s2, (32, 32))
    n1 = state["params"]["means"].shape[0]
    assert n1 != n0  # grad thresh tiny -> everything splits
    assert np.isfinite(float(metrics["loss"]))
