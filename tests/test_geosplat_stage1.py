"""Stage-1 end-to-end: GeoSplatter fits geometry + material + light to views
of a synthetic lit sphere, via the full FlexiCubes -> MGAdapter -> split-sum
-> rasterize -> SSIM-L1 pipeline (SURVEY.md §7 step 6 reduced to test scale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosplatting_tpu.graphics import images as gimages
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat import (
    GeoSplatter, MGAdapter, get_gaussians_from_face, tone_naive,
)
from geosplatting_tpu.models.mlp import MLPConfig
from geosplatting_tpu.train.geosplat_trainer import (
    GeoSplatTrainer, GeoSplatTrainerConfig,
)

W = H = 48


def make_model(**kw):
    defaults = dict(
        resolution=12, light_resolution=32, scale=1.0,
        tile_capacity=128, tile_chunk=4, env_num_samples=16,
        surf_cube_budget=8.0, surf_edge_budget=8.0,
    )
    defaults.update(kw)
    return GeoSplatter(**defaults)


def gt_sphere_views(cams):
    """Render a white lambertian-ish sphere analytically via ray-sphere hits."""
    origins, dirs = cams.generate_rays()  # [B, H, W, 3]
    r = 0.5
    b = jnp.sum(origins * dirs, -1)
    c = jnp.sum(origins * origins, -1) - r * r
    disc = b * b - c
    hit = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    hit = hit & (t > 0)
    p = origins + t[..., None] * dirs
    n = p / r
    light_dir = jnp.array([0.577, 0.577, 0.577])
    shade = jnp.clip(jnp.sum(n * light_dir, -1), 0.1, 1.0)
    rgb = jnp.where(hit[..., None], shade[..., None] * jnp.ones(3) * 0.8, 0.0)
    alpha = hit[..., None].astype(jnp.float32)
    return jnp.concatenate((gimages.rgb2srgb(rgb) * alpha, alpha), -1)


def test_mgadapter_six_gaussians_per_face():
    from geosplatting_tpu.graphics.mesh import TriangleMesh
    v = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    f = jnp.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], jnp.int32)
    mesh = TriangleMesh(vertices=v, indices=f)
    splats, offsets, valid = MGAdapter().make(mesh)
    assert splats.num_gaussians == 24
    assert bool(valid.all())
    assert np.isfinite(np.asarray(splats.means)).all()
    assert np.isfinite(np.asarray(splats.scales)).all()
    # normals stored in colors are unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(splats.colors), axis=-1), 1.0, atol=1e-4
    )
    # quats encode orthonormal frames
    from geosplatting_tpu.graphics import gmath
    rots = gmath.quat2rot(splats.quats)
    eye = jnp.einsum("nij,nkj->nik", rots, rots)
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(3), eye.shape), atol=1e-4
    )


def test_tone_mapping():
    x = jnp.array([0.0, 0.5, 1.0, 2.0])
    y = tone_naive(x, jnp.asarray(1.0))
    assert float(y[0]) == pytest.approx(0.0, abs=1e-2)
    assert float(y[1]) == pytest.approx(0.5, abs=1e-2)
    assert float(y[3]) <= 1.01  # soft-clamped


def test_stage1_render_shapes_and_grads():
    model = make_model()
    params = model.init(jax.random.key(0))
    # seed SDF with a sphere so there is a surface
    grid = model.make_grid()
    v = grid.base_vertices()
    params["sdf"] = jnp.linalg.norm(v, axis=-1) - 0.5
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=10.0,
        num_samples=2, width=W, height=H,
    )
    rgba, reg, aux = model.render(params, cams, jax.random.key(1))
    assert rgba.shape == (2, H, W, 4)
    assert np.isfinite(np.asarray(rgba)).all()
    assert int(aux["num_gaussians"]) > 0

    def loss(p):
        rgba, reg, _ = model.render(p, cams, jax.random.key(1))
        return rgba.sum() + reg

    g = jax.grad(loss)(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.isfinite(np.asarray(flat)).all()
    for name in ("sdf", "deform", "cubemap", "weights"):
        assert float(jnp.abs(g[name]).sum()) > 0, f"no gradient into {name}"


def test_stage1_batched_binning_matches_map():
    """batched_binning=True (vmapped binning + batched shading) must produce
    the same images and gradients as the per-camera map path."""
    from geosplatting_tpu.ops import rasterize_pairs as rp

    old = rp._INTERPRET
    rp._INTERPRET = True  # pairs backend on CPU
    try:
        kw = dict(pairs_per_gaussian=4, chunk_size=128)
        m_map = make_model(backend="pairs", **kw)
        m_bat = make_model(backend="pairs", batched_binning=True, **kw)
        params = m_map.init(jax.random.key(0))
        grid = m_map.make_grid()
        params["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.5
        cams = Cameras.from_orbit(
            center=jnp.zeros(3), radius=2.0, elevation_degrees=10.0,
            num_samples=2, width=W, height=H,
        )
        key = jax.random.key(1)
        rgba0, reg0, aux0 = m_map.render(params, cams, key)
        rgba1, reg1, aux1 = m_bat.render(params, cams, key)
        np.testing.assert_allclose(
            np.asarray(rgba0), np.asarray(rgba1), atol=1e-5, rtol=1e-5
        )
        assert int(aux0["total_pairs"]) == int(aux1["total_pairs"])

        def loss(m, p):
            rgba, reg, _ = m.render(p, cams, key)
            return rgba.sum() + reg

        g0 = jax.grad(lambda p: loss(m_map, p))(params)
        g1 = jax.grad(lambda p: loss(m_bat, p))(params)
        f0, _ = jax.flatten_util.ravel_pytree(g0)
        f1, _ = jax.flatten_util.ravel_pytree(g1)
        assert np.isfinite(np.asarray(f1)).all()
        np.testing.assert_allclose(
            np.asarray(f0), np.asarray(f1), atol=2e-4, rtol=2e-3
        )
    finally:
        rp._INTERPRET = old


def test_stage1_training_improves():
    model = make_model()
    params = model.init(jax.random.key(2))
    grid = model.make_grid()
    v = grid.base_vertices()
    # blobby init, slightly off from the target sphere
    params["sdf"] = jnp.linalg.norm(v - 0.1, axis=-1) - 0.35

    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=6, width=W, height=H,
    )
    gt = gt_sphere_views(cams)

    cfg = GeoSplatTrainerConfig(batch_size=3, vertex_sample_warmup=3)
    trainer = GeoSplatTrainer(cfg, model)
    state = trainer.init_state(params)

    key = jax.random.key(3)
    rng = np.random.default_rng(0)
    losses = []
    for step in range(40):
        idx = jnp.asarray(rng.choice(6, 3, replace=False))
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(
            state, cams[idx], gt[idx], sub, jnp.asarray(step, jnp.float32),
            sampling=trainer.sampling_at(step),
        )
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[3:8]) - 0.01, losses
    assert float(m["num_gaussians"]) > 0
    # envmap stayed clamped
    assert float(state["params"]["cubemap"].min()) >= 1e-2
