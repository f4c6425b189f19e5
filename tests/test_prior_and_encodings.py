"""GeoSplatterPrior training smoke + Pos/SH/Triplane encoding tests."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import flexicubes as fc, gmath
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.graphics import images as gimages
from geosplatting_tpu.models.encodings import PosEncoding, SHEncoding, TriplaneEncoding
from geosplatting_tpu.models.geosplat_prior import GeoSplatterPrior, z_up_to_y_up
from geosplatting_tpu.train.geosplat_prior_trainer import (
    GeoSplatPriorTrainer, GeoSplatPriorTrainerConfig,
)

W = H = 32


def test_pos_encoding():
    enc = PosEncoding(num_frequencies=4, max_freq_exp=3.0)
    x = jax.random.uniform(jax.random.key(0), (10, 3), minval=-1, maxval=1)
    out = enc.apply(x)
    assert out.shape == (10, enc.output_dim(3))
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(x))


def test_sh_encoding_orthonormal_constant():
    enc = SHEncoding(degree=3)
    d = gmath.safe_normalize(jax.random.normal(jax.random.key(1), (32, 3)))
    out = enc.apply(d)
    assert out.shape == (32, 9)
    np.testing.assert_allclose(np.asarray(out[:, 0]), gmath.SH_C0, atol=1e-5)


def test_triplane_encoding():
    enc = TriplaneEncoding(resolution=8, num_components=4)
    planes = enc.init(jax.random.key(2))
    x = jax.random.uniform(jax.random.key(3), (16, 3), minval=-1, maxval=1)
    out = enc.apply(planes, x)
    assert out.shape == (16, 4)
    g = jax.grad(lambda p: enc.apply(p, x).sum())(planes)
    assert np.abs(np.asarray(g)).sum() > 0


def test_z_up_conversion():
    v = jnp.array([[1.0, 2.0, 3.0]])
    out = z_up_to_y_up(v)
    np.testing.assert_allclose(
        np.asarray(out), [[-2 * 1.25 * 2 / 3, 3 * 1.25 * 2 / 3, -1 * 1.25 * 2 / 3]],
        rtol=1e-5,
    )


def test_prior_training_smoke():
    # base mesh: sphere from flexicubes
    grid = fc.make_grid(10, scale=1.0)
    sdf = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.5
    base_mesh = fc.extract(grid, sdf).mesh

    model = GeoSplatterPrior(
        scale=1.0, tile_capacity=96, tile_chunk=4, num_samples_x=2, denoise=False,
    )
    params = model.init(base_mesh, jax.random.key(0))
    trainer = GeoSplatPriorTrainer(GeoSplatPriorTrainerConfig(batch_size=2), model)
    state = trainer.init_state(params)

    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=10.0,
        num_samples=2, width=W, height=H,
    )
    gt = jnp.zeros((2, H, W, 4)).at[..., :].set(0.3)
    key = jax.random.key(1)
    for step in range(3):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(
            state, base_mesh, cams, gt, sub, jnp.asarray(step, jnp.float32)
        )
    assert np.isfinite(float(m["loss"]))
    assert float(jnp.abs(state["params"]["deform"]).sum()) > 0  # vertices moved
    export = model.export_model(state["params"], base_mesh, jax.random.key(2))
    assert export["means"].shape[0] > 0
