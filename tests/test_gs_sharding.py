"""Gaussian-axis sharded rendering: 8-device exact match vs the
single-device rasterizer, and gradient flow back to sharded params."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.graphics.splats import Splats
from geosplatting_tpu.ops.rasterize import rasterize
from geosplatting_tpu.parallel.gs_sharding import rasterize_gs_sharded
from geosplatting_tpu.parallel.sharding import make_mesh

W, H = 64, 48
N = 512  # divisible by 8


def _scene():
    key = jax.random.key(2)
    splats = Splats.random(key, N, sh_degree=1, random_scale=0.7)
    cam = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.3, elevation_degrees=20.0,
        num_samples=2, width=W, height=H,
    )[0]
    colors = jnp.concatenate(
        (jax.numpy.expand_dims(splats.colors, -2), splats.shs), axis=-2
    )
    args = (
        splats.means, splats.quats / jnp.linalg.norm(splats.quats, axis=-1, keepdims=True),
        jnp.exp(splats.scales), jax.nn.sigmoid(splats.opacities[:, 0]),
    )
    return args, colors, cam


def test_gs_sharded_matches_single_device():
    mesh = make_mesh(8, axis_name="gs")
    (means, quats, scales, opac), colors, cam = _scene()
    kw = dict(tile_size=16, tile_capacity=128, pairs_per_gaussian=8,
              backend="reference")

    ref, ref_a, _ = rasterize(
        means, quats, scales, opac, colors,
        cam.view_matrix, cam.intrinsic_matrix, W, H,
        sh_degree=1, rasterize_mode="antialiased", **kw,
    )
    out, out_a = rasterize_gs_sharded(
        mesh, "gs", means, quats, scales, opac, colors,
        cam.view_matrix, cam.intrinsic_matrix, W, H,
        sh_degree=1, rasterize_mode="antialiased", **kw,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(ref_a), atol=1e-5
    )


def test_gs_sharded_gradients_flow():
    mesh = make_mesh(8, axis_name="gs")
    (means, quats, scales, opac), colors, cam = _scene()
    kw = dict(tile_size=16, tile_capacity=128, pairs_per_gaussian=8,
              backend="reference")

    def loss_sharded(m, c):
        out, alpha = rasterize_gs_sharded(
            mesh, "gs", m, quats, scales, opac, c,
            cam.view_matrix, cam.intrinsic_matrix, W, H, sh_degree=1, **kw,
        )
        return jnp.sum(out**2) + jnp.sum(alpha)

    def loss_single(m, c):
        out, alpha, _ = rasterize(
            m, quats, scales, opac, c,
            cam.view_matrix, cam.intrinsic_matrix, W, H, sh_degree=1, **kw,
        )
        return jnp.sum(out**2) + jnp.sum(alpha)

    gs = jax.grad(loss_sharded, argnums=(0, 1))(means, colors)
    gr = jax.grad(loss_single, argnums=(0, 1))(means, colors)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
