"""Pallas compositing kernels vs the pure-JAX reference path — forward and
gradients must match to float precision (run in interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosplatting_tpu.graphics import gmath
from geosplatting_tpu.ops import rasterize_pallas as rp
from geosplatting_tpu.ops.rasterize import rasterize

rp._INTERPRET = True

WIDTH, HEIGHT = 64, 48


def scene(key, n=300, channels=3):
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(ks[0], (n, 3), minval=-1.0, maxval=1.0)
    quats = gmath.safe_normalize(jax.random.normal(ks[1], (n, 4)))
    scales = jnp.exp(jax.random.uniform(ks[2], (n, 3), minval=-4.5, maxval=-2.0))
    opacities = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(ks[4], (n, channels))
    return means, quats, scales, opacities, colors


def cam():
    from geosplatting_tpu.graphics.cameras import Cameras
    c = Cameras.from_lookat(
        jnp.array([2.0, 1.0, 1.5]), jnp.zeros(3),
        fov_degrees=60.0, width=WIDTH, height=HEIGHT,
    )
    return c.view_matrix, c.intrinsic_matrix


@pytest.mark.parametrize("channels", [3, 14])
@pytest.mark.parametrize("pallas_backend", ["pairs", "pallas_dense"])
def test_pallas_forward_matches_reference(channels, pallas_backend):
    viewmat, K = cam()
    means, quats, scales, opacities, colors = scene(jax.random.key(0),
                                                    channels=channels)
    kw = dict(tile_capacity=256, render_mode="RGB")
    r_ref, a_ref, _ = rasterize(means, quats, scales, opacities, colors,
                                viewmat, K, WIDTH, HEIGHT, backend="reference", **kw)
    r_pal, a_pal, _ = rasterize(means, quats, scales, opacities, colors,
                                viewmat, K, WIDTH, HEIGHT,
                                backend=pallas_backend, **kw)
    # the chunked-carry pairs backend reassociates the transmittance prefix
    # sum, so a weight sitting exactly at the T=1e-4 cutoff can flip in/out:
    # isolated pixels may differ by ~cutoff * color
    atol = 1e-3 if pallas_backend == "pairs" else 3e-5
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=atol)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref), atol=atol)


@pytest.mark.parametrize("pallas_backend", ["pairs", "pallas_dense"])
def test_pallas_gradients_match_reference(pallas_backend):
    viewmat, K = cam()
    means, quats, scales, opacities, colors = scene(jax.random.key(1), n=120)
    tgt = jax.random.uniform(jax.random.key(2), (HEIGHT, WIDTH, 3))

    def loss(backend, means, scales, opacities, colors, off):
        r, a, _ = rasterize(
            means, quats, scales, opacities, colors, viewmat, K, WIDTH, HEIGHT,
            tile_capacity=128, means2d_offset=off, backend=backend,
        )
        return jnp.sum((r - tgt) ** 2) + jnp.sum(a * 0.3)

    args = (means, scales, opacities, colors, jnp.zeros((120, 2)))
    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(lambda *a: loss(pallas_backend, *a),
                     argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "opacities", "colors", "means2d_offset"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        atol = 2e-3 if pallas_backend == "pairs" else 2e-4
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), atol=atol, rtol=2e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_pallas_ed_mode():
    viewmat, K = cam()
    means, quats, scales, opacities, colors = scene(jax.random.key(3), n=100)
    kw = dict(tile_capacity=128, render_mode="RGB+ED")
    r_ref, _, _ = rasterize(means, quats, scales, opacities, colors,
                            viewmat, K, WIDTH, HEIGHT, backend="reference", **kw)
    r_pal, _, _ = rasterize(means, quats, scales, opacities, colors,
                            viewmat, K, WIDTH, HEIGHT, backend="pallas", **kw)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=1e-4)
