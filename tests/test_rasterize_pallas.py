"""Pallas pair-compositing kernels vs the pure-JAX reference path — forward
and gradients must match to float precision (interpret mode on CPU).

Backend roles (VERDICT r2 #10): 'pairs' is the single production backend on
accelerators; 'reference' is the single CPU/test backend. The former dense
[T, K_cap] tile-table kernels ('pallas_dense', ops/rasterize_pallas.py) were
superseded by the pair-centric chunk-list kernels everywhere and deleted."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosplatting_tpu.graphics import gmath
from geosplatting_tpu.ops.rasterize import rasterize

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
@pytest.mark.parametrize("pallas_backend", ["pairs"])
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
    atol = 1e-3
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=atol)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref), atol=atol)


@pytest.mark.parametrize("pallas_backend", ["pairs"])
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
        atol = 2e-3
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


def test_pairs_saturated_tile_gradients_finite():
    """Regression: deeply saturated tiles (transmittance hits the cutoff
    mid-pair-list) must produce finite gradients that match the reference —
    the forward's saturation early-exit must keep the carried log T
    consistent with the backward's full suffix reconstruction."""
    viewmat, K = cam()
    n = 600
    ks = jax.random.split(jax.random.key(7), 3)
    means = jnp.concatenate(
        [jax.random.normal(ks[0], (n, 2)) * 0.05,
         jnp.linspace(0.5, 2.0, n)[:, None]], axis=-1)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.08)
    opacities = jnp.full((n,), 0.9)
    colors = jax.random.uniform(ks[1], (n, 3))
    tgt = jax.random.uniform(ks[2], (HEIGHT, WIDTH, 3))

    def loss(backend, m, o, c):
        r, a, _ = rasterize(m, quats, scales, o, c, viewmat, K, WIDTH, HEIGHT,
                            backend=backend)
        return jnp.sum((r - tgt) ** 2) + jnp.sum(a)

    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums=(0, 1, 2))(
        means, opacities, colors)
    g_pal = jax.grad(lambda *a: loss("pairs", *a), argnums=(0, 1, 2))(
        means, opacities, colors)
    for name, gr, gp in zip(["means", "opacities", "colors"], g_ref, g_pal):
        assert bool(jnp.isfinite(gp).all()), f"non-finite pairs grad: {name}"
        # the two backends composite slightly different pair sets at the
        # transmittance cutoff in deeply saturated tiles, so a small
        # fraction of entries legitimately differs; the bulk must match
        gp, gr = np.asarray(gp), np.asarray(gr)
        mismatch = np.abs(gp - gr) > (5e-3 + 5e-3 * np.abs(gr))
        frac = mismatch.mean()
        assert frac < 0.03, f"{name}: {frac:.3f} of grads mismatch"
        denom = np.linalg.norm(gp) * np.linalg.norm(gr) + 1e-12
        cos = float((gp * gr).sum() / denom)
        assert cos > 0.999, f"{name}: gradient direction diverged ({cos})"


@pytest.mark.parametrize("tile", [(16, 8), (8, 16)])
def test_pairs_rect_tiles_match_reference(tile):
    """Rect tiles (p_sz = 128 = one f32 lane register) must render exactly
    like the square-tile reference path — binning covers the same pixels."""
    viewmat, K = cam()
    means, quats, scales, opacities, colors = scene(jax.random.key(2))
    r_ref, a_ref, _ = rasterize(means, quats, scales, opacities, colors,
                                viewmat, K, WIDTH, HEIGHT,
                                backend="reference", tile_capacity=256)
    r_pal, a_pal, _ = rasterize(means, quats, scales, opacities, colors,
                                viewmat, K, WIDTH, HEIGHT,
                                backend="pairs", tile_size=tile)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref), atol=1e-3)


def test_pairs_rect_tiles_gradients_match_square():
    """Same gradients through the rect-tile kernels as the square ones."""
    viewmat, K = cam()
    means, quats, scales, opacities, colors = scene(jax.random.key(3), n=200)

    def loss(ts, m, o, c):
        r, a, _ = rasterize(m, quats, scales, o, c, viewmat, K,
                            WIDTH, HEIGHT, backend="pairs", tile_size=ts)
        return (r * jnp.linspace(0, 1, WIDTH)[None, :, None]).sum() + a.sum()

    g_sq = jax.grad(lambda *a: loss(16, *a), argnums=(0, 1, 2))(
        means, opacities, colors)
    g_rc = jax.grad(lambda *a: loss((16, 8), *a), argnums=(0, 1, 2))(
        means, opacities, colors)
    # retiling moves pairs across chunk boundaries, so contributors sitting
    # exactly at the T=1e-4 transmittance cutoff can flip (same caveat as
    # the forward test's atol): isolated grads differ at the ~1e-3 level
    for a, b in zip(g_sq, g_rc):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=2e-3)
