"""Cubemap + split-sum prefilter golden tests: uv mapping roundtrip, sampling
exactness, diffuse prefilter vs brute-force cosine integral, specular
prefilter vs brute-force GGX Monte Carlo, FG LUT sanity (the test strategy
SURVEY.md §4 calls for)."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import gmath
from geosplatting_tpu.ops import cubemap as cm


def test_dir_uv_roundtrip():
    d = gmath.safe_normalize(jax.random.normal(jax.random.key(0), (512, 3)))
    face, u, v = cm.dir_to_cube_uv(d)
    d2 = gmath.safe_normalize(cm.cube_dir(face, u, v))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=1e-5)


def test_texel_directions_match_uv():
    r = 8
    dirs = cm.texel_directions(r)
    face, u, v = cm.dir_to_cube_uv(dirs.reshape(-1, 3))
    fu = (np.asarray(u) * 0.5 + 0.5) * r - 0.5
    fv = (np.asarray(v) * 0.5 + 0.5) * r - 0.5
    exp_f = np.repeat(np.arange(6), r * r)
    np.testing.assert_array_equal(np.asarray(face), exp_f)
    np.testing.assert_allclose(fu, np.tile(np.tile(np.arange(r), r), 6), atol=1e-4)
    np.testing.assert_allclose(fv, np.tile(np.repeat(np.arange(r), r), 6), atol=1e-4)


def test_solid_angles_sum_to_sphere():
    sa = cm.texel_solid_angles(16)
    np.testing.assert_allclose(float(sa.sum()), 4 * np.pi, rtol=1e-5)


def test_sample_at_texel_centers_is_exact():
    data = jax.random.uniform(jax.random.key(1), (6, 8, 8, 3))
    dirs = cm.texel_directions(8)
    vals = cm.sample_cubemap(data, dirs)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(data), atol=1e-5)


def test_diffuse_prefilter_constant_env():
    # constant radiance L -> irradiance/pi-normalized result must equal L
    cube = jnp.full((6, 16, 16, 3), 0.7)
    out = cm.diffuse_prefilter(cube)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-3)


def test_diffuse_prefilter_vs_bruteforce_mc():
    key = jax.random.key(2)
    cube = jax.random.uniform(key, (6, 16, 16, 3), minval=0.0, maxval=2.0)
    out = cm.diffuse_prefilter(cube)
    # brute-force cosine-hemisphere MC for a few directions
    rng = np.random.default_rng(0)
    for face, y, x in [(0, 3, 5), (2, 8, 8), (5, 15, 0)]:
        n = np.asarray(cm.texel_directions(16))[face, y, x]
        d = rng.normal(size=(20000, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = np.where((d @ n)[:, None] > 0, d, -d)  # hemisphere
        w = d @ n  # cosine weight; MC estimate of (1/pi) int L cos = mean(L * cos * 2)
        vals = np.asarray(cm.sample_cubemap(cube, jnp.asarray(d)))
        est = (vals * w[:, None]).mean(0) * 2.0
        got = np.asarray(out)[face, y, x]
        np.testing.assert_allclose(got, est, rtol=0.1, atol=0.02)


def test_specular_prefilter_vs_bruteforce_mc():
    key = jax.random.key(3)
    cube = jax.random.uniform(key, (6, 64, 64, 3), minval=0.0, maxval=2.0)
    chain = cm.build_mip_chain(cube, 16)
    rough = 0.35
    out = cm.specular_prefilter(chain, rough, num_samples=128)
    # brute force: huge-sample GGX importance sampling of the true env
    local, w, _ = cm._ggx_sample_pattern(rough, 8192)
    for face, y, x in [(1, 10, 40), (3, 32, 32)]:
        n = np.asarray(cm.texel_directions(64))[face, y, x]
        t, b = gmath.build_tangent_frame(jnp.asarray(n))
        t, b = np.asarray(t), np.asarray(b)
        d = local[:, 0:1] * t + local[:, 1:2] * b + local[:, 2:3] * n
        vals = np.asarray(cm.sample_cubemap(cube, jnp.asarray(d)))
        ref = (vals * w[:, None]).sum(0) / w.sum()
        got = np.asarray(out)[face, y, x]
        np.testing.assert_allclose(got, ref, rtol=0.15, atol=0.05)


def test_splitsum_sample_shapes_and_trilinear():
    cube = jnp.full((6, 64, 64, 3), 1.0)
    base, mips = cm.prefilter_splitsum(cube, num_samples=32)
    assert base.shape == (6, 16, 16, 3)
    assert len(mips) == 3 and mips[0].shape[1] == 64
    n = gmath.safe_normalize(jax.random.normal(jax.random.key(4), (100, 3)))
    rough = jax.random.uniform(jax.random.key(5), (100, 1))
    ld, ls = cm.sample_splitsum(base, mips, n, n, rough)
    # constant environment: both integrals return the constant
    np.testing.assert_allclose(np.asarray(ld), 1.0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(ls), 1.0, atol=5e-3)


def test_fg_lut_properties():
    (lut,) = cm.fg_lut(64, num_samples=256)
    assert lut.shape == (64, 64, 2)
    assert np.isfinite(lut).all()
    assert (lut >= 0).all() and (lut[..., 0] <= 1.5).all()
    # low roughness, high n.v -> scale near 1, bias near 0
    assert lut[0, -1, 0] > 0.9
    assert lut[0, -1, 1] < 0.1
    out = cm.sample_fg_lut(jnp.array([[0.9]]), jnp.array([[0.1]]), resolution=64)
    assert out.shape == (1, 2)


def test_prefilter_is_differentiable():
    cube = jnp.full((6, 32, 32, 3), 0.5)

    def loss(c):
        base, mips = cm.prefilter_splitsum(c, num_samples=16)
        return base.sum() + sum(m.sum() for m in mips)

    g = jax.grad(loss)(cube)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_conv_prefilter_approximates_sampled():
    """The fast blur prefilter tracks the GGX-sampled path within a loose
    tolerance (it backs the training loop only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geosplatting_tpu.ops import cubemap as cm

    key = jax.random.key(0)
    cube = jax.random.uniform(key, (6, 64, 64, 3), minval=0.1, maxval=1.5)
    # smooth the input a bit so the comparison isn't dominated by noise
    cube = cm.downsample(cube)
    cube = jnp.repeat(jnp.repeat(cube, 2, axis=1), 2, axis=2)
    b1, m1 = cm.prefilter_splitsum(cube, num_samples=64, method="sampled")
    b2, m2 = cm.prefilter_splitsum(cube, method="conv")
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)
    assert len(m1) == len(m2)
    for a, b in zip(m1, m2):
        assert a.shape == b.shape
        rel = float(jnp.mean(jnp.abs(a - b)) / (jnp.mean(jnp.abs(a)) + 1e-8))
        assert rel < 0.25, rel
