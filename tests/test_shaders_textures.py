"""Shader library + texture container + SG tests."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import flexicubes as fc, gmath, shaders
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.graphics.sg import SphericalGaussians, fit_sg_to_cubemap, random_sg
from geosplatting_tpu.graphics.textures import (
    Texture2D, TextureCubeMap, TextureLatLng,
)

W = H = 48


def sphere_mesh():
    grid = fc.make_grid(14, scale=1.0)
    return fc.extract(
        grid, jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.5
    ).mesh


def cam():
    return Cameras.from_lookat(
        jnp.array([0.0, 1.8, 0.8]), jnp.zeros(3), width=W, height=H,
    )


def test_shader_suite_runs():
    mesh = sphere_mesh()
    c = cam()
    outs = {
        "normal": shaders.render_normal(mesh, c),
        "flat": shaders.render_flat(mesh, c),
        "pure": shaders.render_pure(mesh, c),
        "pretty": shaders.render_pretty(mesh, c),
        "wire": shaders.render_wireframe(mesh, c),
    }
    for name, img in outs.items():
        assert img.shape == (H, W, 4), name
        assert np.isfinite(np.asarray(img)).all(), name
        assert float(img[..., 3].mean()) > 0.05, name
    d = shaders.render_depth(mesh, c)
    hit = np.asarray(d[..., 1]) > 0
    assert (np.asarray(d[..., 0])[hit] > 1.0).all()


def test_pbr_shader():
    mesh = sphere_mesh()
    from geosplatting_tpu.ops import cubemap as cm

    base, mips = cm.prefilter_splitsum(jnp.full((6, 32, 32, 3), 1.0), num_samples=16)
    v = mesh.num_vertices
    img = shaders.render_pbr(
        mesh, cam(),
        kd=jnp.full((v, 3), 0.5),
        ks=jnp.concatenate([jnp.full((v, 1), 0.4), jnp.zeros((v, 1))], -1),
        env_base=base, env_mips=mips,
    )
    assert np.isfinite(np.asarray(img)).all()
    hit = np.asarray(img[..., 3]) > 0
    # constant unit env, 0.5 albedo -> roughly 0.5 + specular
    assert 0.3 < np.asarray(img[..., :3])[hit].mean() < 0.9


def test_texture_roundtrips():
    # smooth directional signal (noise cannot survive resampling)
    h, w = 64, 128
    theta = (jnp.arange(h) + 0.5) / h * jnp.pi
    phi = ((jnp.arange(w) + 0.5) / w - 0.5) * 2 * jnp.pi
    tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
    dirs = gmath.latlng_dir(tt, pp)
    smooth = 0.5 + 0.4 * dirs  # linear in direction
    ll = TextureLatLng(data=smooth)
    cube = ll.as_cubemap(32)
    back = cube.as_latlng(width=w, height=h)
    err = float(jnp.abs(back.data[8:-8] - ll.data[8:-8]).mean())
    assert err < 0.02, err

    t2 = Texture2D(data=jax.random.uniform(jax.random.key(1), (16, 16, 3)))
    uv = (jnp.stack(jnp.meshgrid(jnp.arange(16), jnp.arange(16), indexing="xy"),
                    -1).reshape(-1, 2) + 0.5) / 16
    np.testing.assert_allclose(
        np.asarray(t2.sample(uv)).reshape(16, 16, 3), np.asarray(t2.data), atol=1e-5
    )


def test_sg_integral_and_product():
    sg = random_sg(jax.random.key(2), 8)
    # numeric integral vs closed form
    d = gmath.safe_normalize(jax.random.normal(jax.random.key(3), (20000, 3)))
    mc = np.asarray(sg.evaluate(d)).mean(0) * 4 * np.pi
    closed = np.asarray(sg.integral()).sum(0)
    np.testing.assert_allclose(mc, closed, rtol=0.1)


def test_sg_fit_constant_env():
    cube = jnp.full((6, 16, 16, 3), 0.5)
    sg = fit_sg_to_cubemap(cube, 4, key=jax.random.key(4), num_steps=200)
    d = gmath.safe_normalize(jax.random.normal(jax.random.key(5), (256, 3)))
    vals = np.asarray(sg.evaluate(d))
    np.testing.assert_allclose(vals.mean(), 0.5, atol=0.1)


def test_texture_sg_integral_vs_monte_carlo():
    """TextureSG diffuse/specular terms agree with a brute-force MC estimate
    of the rendering integral over the SG envmap (loose: the SG clamped-
    cosine fit is itself a ~10% approximation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geosplatting_tpu.graphics import gmath
    from geosplatting_tpu.graphics.sg import TextureSG

    tex = TextureSG.from_random(jax.random.key(3), 6)
    n = jnp.array([[0.0, 0.0, 1.0]])
    wo = gmath.safe_normalize(jnp.array([[0.3, 0.1, 0.9]]))
    albedo = jnp.array([[0.6, 0.4, 0.3]])
    rough = jnp.array([[0.5]])
    metal = jnp.array([[0.0]])
    diff, spec = tex.integral(n, wo, albedo=albedo, roughness=rough, metallic=metal)

    # MC reference for the diffuse term: albedo/pi * int L(w) max(n.w, 0) dw
    dirs = gmath.sample_sphere(jax.random.key(4), (200_000,))
    radiance = tex.sample(dirs)
    cos = jnp.maximum(dirs[:, 2:3], 0.0)
    mc_diff = (radiance * cos).mean(0) * 4 * jnp.pi * albedo[0] / jnp.pi
    np.testing.assert_allclose(
        np.asarray(diff[0]), np.asarray(mc_diff), rtol=0.2, atol=5e-3
    )
    assert np.isfinite(np.asarray(spec)).all()
    assert (np.asarray(spec) >= 0).all()
