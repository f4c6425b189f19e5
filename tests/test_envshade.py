"""MC env shading golden tests: light CDF sampling statistics, MIS estimator
vs analytic integrals on constant/simple environments, SDF visibility, and
the bilateral denoiser."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.ops import envshade as es
from geosplatting_tpu.ops.denoise import bilateral_denoise
from geosplatting_tpu.ops.sdf_visibility import make_sdf_visibility, sample_sdf_grid


def constant_light(value=1.0, h=32, w=64):
    return es.compute_light_pdf(jnp.full((h, w, 3), value))


def test_light_pdf_tables_normalized():
    light = constant_light()
    assert abs(float(light.pdf.sum()) - 1.0) < 1e-5
    np.testing.assert_allclose(float(light.rows[-1]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(light.cols[:, -1]), 1.0, atol=1e-5)


def test_light_sampling_statistics():
    # sampling from a single bright texel: all directions must point at it
    data = jnp.full((16, 32, 3), 1e-3).at[4, 7].set(100.0)
    light = es.compute_light_pdf(data)
    key = jax.random.key(0)
    u = jax.random.uniform(key, (2048,))
    v = jax.random.uniform(jax.random.fold_in(key, 1), (2048,))
    dirs = es.sample_light(light, u, v)
    tc = es._dir_to_tc(dirs)
    x = np.asarray(tc[:, 0] * 32).astype(int)
    y = np.asarray(tc[:, 1] * 16).astype(int)
    frac = ((x == 7) & (y == 4)).mean()
    assert frac > 0.95, frac


def test_constant_env_diffuse_integral():
    """For constant radiance L, no shadows, pure-diffuse material:
    diffuse_accum = integral L (n.l)/pi dl = L (the MC estimator is unbiased)."""
    light = constant_light(2.0)
    n = 512
    key = jax.random.key(1)
    normals = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    positions = jnp.zeros((n, 3))
    kd = jnp.full((n, 3), 0.8)
    arm = jnp.concatenate(
        [jnp.zeros((n, 1)), jnp.full((n, 1), 0.7), jnp.zeros((n, 1))], -1
    )
    diff, spec, resi = es.env_shade(
        key, positions, normals, jnp.array([0.0, 3.0, 0.0]), kd, arm, light,
        num_samples_x=4,
    )
    np.testing.assert_allclose(np.asarray(diff).mean(), 2.0, rtol=0.05)
    np.testing.assert_allclose(np.asarray(resi), 0.0, atol=1e-6)
    assert np.isfinite(np.asarray(spec)).all()
    assert np.asarray(spec).mean() > 0


def test_env_shade_gradients():
    light = es.compute_light_pdf(
        jax.random.uniform(jax.random.key(2), (16, 32, 3), minval=0.1, maxval=2.0)
    )
    n = 64
    normals = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    positions = jax.random.normal(jax.random.key(3), (n, 3)) * 0.1
    kd = jnp.full((n, 3), 0.6)
    arm = jnp.concatenate(
        [jnp.zeros((n, 1)), jnp.full((n, 1), 0.4), jnp.full((n, 1), 0.3)], -1
    )

    def loss(kd, arm, data):
        lp = es.compute_light_pdf(data)
        d, s, _ = es.env_shade(
            jax.random.key(4), positions, normals, jnp.array([0.0, 3.0, 0.0]),
            kd, arm, lp, num_samples_x=2,
        )
        return (d * kd).sum() + s.sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(kd, arm, light.data)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert np.abs(np.asarray(gi)).sum() > 0


def test_sdf_visibility_sphere_shadow():
    res = (24, 24, 24)
    rx = 24
    idx = np.arange((rx + 1) ** 3)
    x = idx % (rx + 1)
    y = (idx // (rx + 1)) % (rx + 1)
    z = idx // ((rx + 1) ** 2)
    pts = (np.stack([x, y, z], -1) / rx * 2 - 1) * 1.0
    sdf = jnp.asarray(np.linalg.norm(pts, axis=-1) - 0.4)
    vis = make_sdf_visibility(sdf, res, 1.0)
    # from a point above the sphere: looking up = clear, down through = blocked
    origins = jnp.tile(jnp.array([[0.0, 0.0, 0.8]]), (2, 1))
    dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    v = np.asarray(vis(origins, dirs))
    assert v[0] > 0.9, v
    assert v[1] < 0.1, v
    # grid sampling approximates the sphere sdf
    q = jnp.array([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0]])
    d = np.asarray(sample_sdf_grid(sdf, res, 1.0, q))
    np.testing.assert_allclose(d, [-0.4, 0.5], atol=0.05)


def test_packed_cell_samplers_match_gather_reference():
    """The packed [cells, 8] row-gather samplers (the stage-2 crash fix —
    one gather per point per trace step instead of eight) must reproduce
    the naive per-corner gathers exactly, including clamp-to-edge and
    outside-the-box behavior."""
    from geosplatting_tpu.ops.sdf_visibility import (
        _pack_cells, _trilerp_w8,
    )

    key = jax.random.key(0)
    r = 9
    sdf = jax.random.normal(key, ((r + 1) ** 3,)) * 0.3
    pts = jax.random.uniform(
        jax.random.key(1), (4096, 3), minval=-1.4, maxval=1.4
    )
    ref = sample_sdf_grid(sdf, (r, r, r), 1.0, pts)
    corners = _pack_cells(sdf.reshape(r + 1, r + 1, r + 1))
    g = (pts * 0.5 + 0.5) * r
    g0 = jnp.floor(g).astype(jnp.int32)
    g0c = jnp.clip(g0, 0, r - 1)
    cell = (g0c[..., 2] * r + g0c[..., 1]) * r + g0c[..., 0]
    vals = jnp.sum(corners[cell] * _trilerp_w8(g - g0), -1)
    outside = jnp.maximum(jnp.abs(pts) - 1.0, 0.0)
    d_box = jnp.sqrt(jnp.sum(outside * outside, -1) + 1e-12)
    got = jnp.where(d_box > 0, vals + d_box, vals)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

    # occupancy variant: edge-padded table == per-corner clamp-to-edge
    occ = jax.random.uniform(jax.random.key(2), (8, 8, 8))
    rr = 8
    p = jax.random.uniform(jax.random.key(3), (4096, 3), minval=-1.2, maxval=1.2)
    gg = (p * 0.5 + 0.5) * rr - 0.5
    gg0 = jnp.floor(gg).astype(jnp.int32)
    fr = gg - gg0
    ref_o = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                i = jnp.clip(gg0 + jnp.asarray([dx, dy, dz]), 0, rr - 1)
                w = (
                    (fr[..., 0] if dx else 1 - fr[..., 0])
                    * (fr[..., 1] if dy else 1 - fr[..., 1])
                    * (fr[..., 2] if dz else 1 - fr[..., 2])
                )
                ref_o = ref_o + w * occ[i[..., 2], i[..., 1], i[..., 0]]
    cn = _pack_cells(jnp.pad(occ, 1, mode="edge"))
    b = jnp.clip(gg0, -1, rr - 1) + 1
    cell = (b[..., 2] * (rr + 1) + b[..., 1]) * (rr + 1) + b[..., 0]
    got_o = jnp.sum(cn[cell] * _trilerp_w8(fr), -1)
    np.testing.assert_allclose(np.asarray(ref_o), np.asarray(got_o), atol=1e-5)


def test_bilateral_denoise_smooths_noise_preserves_edges():
    key = jax.random.key(5)
    h = w = 32
    # two flat regions with an edge in both color and normal
    left = jnp.zeros((h, w // 2, 3))
    right = jnp.ones((h, w // 2, 3))
    clean = jnp.concatenate([left, right], axis=1)
    noisy = clean + jax.random.normal(key, clean.shape) * 0.2
    normal = jnp.concatenate(
        [jnp.tile(jnp.array([0.0, 0, 1]), (h, w // 2, 1)),
         jnp.tile(jnp.array([1.0, 0, 0]), (h, w // 2, 1))], axis=1,
    )
    depth = jnp.ones((h, w, 1))
    out = bilateral_denoise(noisy, normal, depth, sigma=2.0)
    # noise reduced
    err_in = float(jnp.abs(noisy - clean).mean())
    err_out = float(jnp.abs(out - clean).mean())
    assert err_out < err_in * 0.5
    # edge preserved: column w/2-1 stays near 0, w/2 stays near 1
    assert float(out[:, w // 2 - 1].mean()) < 0.15
    assert float(out[:, w // 2].mean()) > 0.85


def test_mesh_visibility_occludes():
    """Occupancy-grid mesh visibility: rays crossing a dense cube shell are
    attenuated, rays escaping outward are not."""
    import jax
    import jax.numpy as jnp

    from geosplatting_tpu.graphics.mesh import TriangleMesh
    from geosplatting_tpu.ops.sdf_visibility import make_mesh_visibility

    v = jnp.array(
        [[x, y, z] for x in (-0.4, 0.4) for y in (-0.4, 0.4) for z in (-0.4, 0.4)],
        jnp.float32,
    )
    f = jnp.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        jnp.int32,
    )
    mesh = TriangleMesh(vertices=v, indices=f)
    vis = make_mesh_visibility(mesh, jax.random.key(0), resolution=48, scale=1.0)
    origins = jnp.array([[0.9, 0.0, 0.0], [0.9, 0.0, 0.0]])
    dirs = jnp.array([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    out = vis(origins, dirs)
    assert float(out[0]) < 0.2, f"ray through cube not shadowed: {out}"
    assert float(out[1]) > 0.9, f"escaping ray shadowed: {out}"
