import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import gmath


def test_quat_rot_roundtrip():
    q = gmath.safe_normalize(jax.random.normal(jax.random.key(0), (128, 4)))
    r = gmath.quat2rot(q)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(3), eye.shape), atol=1e-5)
    q2 = gmath.rot2quat(r)
    # same rotation up to sign
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rotation_from_relative_vectors():
    key = jax.random.key(1)
    src = gmath.safe_normalize(jax.random.normal(key, (64, 3)))
    dst = gmath.safe_normalize(jax.random.normal(jax.random.key(2), (64, 3)))
    r = gmath.rotation_from_relative_vectors(src, dst)
    out = jnp.einsum("nij,nj->ni", r, src)
    np.testing.assert_allclose(out, dst, atol=1e-5)


def test_sh_constant_term():
    sh = jnp.zeros((4, 9, 3)).at[:, 0, :].set(1.0)
    dirs = gmath.safe_normalize(jax.random.normal(jax.random.key(3), (4, 3)))
    out = gmath.eval_sh(2, sh, dirs)
    np.testing.assert_allclose(out, gmath.SH_C0, atol=1e-6)


def test_tangent_frame_orthonormal():
    n = gmath.safe_normalize(jax.random.normal(jax.random.key(4), (256, 3)))
    t, b = gmath.build_tangent_frame(n)
    np.testing.assert_allclose(jnp.sum(t * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.sum(b * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.sum(t * b, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.norm(t, axis=-1), 1.0, atol=1e-5)


def test_latlng_uv_roundtrip():
    d = gmath.safe_normalize(jax.random.normal(jax.random.key(5), (128, 3)))
    uv = gmath.dir_to_latlng_uv(d)
    theta = uv[:, 1] * jnp.pi
    phi = (uv[:, 0] - 0.5) * 2 * jnp.pi
    d2 = gmath.latlng_dir(theta, phi)
    np.testing.assert_allclose(d, d2, atol=1e-5)


def test_cameras_rays_hit_center():
    from geosplatting_tpu.graphics.cameras import Cameras

    cam = Cameras.from_lookat(
        jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3), up=jnp.array([0.0, 1.0, 0.0]),
        width=8, height=8, fov_degrees=60.0,
    )
    origins, dirs = cam.generate_rays()
    assert origins.shape == (8, 8, 3)
    center_dir = (dirs[3, 3] + dirs[4, 4] + dirs[3, 4] + dirs[4, 3]) / 4
    np.testing.assert_allclose(
        gmath.safe_normalize(center_dir), jnp.array([0.0, 0.0, -1.0]), atol=1e-3
    )


def test_view_matrix_transforms_to_positive_z():
    from geosplatting_tpu.graphics.cameras import Cameras

    cam = Cameras.from_lookat(jnp.array([2.0, 1.0, 1.0]), jnp.zeros(3))
    vm = cam.view_matrix
    p = jnp.array([0.0, 0.0, 0.0, 1.0])
    p_cam = vm @ p
    assert p_cam[2] > 0  # in front of camera in +z convention


def test_srgb_roundtrip():
    from geosplatting_tpu.graphics import images

    x = jnp.linspace(0.0, 1.0, 256)
    np.testing.assert_allclose(images.srgb2rgb(images.rgb2srgb(x)), x, atol=1e-5)
    np.testing.assert_allclose(images.srgb2rgb(jnp.array(0.5)), 0.21404114, atol=1e-6)
