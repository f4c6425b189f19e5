"""Splat PLY roundtrip + loss library tests."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics.splats import Splats
from geosplatting_tpu.graphics.splats_io import export_splats_ply, import_splats_ply
from geosplatting_tpu.train import losses


def test_splats_ply_roundtrip(tmp_path):
    s = Splats.random(jax.random.key(0), 32, sh_degree=2, random_scale=0.5)
    export_splats_ply(s, tmp_path / "g.ply")
    back = import_splats_ply(tmp_path / "g.ply")
    np.testing.assert_allclose(back.means, s.means, atol=1e-6)
    np.testing.assert_allclose(back.scales, s.scales, atol=1e-6)
    np.testing.assert_allclose(back.colors, s.colors, atol=1e-5)
    np.testing.assert_allclose(back.shs, s.shs, atol=1e-6)
    np.testing.assert_allclose(back.opacities, s.opacities, atol=1e-6)
    # quats normalized on export
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(back.quats), axis=-1), 1.0, atol=1e-5
    )


def test_losses():
    a = jnp.zeros((8, 8, 3))
    b = jnp.ones((8, 8, 3)) * 0.5
    assert abs(float(losses.l1(a, b)) - 0.5) < 1e-6
    assert abs(float(losses.l2(a, b)) - 0.25) < 1e-6
    assert float(losses.psnr(b, b)) > 100
    mask = jnp.zeros((8, 8, 1)).at[:4].set(1.0)
    m = losses.masked_l1(a, b, mask)
    assert np.isfinite(float(m))
    h = losses.hdr_l1(jnp.full((4, 4, 3), 10.0), jnp.full((4, 4, 3), 10.0))
    assert float(h) < 1e-6


def test_downloader_offline_message(tmp_path):
    import pytest
    from geosplatting_tpu.data.downloaders import Downloader

    with pytest.raises(RuntimeError, match="manually"):
        Downloader(dataset="blender", output_dir=tmp_path).run()
