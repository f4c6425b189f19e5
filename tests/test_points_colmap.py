"""Points (kNN/FPS/PLY), Rays, COLMAP parser, selectors."""
import struct

import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.data.dataparsers.colmap import ColmapDataparser
from geosplatting_tpu.data.selector import FanSelector, SliceSelector
from geosplatting_tpu.graphics.points import Points, Rays, volume_rendering_weights


def test_knn_and_fps():
    pts = Points(positions=jax.random.uniform(jax.random.key(0), (200, 3)))
    d, i = pts.k_nearest(3)
    assert d.shape == (200, 3)
    assert (np.asarray(d) >= 0).all()
    assert not (np.asarray(i) == np.arange(200)[:, None]).any()  # excludes self
    picks = pts.farthest_point_sample(10)
    assert len(np.unique(np.asarray(picks))) == 10


def test_ply_roundtrip(tmp_path):
    pts = Points(
        positions=jax.random.uniform(jax.random.key(1), (50, 3)),
        colors=jax.random.uniform(jax.random.key(2), (50, 3)),
        normals=jax.random.normal(jax.random.key(3), (50, 3)),
    )
    pts.export_ply(tmp_path / "x.ply")
    back = Points.from_ply(tmp_path / "x.ply")
    np.testing.assert_allclose(back.positions, pts.positions, atol=1e-6)
    np.testing.assert_allclose(back.colors, pts.colors, atol=1 / 255)
    np.testing.assert_allclose(back.normals, pts.normals, atol=1e-6)


def test_volume_rendering_weights():
    dens = jnp.array([[1e9, 1.0, 1.0]])
    w = volume_rendering_weights(dens, jnp.ones((1, 3)))
    assert float(w[0, 0]) > 0.99  # opaque first sample takes all


def write_colmap_fixture(root):
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    (root / "images").mkdir()
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<4d", 60.0, 60.0, 32.0, 24.0))
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<I", i + 1))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
            f.write(struct.pack("<3d", 0.0, 0.0, float(i)))
            f.write(struct.pack("<I", 1))
            f.write(f"im{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", 0.1, 0.2, 0.3))
            f.write(struct.pack("<3B", 255, 128, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))
    from geosplatting_tpu.data.io import dump_float32_image
    for i in range(3):
        dump_float32_image(root / "images" / f"im{i}.png",
                           np.zeros((48, 64, 3), np.float32))


def test_colmap_parser(tmp_path):
    write_colmap_fixture(tmp_path)
    assert ColmapDataparser.recognize(tmp_path)
    parsed = ColmapDataparser().parse(tmp_path, "train")
    assert parsed.c2w.shape[0] == 2  # every 8th -> index 0 goes to test
    assert parsed.width == 64 and parsed.height == 48
    assert parsed.meta["points"].shape == (2, 3)
    parsed_test = ColmapDataparser().parse(tmp_path, "test")
    assert parsed_test.c2w.shape[0] == 1


def test_selectors():
    c2w = np.zeros((8, 3, 4), np.float32)
    angles = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    c2w[:, 0, 3] = np.cos(angles)
    c2w[:, 1, 3] = np.sin(angles)
    fan = FanSelector(center_degrees=0.0, half_angle_degrees=50.0)
    picked = fan.select(8, c2w)
    assert 0 in picked and 4 not in picked
    sl = SliceSelector(start=2, stop=6, step=2)
    np.testing.assert_array_equal(sl.select(8), [2, 4])


def test_rays():
    r = Rays(origins=jnp.zeros((4, 3)), directions=jnp.ones((4, 3)))
    t = r.stratified_samples(jax.random.key(0), 8, 0.1, 1.0)
    assert t.shape == (4, 8)
    assert float(t.min()) >= 0.1 and float(t.max()) <= 1.0
    assert (np.diff(np.asarray(t), axis=-1) > 0).all()
