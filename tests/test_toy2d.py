"""2D toy pipeline: camera geometry, circle rendering, Syn2D dataset."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.data.dataparsers.toy2d import (
    MultiView2DDataset, Synthetic2DDataparser,
)
from geosplatting_tpu.graphics.toy2d import Cameras2D, CircleShape2D


def test_camera_rays_point_at_target():
    cams = Cameras2D.from_orbit(
        center=(0.0, 0.0), radius=1.0, num_samples=4, width=64,
        hfov_degrees=60.0,
    )
    o, d = cams.generate_rays()
    assert o.shape == (4, 64, 2) and d.shape == (4, 64, 2)
    # the central ray passes (near) the orbit center
    mid = 32
    closest = jnp.linalg.norm(
        o[:, mid] - jnp.sum(o[:, mid] * d[:, mid], -1, keepdims=True) * d[:, mid],
        axis=-1,
    )
    assert float(closest.max()) < 0.05


def test_circle_render_hits_and_misses():
    shape = CircleShape2D(
        origins=jnp.array([[0.0, 0.0]]), radius=jnp.array([[0.3]])
    )
    cams = Cameras2D.from_lookat(
        jnp.array([[1.0, 0.0]]), jnp.zeros((1, 2)), width=128,
        hfov_degrees=60.0, far=2.0,
    )
    rgba = shape.render(cams)
    assert rgba.shape == (1, 128, 4)
    a = np.asarray(rgba[0, :, 3])
    assert a[64] == 1.0        # central ray hits the circle
    assert a[0] == 0.0 and a[-1] == 0.0  # edge rays miss
    # hit positions shade from the circle's front surface (x ~ 0.3)
    assert np.isfinite(np.asarray(rgba)).all()

    vis = shape.visualize(width=32, height=32)
    assert vis.shape == (32, 32, 4)
    assert float(vis[..., 3].sum()) > 0


def test_syn2d_dataset():
    ds = MultiView2DDataset(
        Synthetic2DDataparser(
            num_train_views=16, num_val_views=8, num_test_views=4, width=64
        )
    )
    cams, images, shape = ds.get_split("train")
    assert cams.shape == (16,)
    assert images.shape == (16, 64, 4)
    assert ds.get_size("test") == 4
    it = ds.iter_batches("train", 4, seed=0)
    c, im, idx = next(it)
    assert c.shape == (4,) and im.shape == (4, 64, 4) and len(idx) == 4
    # alpha coverage: some rays hit, some miss
    a = np.asarray(images[..., 3])
    assert 0.05 < a.mean() < 0.95
