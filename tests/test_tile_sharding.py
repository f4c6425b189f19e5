"""Band-sharded rasterization must exactly match the single-device render
(runs on the 8-virtual-device CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.graphics import gmath
from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.ops.rasterize import rasterize
from geosplatting_tpu.parallel.sharding import make_mesh
from geosplatting_tpu.parallel.tile_sharding import rasterize_tile_sharded


def test_sharded_matches_single_device():
    key = jax.random.key(0)
    ks = jax.random.split(key, 5)
    n = 400
    means = jax.random.uniform(ks[0], (n, 3), minval=-1, maxval=1)
    quats = gmath.safe_normalize(jax.random.normal(ks[1], (n, 4)))
    scales = jnp.exp(jax.random.uniform(ks[2], (n, 3), minval=-4.5, maxval=-2.0))
    opacities = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(ks[4], (n, 3))
    cam = Cameras.from_lookat(
        jnp.array([2.0, 1.0, 1.5]), jnp.zeros(3), width=96, height=80,
    )
    vm, k = cam.view_matrix, cam.intrinsic_matrix
    kw = dict(tile_capacity=256, tile_chunk=4)

    ref, ref_a, _ = rasterize(
        means, quats, scales, opacities, colors, vm, k, 96, 80, **kw
    )
    mesh = make_mesh(8, axis_name="tp")
    shard, shard_a = rasterize_tile_sharded(
        mesh, "tp", means, quats, scales, opacities, colors, vm, k, 96, 80, **kw
    )
    np.testing.assert_allclose(np.asarray(shard), np.asarray(ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(shard_a), np.asarray(ref_a), atol=3e-5)
