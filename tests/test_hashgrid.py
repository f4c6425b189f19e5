"""Hash-grid encoding: semantics vs a direct numpy transliteration of the
reference fallback (encoding.py:167-229), grad-scaling value-invariance, and
MLP behavior."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.models.mlp import MLPConfig
from geosplatting_tpu.ops.hashgrid import HashGridConfig, hashgrid_encode


def numpy_reference(table, x, cfg: HashGridConfig):
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    pos = x[..., None, :] * 0.5 + 0.5
    scaled = pos * cfg.scalings[:, None]
    f = np.floor(scaled)
    c = np.ceil(scaled)
    off = scaled - f

    def h(coords):
        cc = coords.astype(np.uint64) * primes
        v = (cc[..., 0] ^ cc[..., 1] ^ cc[..., 2]) % cfg.table_size
        return v.astype(np.int64) + np.arange(cfg.num_levels) * cfg.table_size

    def corner(cx, cy, cz):
        return table[h(np.stack((cx, cy, cz), -1))]

    f000 = corner(f[..., 0], f[..., 1], f[..., 2])
    f100 = corner(c[..., 0], f[..., 1], f[..., 2])
    f010 = corner(f[..., 0], c[..., 1], f[..., 2])
    f110 = corner(c[..., 0], c[..., 1], f[..., 2])
    f001 = corner(f[..., 0], f[..., 1], c[..., 2])
    f101 = corner(c[..., 0], f[..., 1], c[..., 2])
    f011 = corner(f[..., 0], c[..., 1], c[..., 2])
    f111 = corner(c[..., 0], c[..., 1], c[..., 2])
    ox, oy, oz = off[..., 0:1], off[..., 1:2], off[..., 2:3]
    fx0 = f000 * (1 - ox) + f100 * ox
    fx1 = f010 * (1 - ox) + f110 * ox
    fx2 = f001 * (1 - ox) + f101 * ox
    fx3 = f011 * (1 - ox) + f111 * ox
    fy0 = fx0 * (1 - oy) + fx1 * oy
    fy1 = fx2 * (1 - oy) + fx3 * oy
    out = fy0 * (1 - oz) + fy1 * oz
    return out.reshape(out.shape[:-2] + (-1,))


def test_matches_numpy_reference():
    cfg = HashGridConfig(num_levels=4, min_res=4, max_res=32, log2_hashmap_size=8)
    table = np.asarray(cfg.init(jax.random.key(0)))
    x = np.random.default_rng(1).uniform(-1, 1, size=(64, 3)).astype(np.float32)
    got = hashgrid_encode(jnp.asarray(table), jnp.asarray(x), cfg)
    want = numpy_reference(table, x, cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_grad_scaling_is_value_invariant():
    cfg = HashGridConfig(num_levels=4, min_res=4, max_res=32, log2_hashmap_size=8)
    cfg_scaled = HashGridConfig(
        num_levels=4, min_res=4, max_res=32, log2_hashmap_size=8,
        grad_scaling=16.0,
    )
    table = cfg.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (32, 3), minval=-1, maxval=1)
    a = hashgrid_encode(table, x, cfg)
    b = hashgrid_encode(table, x, cfg_scaled)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # grads into the table are scaled by s, input grads by 1/s (encoding.py:231-240)
    g_plain = jax.grad(lambda t: hashgrid_encode(t, x, cfg).sum())(table)
    g_scaled = jax.grad(lambda t: hashgrid_encode(t, x, cfg_scaled).sum())(table)
    np.testing.assert_allclose(
        np.asarray(g_scaled), np.asarray(g_plain) * 16.0, rtol=1e-4
    )
    # input grads: x(1/s) at the input and x(s) at the output cancel
    gx_plain = jax.grad(lambda xx: hashgrid_encode(table, xx, cfg).sum())(x)
    gx_scaled = jax.grad(lambda xx: hashgrid_encode(table, xx, cfg_scaled).sum())(x)
    np.testing.assert_allclose(
        np.asarray(gx_scaled), np.asarray(gx_plain), rtol=1e-4, atol=1e-7
    )


def test_mlp_shapes_and_skip():
    cfg = MLPConfig(layers=(-1, 16, 16, 3), skip_connections=(2,),
                    activation="sigmoid", initialization="kaiming-uniform")
    params = cfg.init(jax.random.key(0), input_dim=8)
    x = jax.random.normal(jax.random.key(1), (10, 8))
    y = cfg.apply(params, x)
    assert y.shape == (10, 3)
    assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()


def test_chamfer():
    from geosplatting_tpu.ops.chamfer import chamfer_distance, f_score

    a = jax.random.uniform(jax.random.key(0), (100, 3))
    d = float(chamfer_distance(a, a))
    assert d < 1e-4
    b = a + 0.1
    assert float(chamfer_distance(a, b)) > 0.01
    assert float(f_score(a, a, 0.01)) == 1.0
