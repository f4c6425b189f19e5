"""Monotone curve mapping (parity: rfstudio/nn/utils/curve_mapping.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.utils.curve_mapping import (
    apply_curve, curve_bins, init_curve,
)


def test_curve_monotone_and_normalized():
    p = init_curve(jax.random.key(0), 10, 3)
    x = jnp.linspace(0, 1, 64)[:, None].repeat(3, 1)
    y = apply_curve(p, x)
    assert y.shape == x.shape
    d = np.diff(np.asarray(y), axis=0)
    assert (d >= -1e-6).all()                     # monotone
    np.testing.assert_allclose(np.asarray(y[0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y[-1]), 1.0, atol=1e-3)
    b = curve_bins(p)
    assert b.shape == (10, 3)
    np.testing.assert_allclose(np.asarray(b[-1]), 1.0, atol=1e-6)


def test_curve_gradients_and_distributions():
    p = init_curve(jax.random.key(1), 6, 2)
    x = jax.random.uniform(jax.random.key(2), (32, 2))
    for dist in ("uniform", "log", "exp"):
        g = jax.grad(
            lambda q: apply_curve(q, x, point_distribution=dist).sum()
        )(p)
        assert np.isfinite(np.asarray(g["log_gaps"])).all()
