"""Optimizer-state surgery test, translated from the reference's
``tests/optim/test_optimizer.py:7-52``: optimize, densify (permute+grow
params), remap Adam moments through the index map, and keep optimizing
without blowing up."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from geosplatting_tpu.train.optim import (
    GroupOptimizers, OptimizerSpec, make_schedule, mutate_optax_state,
)


def test_schedule_exp_warmup():
    s = make_schedule(1.0, lr_decay=100, warm_up=10, mode="exp")
    np.testing.assert_allclose(s(0), 0.0, atol=1e-8)
    np.testing.assert_allclose(s(5), 0.25, atol=1e-6)
    np.testing.assert_allclose(s(10), 1.0, atol=1e-6)
    np.testing.assert_allclose(s(110), 0.5, atol=1e-6)  # half-life


def test_schedule_cos():
    s = make_schedule(2.0, lr_decay=100, warm_up=None, mode="cos")
    np.testing.assert_allclose(s(0), 2.0, atol=1e-6)
    np.testing.assert_allclose(s(100), 2.0 * 0.05, atol=1e-5)


def test_mutate_params_surgery():
    opt = GroupOptimizers({"x": OptimizerSpec(lr=1e-1)})
    params = {"x": jnp.ones((6, 3))}
    target = jnp.zeros((6, 3))
    state = opt.init(params)

    def loss(p):
        return jnp.sum((p["x"] - target) ** 2)

    for _ in range(5):
        grads = jax.grad(loss)(params)
        params, state = opt.update(grads, state, params)

    # simulate densify: keep gaussians [0, 2, 4], add 3 fresh slots
    param_map = np.array([0, 2, 4, -1, -1, -1])
    new_params = {"x": params["x"][jnp.array([0, 2, 4, 1, 1, 1])]}
    state = opt.mutate_params(state, group="x", param_map=param_map)

    adam = None
    for node in jax.tree_util.tree_leaves(
        state["x"], is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState)
    ):
        if isinstance(node, optax.ScaleByAdamState):
            adam = node
    assert adam is not None
    np.testing.assert_allclose(np.asarray(adam.mu[3:]), 0.0)
    assert np.abs(np.asarray(adam.mu[:3])).sum() > 0

    # optimization continues fine
    params = new_params
    for _ in range(5):
        grads = jax.grad(loss)(params)
        params, state = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(params["x"])).all()


def test_clear_surgery():
    opt = GroupOptimizers({"x": OptimizerSpec(lr=1e-2)})
    params = {"x": jnp.ones((4, 2))}
    state = opt.init(params)
    grads = {"x": jnp.ones((4, 2))}
    params, state = opt.update(grads, state, params)
    state = opt.mutate_params(state, group="x", clear=True)
    for leaf in jax.tree_util.tree_leaves(
        state["x"], is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState)
    ):
        if isinstance(leaf, optax.ScaleByAdamState):
            np.testing.assert_allclose(np.asarray(leaf.mu), 0.0)
