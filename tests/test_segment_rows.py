"""Unit tests for ops/segment_rows.py — the scatter-free reductions that
replaced XLA's pathological sub-128-row scatter-adds (round 4) and the
round-5 Pallas blocked cumsum that replaces XLA's log-ladder cumsum in the
prefix construction. All run in Pallas interpret mode on the CPU backend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosplatting_tpu.ops.segment_rows import (
    blocked_cumsum,
    contiguous_segment_sum,
    dense_index_add,
    gather_rows,
)


@pytest.mark.parametrize("m,c", [(7, 3), (256, 5), (1000, 17), (512, 1)])
def test_blocked_cumsum_matches_jnp(m, c):
    x = jax.random.normal(jax.random.key(0), (m, c), jnp.float32)
    got = blocked_cumsum(x)
    want = jnp.cumsum(x, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_contiguous_segment_sum():
    vals = jax.random.normal(jax.random.key(1), (50, 4), jnp.float32)
    counts = jnp.array([3, 0, 10, 7, 30, 0], jnp.int32)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    got = contiguous_segment_sum(vals, starts, counts)
    v = np.asarray(vals)
    want = np.stack([
        v[int(s):int(s) + int(n)].sum(0) for s, n in zip(starts, counts)
    ])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_contiguous_segment_sum_clamps_overrun():
    vals = jnp.ones((10, 2), jnp.float32)
    got = contiguous_segment_sum(
        vals, jnp.array([8], jnp.int32), jnp.array([5], jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(got), [[2.0, 2.0]])


def test_dense_index_add_matches_scatter():
    m, rows, c = 200, 17, 3
    idx = jax.random.randint(jax.random.key(2), (m,), 0, rows)
    vals = jax.random.normal(jax.random.key(3), (m, c), jnp.float32)
    got = dense_index_add(rows, idx, vals)
    want = jnp.zeros((rows, c)).at[idx].add(vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gather_rows_grad_matches_plain_gather():
    table = jax.random.normal(jax.random.key(4), (12, 5), jnp.float32)
    idx = jnp.array([0, 3, 3, 11, 7], jnp.int32)
    w = jax.random.normal(jax.random.key(5), (5, 5), jnp.float32)
    f1 = lambda t: jnp.sum(gather_rows(12, t, idx) * w)
    f2 = lambda t: jnp.sum(t[idx] * w)
    np.testing.assert_allclose(float(f1(table)), float(f2(table)), rtol=1e-6)
    g1, g2 = jax.grad(f1)(table), jax.grad(f2)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
