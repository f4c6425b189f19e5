"""Gradient sanitization: zero out non-finite gradient entries.

The stage-2 MC-shading backward has produced isolated non-finite gradient
entries when compiled for TPU (the same state and code are clean on CPU —
an XLA-TPU fusion/fast-math artifact still under investigation; see
tests + /tmp bisect history in round-1 logs). Training must not be poisoned
by a handful of bad entries, so trainers zero them and report a count —
the TPU analog of the reference's ``detect_anomaly`` finite checks
(``engine/train.py:94-95``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sanitize(grads):
    """Returns (sanitized grads, scalar count of non-finite entries)."""
    leaves = jax.tree_util.tree_leaves(grads)
    count = sum(jnp.sum(~jnp.isfinite(leaf)) for leaf in leaves)
    clean = jax.tree.map(
        lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
    )
    return clean, count
