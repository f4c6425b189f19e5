"""Multi-chip parallelism: device meshes and the data-parallel train step.

The reference is strictly single-GPU (SURVEY.md §2.11); parallelism here is
greenfield and TPU-native: a ``jax.sharding.Mesh`` with a ``dp`` axis shards
the per-step camera batch (replacing the reference's gradient accumulation,
``base_trainer.py:36``), params/optimizer state are replicated, and XLA
inserts the gradient ``psum`` over ICI from the sharding annotations alone.
A ``gs`` axis (Gaussian-dimension sharding for multi-million-Gaussian prior
scenes) hangs off the same mesh.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = "dp") -> Any:
    """Place a leading-batch pytree so the batch axis is split over ``axis_name``."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, sharding)
        if hasattr(leaf, "ndim") and leaf.ndim >= 1
        else leaf,
        tree,
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), tree)
