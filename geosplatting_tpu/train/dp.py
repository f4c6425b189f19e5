"""Data-parallel (camera-batch) gradients for the GeoSplat stage trainers.

The reference is single-GPU and scales the per-step camera batch with
gradient accumulation (rfstudio/trainer/base_trainer.py:36); the TPU-native
replacement shards the batch over a ``dp`` mesh axis (SURVEY §2.11). The
render path's per-camera ``lax.map`` is a *sequential* scan, so sharding
annotations alone cannot split it — ``shard_map`` runs each device's scan
over its local camera shard and one ``pmean`` over ICI merges gradients.

Exactness contract (tested in tests/test_dp_geosplat.py): with the same
per-pixel random background, ``dp_value_and_grad`` over n devices equals the
single-device gradients up to float reassociation, because every loss term
is a mean over equal-size camera shards (SSIM-L1, mask MSE) or a function of
params only (the regularizers, identical on every device).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P


def dp_value_and_grad(
    local_loss: Callable[..., tuple[Any, tuple[Any, Any]]],
    params: Any,
    mesh: Mesh,
    *sharded_args: Any,
    axis_name: str = "dp",
) -> tuple[Any, Any, Any]:
    """shard_map'd grad over a camera-sharded batch.

    ``local_loss(params, *shard_args) -> (total, (mean_aux, max_aux))`` must
    compute per-shard MEANS for every batch-dependent term in ``total`` and
    ``mean_aux`` (they are pmean'd — exactly the full-batch values when
    shards are equal size, since params-only terms are identical across
    devices and means decompose); ``max_aux`` observables (pair counts etc.)
    are pmax'd, matching the single-device max-over-cameras aggregation.
    Returns ``(grads, mean_aux, max_aux)``.
    """
    def device_fn(p, *args):
        grads, (mean_aux, max_aux) = jax.grad(
            lambda q: local_loss(q, *args), has_aux=True
        )(p)
        grads = jax.lax.pmean(grads, axis_name)
        mean_aux = jax.lax.pmean(mean_aux, axis_name)
        max_aux = jax.tree.map(
            lambda x: jax.lax.pmax(x, axis_name), max_aux
        )
        return grads, mean_aux, max_aux

    in_specs = (P(),) + tuple(P(axis_name) for _ in sharded_args)
    return jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(params, *sharded_args)
