"""Pytree tensor-struct base for all graphics types.

TPU-native re-think of the reference's ``TensorDataclass``
(``rfstudio/utils/tensor_dataclass.py:124``): instead of a shape-annotated
torch dataclass with in-place mutation, every graphics bundle here is an
immutable flax ``PyTreeNode`` that composes with ``jit``/``vmap``/``pjit``.
Batch semantics (indexing, cat, stack, reshape) are provided as tree-mapped
functional ops.
"""
from __future__ import annotations

from typing import Any, Sequence, TypeVar

import jax
import jax.numpy as jnp
from flax import struct

T = TypeVar("T", bound="TensorClass")

field = struct.field


def static_field(**kwargs: Any):
    """A non-pytree (hashable, static-under-jit) dataclass field."""
    return struct.field(pytree_node=False, **kwargs)


class TensorClass(struct.PyTreeNode):
    """Immutable pytree dataclass with batched-container helpers.

    Subclasses declare array fields (pytree leaves) and optionally static
    fields via :func:`static_field`. The batch shape is deduced from the
    first array leaf minus the per-field trailing event dims; subclasses
    that need exact semantics override :attr:`shape`.
    """

    # ---- batch structure -------------------------------------------------
    @property
    def shape(self) -> tuple[int, ...]:
        leaf = jax.tree_util.tree_leaves(self)[0]
        event = getattr(self, "_event_dims", 1)
        return tuple(leaf.shape[: leaf.ndim - event])

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self: T, idx) -> T:
        return jax.tree.map(lambda leaf: leaf[idx], self)

    def reshape(self: T, *new_shape: int) -> T:
        if len(new_shape) == 1 and isinstance(new_shape[0], (tuple, list)):
            new_shape = tuple(new_shape[0])
        nb = len(self.shape)
        return jax.tree.map(
            lambda leaf: leaf.reshape(tuple(new_shape) + leaf.shape[nb:]), self
        )

    def flatten(self: T) -> T:
        return self.reshape(-1)

    def take(self: T, indices: jnp.ndarray, axis: int = 0) -> T:
        return jax.tree.map(lambda leaf: jnp.take(leaf, indices, axis=axis), self)

    # ---- combination -----------------------------------------------------
    @classmethod
    def cat(cls: type[T], items: Sequence[T], axis: int = 0) -> T:
        return jax.tree.map(lambda *ls: jnp.concatenate(ls, axis=axis), *items)

    @classmethod
    def stack(cls: type[T], items: Sequence[T], axis: int = 0) -> T:
        return jax.tree.map(lambda *ls: jnp.stack(ls, axis=axis), *items)

    def where(self: T, mask: jnp.ndarray, other: T) -> T:
        """Elementwise select over the batch: ``mask ? self : other``."""

        def sel(a, b):
            m = mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim))
            return jnp.where(m, a, b)

        return jax.tree.map(sel, self, other)

    # ---- dtype/device ------------------------------------------------------
    def astype(self: T, dtype) -> T:
        return jax.tree.map(
            lambda leaf: leaf.astype(dtype) if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf,
            self,
        )


def tree_cat(items, axis: int = 0):
    return jax.tree.map(lambda *ls: jnp.concatenate(ls, axis=axis), *items)


def tree_stack(items, axis: int = 0):
    return jax.tree.map(lambda *ls: jnp.stack(ls, axis=axis), *items)
