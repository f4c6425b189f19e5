"""Per-group optimizers with LR schedules and densification state surgery.

Parity target: ``rfstudio/optim/optimizer.py`` — declarative per-group specs
(category/lr/eps/max_norm/lr_decay/warm_up, :48-68), exp/cos LR schedules
with quadratic warmup (:16-44), and ``mutate_params`` (:121-191): after a
densify/cull the Adam first/second moments are re-indexed through an index
permutation, zeroing the slots of freshly created Gaussians.

TPU-first shape: one optax ``GradientTransformation`` per named group over a
pytree-of-groups; state surgery is a pure function over the optax state.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_schedule(
    lr: float,
    *,
    lr_decay: int | None = None,
    warm_up: int | None = None,
    mode: str = "exp",
) -> optax.Schedule:
    """exp: quadratic warmup then exponential half-life decay; cos: linear
    warmup then cosine decay to 5% (optimizer.py:22-41)."""

    def exp_decay(step):
        step = jnp.asarray(step, jnp.float32)
        base = jnp.ones_like(step)
        if warm_up is not None:
            base = jnp.where(step < warm_up, (step / warm_up) ** 2, 1.0)
        if lr_decay is not None:
            lam = np.log(2.0) / lr_decay
            off = 0.0 if warm_up is None else float(warm_up)
            decay = jnp.exp(-lam * jnp.maximum(step - off, 0.0))
            base = jnp.where(
                (step < warm_up) if warm_up is not None else False, base, decay
            )
        return lr * base

    def cos_decay(step):
        step = jnp.asarray(step, jnp.float32)
        base = jnp.ones_like(step)
        if warm_up is not None:
            base = jnp.where(step < warm_up, step / warm_up, 1.0)
        if lr_decay is not None:
            off = 0.0 if warm_up is None else float(warm_up)
            progress = jnp.maximum(step - off, 0.0) / lr_decay
            alpha = 0.05
            decay = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
            base = jnp.where(
                (step < warm_up) if warm_up is not None else False, base, decay
            )
        return lr * base

    return exp_decay if mode == "exp" else cos_decay


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    """Declarative per-group optimizer config (optim/optimizer.py:48-68)."""

    lr: float
    eps: float = 1e-15
    max_norm: float | None = None
    lr_decay: int | None = None
    warm_up: int | None = None
    lr_decay_mode: str = "exp"
    b1: float = 0.9
    b2: float = 0.999

    def build(self) -> optax.GradientTransformation:
        sched = make_schedule(
            self.lr, lr_decay=self.lr_decay, warm_up=self.warm_up,
            mode=self.lr_decay_mode,
        )
        chain = []
        if self.max_norm is not None:
            chain.append(optax.clip_by_global_norm(self.max_norm))
        chain.append(
            optax.scale_by_adam(b1=self.b1, b2=self.b2, eps=self.eps)
        )
        chain.append(optax.scale_by_schedule(lambda c: -sched(c)))
        return optax.chain(*chain)


class GroupOptimizers:
    """A dict of named optimizer groups over a matching dict of param pytrees.

    The params pytree must be a mapping {group_name: params_subtree}; grads
    passed to :meth:`update` mirror that structure.
    """

    def __init__(self, specs: Mapping[str, OptimizerSpec]):
        self.specs = dict(specs)
        self.txs = {k: s.build() for k, s in self.specs.items()}

    def init(self, params: Mapping[str, Any]) -> dict[str, Any]:
        return {k: self.txs[k].init(params[k]) for k in self.txs}

    def update(
        self,
        grads: Mapping[str, Any],
        state: Mapping[str, Any],
        params: Mapping[str, Any],
    ) -> tuple[dict[str, Any], dict[str, Any]]:
        new_params, new_state = {}, {}
        for k, tx in self.txs.items():
            updates, new_state[k] = tx.update(grads[k], state[k], params[k])
            new_params[k] = optax.apply_updates(params[k], updates)
        return new_params, new_state

    # ---- densification state surgery ------------------------------------------
    def mutate_params(
        self,
        state: Mapping[str, Any],
        *,
        group: str,
        param_map: np.ndarray | jnp.ndarray | None = None,
        clear: bool = False,
    ) -> dict[str, Any]:
        """Re-index Adam moments of ``group`` through ``param_map`` (new slot ->
        old index, -1 => zero), or zero them all with ``clear`` — the JAX
        analog of optimizer.py:155-186."""
        new_state = dict(state)
        new_state[group] = mutate_optax_state(
            state[group], param_map=param_map, clear=clear
        )
        return new_state


def mutate_optax_state(state: Any, *, param_map=None, clear: bool = False) -> Any:
    def remap_leaf(leaf: jnp.ndarray) -> jnp.ndarray:
        if clear:
            return jnp.zeros_like(leaf)
        idx = jnp.asarray(param_map)
        safe = jnp.clip(idx, 0, leaf.shape[0] - 1)
        out = leaf[safe]
        mask = (idx >= 0).reshape((-1,) + (1,) * (out.ndim - 1))
        return jnp.where(mask, out, 0.0).astype(leaf.dtype)

    def visit(node: Any) -> Any:
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=node.count,
                mu=jax.tree.map(remap_leaf, node.mu),
                nu=jax.tree.map(remap_leaf, node.nu),
            )
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(visit(x) for x in node)
        if hasattr(node, "_fields"):  # other namedtuple states: untouched
            return node
        return node

    return visit(state)
