"""Functional MLP matching the reference's dataclass MLP semantics
(``rfstudio/nn/mlp.py:27``): lazy first layer (layers=[-1, ...]), skip
connections, ReLU hidden activations, configurable output activation, and
the init schemes used by GeoSplatting (kaiming-uniform, zero bias)."""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _activation(name: str):
    return {
        "none": lambda x: x,
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "softplus": jax.nn.softplus,
        "exp": jnp.exp,
    }[name]


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    layers: tuple[int, ...]             # first entry may be -1 (set at init)
    skip_connections: tuple[int, ...] = ()
    activation: str = "none"            # output activation; hidden = relu
    bias: bool = True
    initialization: str = "default"

    def init(self, key: jax.Array, input_dim: int | None = None) -> dict:
        dims = list(self.layers)
        if dims[0] == -1:
            assert input_dim is not None
            dims[0] = input_dim
        params = {}
        keys = jax.random.split(key, len(dims) - 1)
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            if i in self.skip_connections:
                din = din + dims[0]
            w = self._init_weight(keys[i], din, dout)
            params[f"w{i}"] = w
            if self.bias:
                params[f"b{i}"] = jnp.zeros((dout,))
        return params

    def _init_weight(self, key: jax.Array, din: int, dout: int) -> jnp.ndarray:
        if self.initialization == "kaiming-uniform":
            bound = float(np.sqrt(6.0 / din))  # gain sqrt(2) for relu: sqrt(6/din)
            return jax.random.uniform(key, (dout, din), minval=-bound, maxval=bound)
        if self.initialization == "kaiming-normal":
            return jax.random.normal(key, (dout, din)) * float(np.sqrt(2.0 / din))
        if self.initialization == "normal":
            return jax.random.normal(key, (dout, din)) * 0.02
        if self.initialization == "xavier-uniform":
            bound = float(np.sqrt(6.0 / (din + dout)))
            return jax.random.uniform(key, (dout, din), minval=-bound, maxval=bound)
        # torch nn.Linear default: U(-1/sqrt(din), 1/sqrt(din))
        bound = float(1.0 / np.sqrt(din))
        return jax.random.uniform(key, (dout, din), minval=-bound, maxval=bound)

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        inputs = x
        n = len(self.layers) - 1
        act = _activation(self.activation)
        for i in range(n):
            if i in self.skip_connections:
                x = jnp.concatenate((inputs, x), axis=-1)
            x = x @ params[f"w{i}"].T
            if self.bias:
                x = x + params[f"b{i}"]
            x = jax.nn.relu(x) if i < n - 1 else act(x)
        return x
