"""Synthetic 2D dataset (parity: ``rfstudio/data/dataparser/syn2d_dataparser.py``
+ ``MultiView2DDataset``, ``data/dataset.py:398``): procedurally generated
flatland circle scenes rendered with the analytic ``CircleShape2D`` renderer.
No files needed — the scene is derived from a creation seed."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...graphics.toy2d import Cameras2D, CircleShape2D


@dataclasses.dataclass(frozen=True)
class Synthetic2DDataparser:
    """Generates (Cameras2D, rgba rows [N, W, 4], CircleShape2D meta)."""

    num_circles: int = 3
    num_train_views: int = 8192
    num_val_views: int = 8192
    num_test_views: int = 200
    width: int = 800
    data_creation_seed: int = 123

    def parse2d(self, split: str) -> tuple[Cameras2D, jnp.ndarray, CircleShape2D]:
        key = jax.random.key(self.data_creation_seed)
        k_shape, k_perm = jax.random.split(key)
        shape = CircleShape2D.random(k_shape, self.num_circles)
        n = self.num_train_views + self.num_val_views + self.num_test_views
        cams = Cameras2D.from_orbit(
            center=(0.0, 0.0), radius=1.0, num_samples=n,
            width=self.width, near=1e-3, far=2.0, hfov_degrees=60.0,
        )
        perm = jax.random.permutation(k_perm, n)
        cams = cams[perm]
        if split == "train":
            cams = cams[: self.num_train_views]
        elif split == "test":
            cams = cams[-self.num_test_views:]
        elif split == "val":
            cams = cams[self.num_train_views: -self.num_test_views]
        else:
            raise ValueError(split)
        images = shape.render(cams)
        return cams, images, shape


@dataclasses.dataclass
class MultiView2DDataset:
    """The 2D dataset kind: in-memory splits + shuffled batch iterator."""

    dataparser: Synthetic2DDataparser = Synthetic2DDataparser()

    def __post_init__(self):
        self._cache: dict = {}

    def get_split(self, split: str):
        if split not in self._cache:
            self._cache[split] = self.dataparser.parse2d(split)
        return self._cache[split]

    def get_size(self, split: str) -> int:
        return self.get_split(split)[0].shape[0]

    def iter_batches(self, split: str, batch_size: int, seed: int = 0):
        cams, images, _ = self.get_split(split)
        n = cams.shape[0]
        rng = np.random.default_rng(seed)
        order = rng.permutation(n)
        pos = 0
        while True:
            if pos + batch_size > n:
                order = rng.permutation(n)
                pos = 0
            idx = jnp.asarray(order[pos: pos + batch_size])
            pos += batch_size
            yield cams[idx], images[idx], np.asarray(idx)
