"""Dataset orchestration: parser auto-recognition, split caching, batch
iterators feeding the jitted train step.

Parity target: ``rfstudio/data/dataset.py:65`` (auto dataparser recognition
:91-98, lazy per-split parse cache, infinite shuffled batch iterators
:186-213). TPU-first difference: the split lives as one stacked host numpy
array; each step's camera/image batch is device_put (and, under a mesh,
dp-sharded) — replacing the reference's whole-split-resident-on-device
iterator."""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..graphics.cameras import Cameras
from .dataparsers.blender_family import (
    BlenderDataparser,
    MaskedBlenderDataparser,
    ParsedSplit,
    ShinyBlenderDataparser,
    Syn4RelightDataparser,
    TensoIRDataparser,
)
from .dataparsers.colmap import ColmapDataparser, DPKUDataparser
from .dataparsers.real_captures import (
    IDRDataparser,
    LLFFDataparser,
    MaskedIDRDataparser,
    MaskedLLFFDataparser,
    RFMaskedRealDataparser,
    StanfordORBDataparser,
)
from .dataparsers.synthetic_meshes import (
    MeshDRDataparser,
    MeshPBRDataparser,
    MeshViewSynthesisDataparser,
    ShapeNetDataparser,
)

# recognition order mirrors the reference's registry specificity
# (rfstudio/data/dataparser/__init__.py:18-39): most specific first
DATAPARSERS = (
    Syn4RelightDataparser,
    TensoIRDataparser,
    StanfordORBDataparser,
    BlenderDataparser,
    ShinyBlenderDataparser,
    MaskedIDRDataparser,
    IDRDataparser,
    MaskedLLFFDataparser,
    LLFFDataparser,
    RFMaskedRealDataparser,
    DPKUDataparser,
    ColmapDataparser,
    MeshPBRDataparser,
    MeshViewSynthesisDataparser,
    MeshDRDataparser,
    ShapeNetDataparser,
)


def recognize_dataparser(path: Path):
    for cls in DATAPARSERS:
        if cls.recognize(path):
            return cls()
    raise ValueError(f"no dataparser recognizes {path}")


@dataclasses.dataclass
class Dataset:
    path: Path
    scale_factor: float | None = None
    dataparser: Any = None

    def __post_init__(self):
        self.path = Path(self.path)
        if self.dataparser is None:
            self.dataparser = recognize_dataparser(self.path)
        self._cache: dict[str, tuple[Cameras, np.ndarray, Any]] = {}
        self._dev_cache: dict[str, jnp.ndarray] = {}

    def device_images(self, split: str) -> jnp.ndarray:
        """All of a split's images as ONE device-resident array.

        Round 5: yielding ``jnp.asarray(images[idx])`` per training batch
        re-uploaded ~80 MB of GT through the remote-TPU tunnel every step
        (~10 GB per 100 steps), and a concurrent upload + result download
        deadlocked the tunnel at the first validation (BASELINE.md round-5
        postmortem). One chunked upload at iterator setup removes the
        per-step host->device traffic entirely; batches become on-device
        gathers. Chunks stay ~64 MB so no single tunnel request is huge."""
        if split not in self._dev_cache:
            _, images, _ = self.get_split(split)
            rows = max(1, (64 << 20) // max(int(images[0].nbytes), 1))
            self._dev_cache[split] = jnp.concatenate(
                [
                    jnp.asarray(images[s: s + rows])
                    for s in range(0, images.shape[0], rows)
                ],
                axis=0,
            )
        return self._dev_cache[split]

    def get_split(self, split: str) -> tuple[Cameras, np.ndarray, Any]:
        """(cameras [N], rgba images [N, H, W, 4] numpy, meta)."""
        if split not in self._cache:
            parsed: ParsedSplit = self.dataparser.parse(self.path, split)
            images = parsed.load_images(self.scale_factor)
            sf = self.scale_factor or 1.0
            w = int(parsed.width * sf)
            h = int(parsed.height * sf)
            n = parsed.c2w.shape[0]
            fx = parsed.fx if parsed.fx is not None else np.full((n,), parsed.focal)
            fy = parsed.fy if parsed.fy is not None else np.full((n,), parsed.focal)
            cx = parsed.cx if parsed.cx is not None else np.full((n,), parsed.width / 2.0)
            cy = parsed.cy if parsed.cy is not None else np.full((n,), parsed.height / 2.0)
            cams = Cameras(
                c2w=jnp.asarray(parsed.c2w),
                fx=jnp.asarray(fx * sf),
                fy=jnp.asarray(fy * sf),
                cx=jnp.asarray(cx * sf),
                cy=jnp.asarray(cy * sf),
                width=w,
                height=h,
                near=parsed.near,
                far=parsed.far,
            )
            self._cache[split] = (cams, images, parsed.meta)
        return self._cache[split]

    def get_size(self, split: str) -> int:
        return self.get_split(split)[0].shape[0]

    def iter_batches(
        self, split: str, batch_size: int, seed: int = 0
    ) -> Iterator[tuple[Cameras, jnp.ndarray, np.ndarray]]:
        """Infinite shuffled batches: (cameras [B], rgba [B, H, W, 4], idx)."""
        cams, _, _ = self.get_split(split)
        imgs = self.device_images(split)
        n = cams.shape[0]
        rng = np.random.default_rng(seed)
        order = rng.permutation(n)
        pos = 0
        while True:
            if pos + batch_size > n:
                order = rng.permutation(n)
                pos = 0
            idx = order[pos: pos + batch_size]
            pos += batch_size
            jidx = jnp.asarray(idx)
            yield cams[jidx], jnp.take(imgs, jidx, axis=0), idx
