"""On-disk stage hand-offs: the reference's semantic export files
(``rfstudio/model/geosplat.py:839-854``, ``geosplat_mc.py:145-170``) written
by each stage's train task and consumed by the next stage's ``--load``.

Exports are (possibly nested) dicts of arrays and scalars; stored as one
``.npz`` with '/'-joined keys so a stage can be resumed on any host without
orbax metadata."""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

_NONE = "__none__"


def _flatten(d: dict, prefix: str = ""):
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            yield (f"{key}/{_NONE}", np.asarray(0)) if not v else None
            yield from _flatten(v, f"{key}/")
        elif v is None:
            yield (key, np.asarray(_NONE))
        else:
            yield (key, np.asarray(v))


def save_export(path: Path, export: dict[str, Any]) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {k: v for item in _flatten(export) if item for k, v in [item]}
    np.savez_compressed(path, **flat)
    return path


def load_export(path: Path) -> dict[str, Any]:
    path = Path(path)
    if path.is_dir():
        path = path / "export.npz"
    data = np.load(path, allow_pickle=False)
    out: dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = data[key]
        if parts[-1] == _NONE:
            continue  # empty-dict marker: the dict node already exists
        if leaf.dtype.kind in ("U", "S") and leaf.shape == ():
            node[parts[-1]] = None if str(leaf) == _NONE else str(leaf)
        else:
            node[parts[-1]] = jnp.asarray(leaf)
    return out


def find_export(output_dir: Path) -> Path:
    """Locate the export file for a run directory (or a direct file path)."""
    p = Path(output_dir)
    if p.is_file():
        return p
    for cand in (p / "export.npz", p / "export" / "export.npz"):
        if cand.exists():
            return cand
    raise FileNotFoundError(
        f"no export.npz under {p} — run the previous stage's task first"
    )
