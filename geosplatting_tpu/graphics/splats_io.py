"""Gaussian-splat PLY export/import in the standard 3DGS viewer layout.

Parity target: ``rfstudio/model/gsplat.py:80-98`` (``export_point_cloud``):
positions/normals/f_dc_*/f_rest_*/opacity/scale_*/rot_* properties — the
format consumed by every public 3DGS web viewer. Self-contained binary PLY
(the reference delegates to open3d, absent here)."""
from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from . import gmath
from .splats import Splats


def export_splats_ply(splats: Splats, path: Path | str) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    means = np.asarray(splats.means, np.float32)
    n = means.shape[0]
    normals = np.zeros_like(means)
    f_dc = np.asarray(gmath.rgb2sh(splats.colors), np.float32)
    sh_rest = np.asarray(splats.shs, np.float32).reshape(n, -1)  # [N, K*3]
    opacity = np.asarray(splats.opacities, np.float32)
    scales = np.asarray(splats.scales, np.float32)
    quats = np.asarray(
        splats.quats / np.linalg.norm(np.asarray(splats.quats), axis=-1, keepdims=True),
        np.float32,
    )

    cols = [means, normals, f_dc]
    names = ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
    if sh_rest.shape[1]:
        cols.append(sh_rest)
        names += [f"f_rest_{i}" for i in range(sh_rest.shape[1])]
    cols += [opacity, scales, quats]
    names += ["opacity", "scale_0", "scale_1", "scale_2",
              "rot_0", "rot_1", "rot_2", "rot_3"]
    data = np.concatenate(cols, axis=1).astype("<f4")

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {name}\n" for name in names)
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(data.tobytes())


def import_splats_ply(path: Path | str) -> Splats:
    import jax.numpy as jnp

    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode()
    n = 0
    names: list[str] = []
    for ln in header.split("\n"):
        if ln.startswith("element vertex"):
            n = int(ln.split()[-1])
        elif ln.startswith("property float"):
            names.append(ln.split()[-1])
    arr = np.frombuffer(
        data, dtype="<f4", count=n * len(names), offset=header_end
    ).reshape(n, len(names))
    col = {name: i for i, name in enumerate(names)}

    def grab(keys):
        return jnp.asarray(arr[:, [col[k] for k in keys]])

    rest = sorted(
        (k for k in names if k.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    shs = (
        grab(rest).reshape(n, -1, 3) if rest else jnp.zeros((n, 0, 3))
    )
    return Splats(
        means=grab(["x", "y", "z"]),
        scales=grab(["scale_0", "scale_1", "scale_2"]),
        quats=grab(["rot_0", "rot_1", "rot_2", "rot_3"]),
        colors=gmath.sh2rgb(grab(["f_dc_0", "f_dc_1", "f_dc_2"])),
        shs=shs,
        opacities=grab(["opacity"]),
    )
