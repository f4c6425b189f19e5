"""Point clouds: kNN, farthest-point sampling, PLY IO.

Parity target: ``rfstudio/graphics/_points.py:21,133`` (``Points`` /
``SfMPoints``: k_nearest, FPS sampling, PLY IO — the reference delegates IO
to open3d, which is not in this image, so a minimal self-contained binary
PLY reader/writer is included)."""
from __future__ import annotations

import struct
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.tensorclass import TensorClass


class Points(TensorClass):
    positions: jnp.ndarray             # [N, 3]
    colors: jnp.ndarray | None = None  # [N, 3]
    normals: jnp.ndarray | None = None

    @property
    def shape(self):
        return self.positions.shape[:-1]

    def k_nearest(self, k: int, chunk: int = 4096) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(distances [N, k], indices [N, k]) to the k nearest other points."""
        pts = self.positions
        n = pts.shape[0]
        p_sq = jnp.sum(pts * pts, -1)

        def one(block):
            d2 = jnp.sum(block * block, -1)[:, None] - 2 * block @ pts.T + p_sq[None]
            neg, idx = jax.lax.top_k(-d2, k + 1)
            return jnp.sqrt(jnp.maximum(-neg[:, 1:], 0.0)), idx[:, 1:]

        pad = (-n) % chunk
        padded = jnp.concatenate([pts, jnp.zeros((pad, 3))]) if pad else pts
        d, i = jax.lax.map(one, padded.reshape(-1, chunk, 3))
        return d.reshape(-1, k)[:n], i.reshape(-1, k)[:n]

    def farthest_point_sample(self, num_samples: int) -> jnp.ndarray:
        """FPS indices [num_samples] via iterative max-min distance."""
        pts = self.positions
        n = pts.shape[0]

        def body(carry, _):
            dist, last = carry
            d_new = jnp.sum((pts - pts[last]) ** 2, -1)
            dist = jnp.minimum(dist, d_new)
            nxt = jnp.argmax(dist)
            return (dist, nxt), nxt

        init = (jnp.full((n,), jnp.inf), jnp.asarray(0, jnp.int32))
        _, picks = jax.lax.scan(body, init, None, length=num_samples - 1)
        return jnp.concatenate([jnp.zeros((1,), picks.dtype), picks])

    # --- PLY IO ----------------------------------------------------------------
    def export_ply(self, path: Path | str) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        n = self.positions.shape[0]
        props = ["property float x", "property float y", "property float z"]
        cols = []
        if self.colors is not None:
            props += [f"property uchar {c}" for c in ("red", "green", "blue")]
        if self.normals is not None:
            props += [f"property float n{c}" for c in ("x", "y", "z")]
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n" + "\n".join(props) + "\nend_header\n"
        )
        with open(path, "wb") as f:
            f.write(header.encode())
            pos = np.asarray(self.positions, np.float32)
            col = (
                (np.clip(np.asarray(self.colors), 0, 1) * 255).astype(np.uint8)
                if self.colors is not None else None
            )
            nrm = np.asarray(self.normals, np.float32) if self.normals is not None else None
            for i in range(n):
                f.write(struct.pack("<3f", *pos[i]))
                if col is not None:
                    f.write(struct.pack("<3B", *col[i]))
                if nrm is not None:
                    f.write(struct.pack("<3f", *nrm[i]))
        del cols

    @classmethod
    def from_ply(cls, path: Path | str) -> "Points":
        with open(path, "rb") as f:
            data = f.read()
        header_end = data.index(b"end_header\n") + len(b"end_header\n")
        header = data[:header_end].decode()
        lines = header.strip().split("\n")
        n = 0
        props: list[tuple[str, str]] = []
        binary = "binary_little_endian" in header
        in_vertex = False
        for ln in lines:
            if ln.startswith("element"):
                in_vertex = ln.split()[1] == "vertex"
                if in_vertex:
                    n = int(ln.split()[-1])
            elif ln.startswith("property") and in_vertex:
                parts = ln.split()
                props.append((parts[1], parts[2]))
        fmt_map = {"float": ("f", 4), "uchar": ("B", 1), "double": ("d", 8),
                   "int": ("i", 4), "float32": ("f", 4), "uint8": ("B", 1)}
        if binary:
            fmt = "<" + "".join(fmt_map[t][0] for t, _ in props)
            size = struct.calcsize(fmt)
            rows = [
                struct.unpack_from(fmt, data, header_end + i * size)
                for i in range(n)
            ]
            arr = np.asarray(rows, np.float64)
        else:
            body = data[header_end:].decode().split()
            arr = np.asarray(body, np.float64).reshape(n, len(props))
        names = [p[1] for p in props]

        def grab(keys, scale=1.0):
            if not all(k in names for k in keys):
                return None
            idx = [names.index(k) for k in keys]
            return jnp.asarray(arr[:, idx] * scale, jnp.float32)

        return cls(
            positions=grab(["x", "y", "z"]),
            colors=grab(["red", "green", "blue"], 1 / 255.0),
            normals=grab(["nx", "ny", "nz"]),
        )



class Rays(TensorClass):
    origins: jnp.ndarray     # [..., 3]
    directions: jnp.ndarray  # [..., 3]

    @property
    def shape(self):
        return self.origins.shape[:-1]

    def at(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.origins + self.directions * t[..., None]

    def stratified_samples(
        self, key: jax.Array, num_samples: int, near: float, far: float
    ) -> jnp.ndarray:
        """Stratified t values [..., S] (parity: _rays.py:50 RaySamples)."""
        bins = jnp.linspace(near, far, num_samples + 1)
        lo = bins[:-1]
        width = bins[1:] - bins[:-1]
        u = jax.random.uniform(key, self.shape + (num_samples,))
        return lo + u * width


def volume_rendering_weights(
    densities: jnp.ndarray, deltas: jnp.ndarray
) -> jnp.ndarray:
    """Volume rendering weights from densities (get_weighted, _rays.py:82)."""
    alpha = 1.0 - jnp.exp(-densities * deltas)
    log_t = jnp.cumsum(jnp.log1p(-jnp.minimum(alpha, 0.9999)), axis=-1)
    t_excl = jnp.exp(log_t - jnp.log1p(-jnp.minimum(alpha, 0.9999)))
    return alpha * t_excl
