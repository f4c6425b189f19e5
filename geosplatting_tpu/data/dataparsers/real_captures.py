"""Real-capture dataparsers: LLFF (+masked), IDR/DTU (+masked), Stanford-ORB,
and the RF masked-real dump format.

Parity targets:
- ``rfstudio/data/dataparser/llff_dataparser.py:19-187``: poses_bounds.npy
  [N, 17] with (y, -x, z) axis shuffle, 8/1/1 modulo split, mean-centering
  and 1.1/max rescale into the [-1, 1]^3 box, per-camera fx/fy from hwf.
- ``idr_dataparser.py:19-231``: cameras_large.npz projection matrices
  decomposed by cv2 (``_load_K_Rt_from_P`` :118-129), COLMAP->Blender column
  flip, fit-to-sphere normalization.
- ``stanford_orb_dataparser.py:20-138``: blender_LDR transforms + *_mask
  dirs, 2/3 scene scale, half-res default, GT mesh meta path.
- ``rf_dataparser.py:18-116``: images/ + cameras.pkl (torch pickle) with a
  7/1/2 modulo split.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from ..io import load_float32_image
from .blender_family import ParsedSplit

_SPLIT_KINDS = ("train", "test", "val")


def _modulo_split(n: int, split: str, ratios: tuple[int, int, int]) -> list:
    """train/test/val by index modulo (llff_dataparser.py:45-57: train block
    first, then test, then val)."""
    tr, va, te = ratios
    s = tr + va + te
    ranges = {"train": (0, tr), "test": (tr, tr + te), "val": (tr + te, s)}
    if split not in ranges:
        raise ValueError(f"unknown split: {split}")
    lo, hi = ranges[split]
    return [i for i in range(n) if lo <= (i % s) < hi]


@dataclasses.dataclass(frozen=True)
class LLFFDataparser:
    """poses_bounds.npy forward-facing captures (llff_dataparser.py:19)."""

    train_split_ratio: int = 8
    val_split_ratio: int = 1
    test_split_ratio: int = 1
    masked: bool = False

    def parse(self, path: Path, split: str) -> ParsedSplit:
        pb = np.load(path / "poses_bounds.npy").astype(np.float32)  # [N, 17]
        poses = pb[:, :15].reshape(-1, 3, 5)
        hwf = poses[:, :, 4]                        # [N, 3] height,width,focal
        c2w = poses[:, :, :4].copy()
        c2w[:, :, 0] = poses[:, :, 1]
        c2w[:, :, 1] = -poses[:, :, 0]
        bounds = pb[:, 15:]

        files = sorted((path / "images").glob("*.JPG"), key=lambda p: p.name)
        if not files:
            files = sorted((path / "images").glob("*.jpg"), key=lambda p: p.name)
        h, w = load_float32_image(files[0]).shape[:2]

        c2w[:, :, 3] -= c2w[:, :, 3].mean(0)
        # signed max (not abs) matches the reference exactly
        # (llff_dataparser.py:73); asymmetric captures can exceed the box,
        # as they do upstream
        rescale = 1.1 / c2w[:, :, 3].max()
        c2w[:, :, 3] *= rescale

        idx = _modulo_split(
            poses.shape[0], split,
            (self.train_split_ratio, self.val_split_ratio, self.test_split_ratio),
        )
        mask_paths = None
        if self.masked:
            masks = {p.stem: p for p in (path / "masks").iterdir()}
            mask_paths = [masks[files[i].stem] for i in idx]
        return ParsedSplit(
            c2w=c2w[idx],
            focal=float(hwf[0, 2]),
            fx=(hwf[:, 2] / hwf[:, 1] * w)[idx],
            fy=(hwf[:, 2] / hwf[:, 0] * h)[idx],
            cx=np.full(len(idx), w / 2.0, np.float32),
            cy=np.full(len(idx), h / 2.0, np.float32),
            width=w, height=h,
            near=float(bounds[idx, 0].min() * rescale),
            far=float(bounds[idx, 1].max() * rescale),
            image_paths=[files[i] for i in idx],
            mask_paths=mask_paths,
        )

    @staticmethod
    def recognize(path: Path) -> bool:
        return (path / "images").exists() and (path / "poses_bounds.npy").exists()


@dataclasses.dataclass(frozen=True)
class MaskedLLFFDataparser(LLFFDataparser):
    masked: bool = True

    @staticmethod
    def recognize(path: Path) -> bool:
        return (
            (path / "images").exists()
            and (path / "masks").exists()
            and (path / "poses_bounds.npy").exists()
        )


def _decompose_projection(P: np.ndarray):
    """K, c2w from a 3x4 projection (idr_dataparser.py:118-129)."""
    import cv2

    K, R, t = cv2.decomposeProjectionMatrix(P.astype(np.float64))[:3]
    K = K / K[2, 2]
    c2w = np.eye(4)
    c2w[:3, :3] = R.T
    c2w[:3, 3] = (t[:3] / t[3])[:, 0]
    return K.astype(np.float32), c2w[:3, :4].astype(np.float32)


def _fit_sphere(c2w: np.ndarray, radius: float) -> np.ndarray:
    """Cameras.transform_to_fit_sphere (_cameras.py:245-265): center on the
    least-squares intersection of the camera look-at rays, then project every
    camera position to exactly ``radius`` from that center. (Mean-centering
    instead would mis-center partial-dome DTU captures.)"""
    c2w = c2w.copy()
    pos = c2w[:, :, 3]                       # [N, 3]
    d = -c2w[:, :, 2]                        # look-at directions [N, 3]
    eye = np.eye(3, dtype=np.float64)
    a_n = eye[None] - d[:, :, None] @ d[:, None, :]        # [N, 3, 3]
    b = (a_n @ pos[:, :, None]).sum(0)                     # [3, 1]
    a_sum = a_n.sum(0)                                     # [3, 3]
    center = np.linalg.lstsq(a_sum, b, rcond=None)[0][:, 0]
    pos = pos - center
    norm = np.maximum(np.linalg.norm(pos, axis=-1, keepdims=True), 1e-8)
    c2w[:, :, 3] = (pos / norm * radius).astype(c2w.dtype)
    return c2w


@dataclasses.dataclass(frozen=True)
class IDRDataparser:
    """DTU/IDR cameras_large.npz layout (idr_dataparser.py:19)."""

    scale_factor: float = 0.4
    masked: bool = False
    fit_radius: float = 3.0 ** 0.5  # masked variant uses 3 (idr_dataparser.py:64,179)

    def parse(self, path: Path, split: str) -> ParsedSplit:
        files = sorted((path / "image").glob("*.png"), key=lambda p: p.name)
        n = len(files)
        h, w = load_float32_image(files[0]).shape[:2]
        cam = np.load(path / "cameras_large.npz")
        c2w = np.zeros((n, 3, 4), np.float32)
        fx = np.zeros(n, np.float32)
        fy = np.zeros(n, np.float32)
        cx = np.zeros(n, np.float32)
        cy = np.zeros(n, np.float32)
        for i in range(n):
            P = cam[f"world_mat_{i}"] @ cam[f"scale_mat_{i}"]
            K, pose = _decompose_projection(P[:3, :4])
            c2w[i] = pose
            fx[i], fy[i], cx[i], cy[i] = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        c2w[:, :, 1:3] *= -1  # COLMAP -> Blender camera convention
        c2w = _fit_sphere(c2w, radius=self.fit_radius)
        sf = self.scale_factor
        mask_paths = None
        if self.masked:
            mask_paths = [path / "mask" / f"{i:03d}.png" for i in range(n)]
        return ParsedSplit(
            c2w=c2w,
            focal=float(fx[0] * sf),
            fx=fx * sf, fy=fy * sf, cx=cx * sf, cy=cy * sf,
            width=int(w * sf), height=int(h * sf),
            near=1e-2, far=1e2,
            image_paths=files,
            mask_paths=mask_paths,
            image_scale=sf,
        )

    @staticmethod
    def recognize(path: Path) -> bool:
        return (
            (path / "image" / "000000.png").exists()
            and (path / "cameras_large.npz").exists()
        )


@dataclasses.dataclass(frozen=True)
class MaskedIDRDataparser(IDRDataparser):
    masked: bool = True
    fit_radius: float = 3.0

    @staticmethod
    def recognize(path: Path) -> bool:
        return (
            (path / "image" / "000000.png").exists()
            and (path / "mask" / "000.png").exists()
            and (path / "cameras_large.npz").exists()
        )


@dataclasses.dataclass(frozen=True)
class StanfordORBDataparser:
    """Stanford-ORB blender_LDR captures (stanford_orb_dataparser.py:20)."""

    scale_factor: float = 0.5  # 1024 / 2048

    def parse(self, path: Path, split: str) -> ParsedSplit:
        if split == "val":
            split = "train"
        with open(path / f"transforms_{split}.json") as f:
            meta = json.load(f)
        frames = meta["frames"]
        wh = int(2048 * self.scale_factor)
        c2w = np.array(
            [f["transform_matrix"] for f in frames], np.float32
        )[:, :3, :]
        c2w[:, :, 3] *= 2 / 3
        focal = 0.5 * wh / np.tan(0.5 * float(meta["camera_angle_x"]))
        gt_mesh = (
            path.parent.parent / "ground_truth" / path.name
            / "mesh_blender" / "mesh.obj"
        )
        return ParsedSplit(
            c2w=c2w,
            focal=focal,
            width=wh, height=wh, near=4 / 3, far=4.0,
            image_paths=[path / (f["file_path"] + ".png") for f in frames],
            mask_paths=[
                path / (f["file_path"].replace(split, split + "_mask") + ".png")
                for f in frames
            ],
            image_scale=self.scale_factor,
            meta={"gt_mesh": gt_mesh, "mesh_scale": 2 / 3},
        )

    @staticmethod
    def recognize(path: Path) -> bool:
        needed = (
            path / "train", path / "train_mask", path / "test",
            path / "test_mask", path / "transforms_train.json",
            path / "transforms_test.json", path / "transforms_novel.json",
        )
        return (
            all(p.exists() for p in needed)
            and path.parent.name == "blender_LDR"
            and (path.parent.parent / "ground_truth" / path.name).exists()
        )


@dataclasses.dataclass(frozen=True)
class RFMaskedRealDataparser:
    """images/ + cameras.pkl dump layout (rf_dataparser.py:18)."""

    train_split_ratio: int = 7
    val_split_ratio: int = 1
    test_split_ratio: int = 2

    def parse(self, path: Path, split: str) -> ParsedSplit:
        import torch

        cam = torch.load(path / "cameras.pkl", map_location="cpu")
        n = cam["c2w"].shape[0]
        idx = _modulo_split(
            n, split,
            (self.train_split_ratio, self.val_split_ratio, self.test_split_ratio),
        )
        a = {k: np.asarray(v) for k, v in cam.items()}
        return ParsedSplit(
            c2w=a["c2w"][idx].astype(np.float32),
            focal=float(a["fx"][idx][0]),
            fx=a["fx"][idx].astype(np.float32),
            fy=a["fy"][idx].astype(np.float32),
            cx=a["cx"][idx].astype(np.float32),
            cy=a["cy"][idx].astype(np.float32),
            width=int(a["width"][0]), height=int(a["height"][0]),
            near=float(a["near"].min()), far=float(a["far"].max()),
            image_paths=[path / "images" / f"{i:04d}.png" for i in idx],
        )

    @staticmethod
    def recognize(path: Path) -> bool:
        return (
            (path / "images" / "0000.png").exists()
            and (path / "cameras.pkl").exists()
        )
