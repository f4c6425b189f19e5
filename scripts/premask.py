#!/usr/bin/env python
"""Premasker: mask a real capture by rendering an aligned mesh's silhouette.

Parity: ``tests/model/test_mesh_premasker.py:16-56`` — load a reconstruction
mesh, apply a rigid alignment (R, T, S), rasterize its coverage from every
camera, multiply the capture images by the mask, and dump the result in the
RF-masked-real layout (``images/`` + ``cameras.pkl``) that
``RFMaskedRealDataparser`` reads back.

Usage:
  python scripts/premask.py --mesh scans/object.ply --dataset_path data/cap \
      --output data/cap_masked \
      --translation -0.655 -0.317 0.647 \
      --rotation 0.992 0.080 -0.097  0.080 0.192 0.978  0.097 -0.978 0.184 \
      --scale 0.338
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=Path, required=True)
    ap.add_argument("--dataset_path", type=Path, required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--scale_factor", type=float, default=None)
    ap.add_argument("--translation", type=float, nargs=3, default=(0, 0, 0))
    ap.add_argument("--rotation", type=float, nargs=9,
                    default=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--tile_capacity", type=int, default=256)
    args = ap.parse_args()

    from geosplatting_tpu.data.dataset import Dataset
    from geosplatting_tpu.data.io import dump_float32_image
    from geosplatting_tpu.graphics.mesh import TriangleMesh
    from geosplatting_tpu.graphics.mesh_io import load_mesh, save_mesh
    from geosplatting_tpu.ops.mesh_raster import rasterize_mesh

    data = load_mesh(args.mesh)
    r = np.asarray(args.rotation, np.float32).reshape(3, 3)
    t = np.asarray(args.translation, np.float32)
    verts = (data["vertices"] - t) @ r.T * args.scale
    save_mesh(
        args.mesh.parent / f"{args.mesh.stem}_adjusted.ply",
        verts, data["indices"],
    )
    mesh = TriangleMesh(
        vertices=jnp.asarray(verts), indices=jnp.asarray(data["indices"])
    )

    dataset = Dataset(args.dataset_path, scale_factor=args.scale_factor)
    cams_all, imgs_all = [], []
    for split in ("train", "val", "test"):
        try:
            cams, imgs, _ = dataset.get_split(split)
        except Exception:
            continue
        cams_all.append(cams)
        imgs_all.append(np.asarray(imgs))
    from geosplatting_tpu.utils.tensorclass import TensorClass  # noqa: F401
    from geosplatting_tpu.graphics.cameras import Cameras

    cams = Cameras.cat(cams_all)
    imgs = np.concatenate(imgs_all)

    out_images = args.output / "images"
    out_images.mkdir(parents=True, exist_ok=True)
    n = cams.shape[0]
    for i in range(n):
        rast = rasterize_mesh(mesh, cams[i], tile_capacity=args.tile_capacity)
        alpha = np.asarray((rast.tri_id >= 0).astype(np.float32))[..., None]
        rgba = np.concatenate((imgs[i][..., :3] * alpha, alpha), axis=-1)
        dump_float32_image(out_images / f"{i:04d}.png", rgba)
        if (i + 1) % 20 == 0:
            print(f"masked {i + 1}/{n}", flush=True)

    import torch

    torch.save(
        {
            "c2w": torch.from_numpy(np.asarray(cams.c2w)),
            "fx": torch.from_numpy(np.asarray(cams.fx)),
            "fy": torch.from_numpy(np.asarray(cams.fy)),
            "cx": torch.from_numpy(np.asarray(cams.cx)),
            "cy": torch.from_numpy(np.asarray(cams.cy)),
            "width": torch.full((n,), cams.width, dtype=torch.long),
            "height": torch.full((n,), cams.height, dtype=torch.long),
            "near": torch.full((n,), float(cams.near)),
            "far": torch.full((n,), float(cams.far)),
        },
        args.output / "cameras.pkl",
    )
    print(f"wrote {n} masked images + cameras.pkl to {args.output}")


if __name__ == "__main__":
    main()
