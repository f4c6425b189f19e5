#!/usr/bin/env python
"""COLMAP reconstruction wrapper (parity: the reference's
``scripts/graphics/reconstruction.py:18-267``): drives an external
``colmap`` binary through feature extraction -> matching -> mapping (->
optional bundle adjustment) and leaves a ``sparse/0`` + ``database.db``
layout that ``ColmapDataparser`` reads directly.

Host-side only — requires a ``colmap`` install on PATH (the binary is not
part of this image; the script degrades with an actionable error).

Usage:
  python scripts/reconstruction.py --images data/cap/images --target data/cap \
      [--matching exhaustive|sequential] [--camera-model OPENCV] [--refine]
"""
from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path


def run(cmd: list[str], verbose: bool) -> None:
    print("$", " ".join(cmd), flush=True)
    res = subprocess.run(
        cmd, capture_output=not verbose, text=True
    )
    if res.returncode != 0:
        tail = (res.stderr or "")[-2000:] if not verbose else ""
        raise RuntimeError(f"command failed ({res.returncode}): {cmd[0]}\n{tail}")


def colmap_version(colmap_cmd: str) -> tuple[int, ...]:
    out = subprocess.run(
        [colmap_cmd, "-h"], capture_output=True, text=True
    ).stdout
    for line in out.splitlines():
        if line.strip().startswith("COLMAP"):
            for tok in line.split():
                if tok[0].isdigit():
                    return tuple(int(x) for x in tok.split(".")[:2])
    return (3, 8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=Path, required=True)
    ap.add_argument("--target", type=Path, required=True)
    ap.add_argument("--colmap-cmd", default="colmap")
    ap.add_argument("--camera-model", default="OPENCV")
    ap.add_argument(
        "--matching", default="exhaustive",
        choices=["exhaustive", "sequential", "spatial"],
    )
    ap.add_argument("--use-gpu", action="store_true")
    ap.add_argument("--refine", action="store_true",
                    help="run a final bundle_adjuster pass")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    if shutil.which(args.colmap_cmd) is None:
        sys.exit(
            f"'{args.colmap_cmd}' not found on PATH — install COLMAP "
            "(https://colmap.github.io) or pass --colmap-cmd"
        )

    gpu = "1" if args.use_gpu else "0"
    version = colmap_version(args.colmap_cmd)
    args.target.mkdir(parents=True, exist_ok=True)

    with tempfile.TemporaryDirectory() as td:
        tmpdir = Path(td)
        db = tmpdir / "database.db"
        run([
            args.colmap_cmd, "feature_extractor",
            "--database_path", str(db),
            "--image_path", str(args.images),
            "--ImageReader.single_camera", "1",
            "--ImageReader.camera_model", args.camera_model,
            "--SiftExtraction.use_gpu", gpu,
        ], args.verbose)
        run([
            args.colmap_cmd, f"{args.matching}_matcher",
            "--database_path", str(db),
            "--SiftMatching.use_gpu", gpu,
        ], args.verbose)
        sparse = tmpdir / "sparse"
        sparse.mkdir()
        mapper = [
            args.colmap_cmd, "mapper",
            "--database_path", str(db),
            "--image_path", str(args.images),
            "--output_path", str(sparse),
        ]
        if version >= (3, 7):
            mapper.append("--Mapper.ba_global_function_tolerance=1e-6")
        run(mapper, args.verbose)
        if args.refine:
            run([
                args.colmap_cmd, "bundle_adjuster",
                "--input_path", str(sparse / "0"),
                "--output_path", str(sparse / "0"),
                "--BundleAdjustment.refine_principal_point", "1",
            ], args.verbose)
        out_sparse = args.target / "sparse"
        if out_sparse.exists():
            shutil.rmtree(out_sparse)
        shutil.move(str(sparse), str(out_sparse))
        shutil.move(str(db), str(args.target / "database.db"))
    if not (args.target / "images").exists():
        shutil.copytree(args.images, args.target / "images")
    print(f"reconstruction written to {args.target} (sparse/0 + database.db)")


if __name__ == "__main__":
    main()
