"""Data layer tests on synthetic on-disk fixtures (the reference relies on
real downloads; we generate minimal valid datasets instead)."""
import json
from pathlib import Path

import numpy as np
import pytest

from geosplatting_tpu.data.dataset import Dataset, recognize_dataparser
from geosplatting_tpu.data.dataparsers.blender_family import (
    BlenderDataparser, Syn4RelightDataparser, TensoIRDataparser,
)
from geosplatting_tpu.data.io import dump_float32_image, load_float32_image


def write_blender_fixture(root: Path, n=3):
    rng = np.random.default_rng(0)
    for split in ("train", "test", "val"):
        (root / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for i in range(n):
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(size=3)
            frames.append({
                "file_path": f"./{split}/r_{i}",
                "transform_matrix": c2w.tolist(),
            })
            img = rng.uniform(size=(8, 8, 4)).astype(np.float32)
            dump_float32_image(root / split / f"r_{i}.png", img)
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)


def test_image_io_roundtrip(tmp_path):
    img = np.random.default_rng(1).uniform(size=(16, 16, 3)).astype(np.float32)
    dump_float32_image(tmp_path / "x.png", img)
    back = load_float32_image(tmp_path / "x.png")
    np.testing.assert_allclose(back, img, atol=1 / 255)


def test_blender_recognition_and_parse(tmp_path):
    write_blender_fixture(tmp_path)
    parser = recognize_dataparser(tmp_path)
    assert isinstance(parser, BlenderDataparser)
    ds = Dataset(tmp_path)
    cams, images, meta = ds.get_split("train")
    assert cams.shape == (3,)
    assert images.shape == (3, 8, 8, 4)
    # 2/3 scene scaling applied
    assert abs(float(cams.c2w[0, 0, 3])) <= 2.0
    # camera intrinsics from camera_angle_x
    np.testing.assert_allclose(
        float(cams.fx[0]), 0.5 * 800 / np.tan(0.345), rtol=1e-5
    )


def test_dataset_iterator(tmp_path):
    write_blender_fixture(tmp_path)
    ds = Dataset(tmp_path)
    it = ds.iter_batches("train", batch_size=2, seed=0)
    seen = set()
    for _ in range(4):
        cams, imgs, idx = next(it)
        assert imgs.shape == (2, 8, 8, 4)
        assert cams.shape == (2,)
        seen.update(idx.tolist())
    assert seen == {0, 1, 2}


def test_tensoir_recognition(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "train").mkdir()
    frames = []
    for i in range(2):
        frames.append({
            "file_path": f"./train/r_{i}",
            "transform_matrix": np.eye(4).tolist(),
        })
        dump_float32_image(
            tmp_path / "train" / f"r_{i}_sunset.png",
            rng.uniform(size=(8, 8, 4)).astype(np.float32),
        )
    for split in ("train", "test"):
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)
    parser = recognize_dataparser(tmp_path)
    assert isinstance(parser, TensoIRDataparser)
    cams, imgs, _ = Dataset(tmp_path).get_split("train")
    assert imgs.shape[0] == 2
