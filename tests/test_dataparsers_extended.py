"""Extended dataparser coverage on synthetic fixtures: LLFF, IDR, Stanford-ORB,
RF masked-real, mesh IO, and the synthetic mesh-render parsers."""
import json
from pathlib import Path

import numpy as np
import pytest

from geosplatting_tpu.data.dataset import Dataset, recognize_dataparser
from geosplatting_tpu.data.dataparsers.real_captures import (
    IDRDataparser, LLFFDataparser, MaskedIDRDataparser, MaskedLLFFDataparser,
    RFMaskedRealDataparser, StanfordORBDataparser,
)
from geosplatting_tpu.data.dataparsers.synthetic_meshes import (
    MeshDRDataparser, MeshViewSynthesisDataparser, ShapeNetDataparser,
)
from geosplatting_tpu.data.io import dump_float32_image
from geosplatting_tpu.graphics.mesh_io import load_mesh, save_mesh


def _img(rng, h=8, w=8, c=3):
    return rng.uniform(size=(h, w, c)).astype(np.float32)


# ---- mesh io -----------------------------------------------------------------

def _cube_mesh():
    v = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        np.float32,
    )
    f = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int32,
    )
    return v, f


@pytest.mark.parametrize("suffix", [".obj", ".ply"])
def test_mesh_io_roundtrip(tmp_path, suffix):
    v, f = _cube_mesh()
    colors = np.linspace(0, 1, v.size).reshape(v.shape).astype(np.float32)
    save_mesh(tmp_path / ("m" + suffix), v, f, colors=colors)
    back = load_mesh(tmp_path / ("m" + suffix))
    np.testing.assert_allclose(back["vertices"], v, atol=1e-6)
    np.testing.assert_array_equal(back["indices"], f)
    np.testing.assert_allclose(back["colors"], colors, atol=1 / 255)


def test_mesh_io_quads_and_ascii_ply(tmp_path):
    # quad OBJ face fan-triangulates
    (tmp_path / "q.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
    )
    m = load_mesh(tmp_path / "q.obj")
    assert m["indices"].shape == (2, 3)
    # ascii ply
    (tmp_path / "a.ply").write_bytes(
        b"ply\nformat ascii 1.0\nelement vertex 3\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"element face 1\nproperty list uchar int vertex_indices\n"
        b"end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
    )
    m = load_mesh(tmp_path / "a.ply")
    assert m["vertices"].shape == (3, 3)
    assert m["indices"].shape == (1, 3)


# ---- LLFF --------------------------------------------------------------------

def _write_llff(root: Path, n=10, masked=False):
    rng = np.random.default_rng(0)
    (root / "images").mkdir(parents=True)
    pb = np.zeros((n, 17), np.float32)
    for i in range(n):
        pose = np.zeros((3, 5), np.float32)
        pose[:, :3] = np.eye(3)
        pose[:, 3] = rng.normal(size=3)
        pose[:, 4] = (16, 16, 20)  # h, w, f
        pb[i, :15] = pose.reshape(-1)
        pb[i, 15:] = (1.0, 10.0)
        dump_float32_image(root / "images" / f"im_{i:03d}.JPG", _img(rng, 16, 16))
    np.save(root / "poses_bounds.npy", pb)
    if masked:
        (root / "masks").mkdir()
        for i in range(n):
            dump_float32_image(
                root / "masks" / f"im_{i:03d}.png",
                np.ones((16, 16, 1), np.float32),
            )


def test_llff_parse(tmp_path):
    _write_llff(tmp_path)
    parser = recognize_dataparser(tmp_path)
    assert isinstance(parser, LLFFDataparser)
    ds = Dataset(tmp_path)
    cams, images, _ = ds.get_split("train")
    assert cams.shape[0] == 8 and images.shape[-1] == 4
    cams_t, _, _ = ds.get_split("test")
    assert cams_t.shape[0] == 1
    # recentered + rescaled into the unit-ish box
    assert float(np.abs(np.asarray(cams.c2w)[:, :, 3]).max()) <= 1.1 + 1e-5


def test_masked_llff_recognized_over_llff(tmp_path):
    _write_llff(tmp_path, masked=True)
    assert isinstance(recognize_dataparser(tmp_path), MaskedLLFFDataparser)


# ---- IDR ---------------------------------------------------------------------

def _write_idr(root: Path, n=4, masked=False):
    rng = np.random.default_rng(1)
    (root / "image").mkdir(parents=True)
    cam = {}
    for i in range(n):
        dump_float32_image(root / "image" / f"{i:06d}.png", _img(rng, 12, 10))
        K = np.array([[15.0, 0, 5], [0, 15.0, 6], [0, 0, 1]])
        R = np.eye(3)
        t = rng.normal(size=3)
        P = np.eye(4)
        P[:3, :3] = K @ R
        P[:3, 3] = K @ t
        cam[f"world_mat_{i}"] = P
        cam[f"scale_mat_{i}"] = np.eye(4)
    np.savez(root / "cameras_large.npz", **cam)
    if masked:
        (root / "mask").mkdir()
        for i in range(n):
            dump_float32_image(
                root / "mask" / f"{i:03d}.png", np.ones((12, 10, 3), np.float32)
            )


def test_idr_parse(tmp_path):
    _write_idr(tmp_path)
    parser = recognize_dataparser(tmp_path)
    assert isinstance(parser, IDRDataparser)
    ds = Dataset(tmp_path)
    cams, images, _ = ds.get_split("train")
    assert cams.shape[0] == 4
    # fit-to-sphere: camera positions within sqrt(3)
    r = np.linalg.norm(np.asarray(cams.c2w)[:, :, 3], axis=-1)
    assert r.max() <= 3.0 ** 0.5 + 1e-4
    # intrinsics recovered and scaled by 0.4
    np.testing.assert_allclose(float(cams.fx[0]), 15.0 * 0.4, rtol=1e-4)


def test_masked_idr_recognized(tmp_path):
    _write_idr(tmp_path, masked=True)
    assert isinstance(recognize_dataparser(tmp_path), MaskedIDRDataparser)


# ---- Stanford ORB ------------------------------------------------------------

def _write_orb(tmp_path: Path):
    scene = tmp_path / "data" / "blender_LDR" / "toy"
    rng = np.random.default_rng(2)
    for split in ("train", "test"):
        (scene / split).mkdir(parents=True)
        (scene / f"{split}_mask").mkdir()
        frames = []
        for i in range(2):
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(size=3)
            frames.append({
                "file_path": f"./{split}/r_{i}", "transform_matrix": c2w.tolist(),
            })
            dump_float32_image(scene / split / f"r_{i}.png", _img(rng))
            dump_float32_image(
                scene / f"{split}_mask" / f"r_{i}.png",
                np.ones((8, 8, 3), np.float32),
            )
        with open(scene / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    (scene / "transforms_novel.json").write_text("{}")
    gt = tmp_path / "data" / "ground_truth" / "toy" / "mesh_blender"
    gt.mkdir(parents=True)
    v, fc = _cube_mesh()
    save_mesh(gt / "mesh.obj", v, fc)
    return scene


def test_stanford_orb(tmp_path):
    scene = _write_orb(tmp_path)
    parser = recognize_dataparser(scene)
    assert isinstance(parser, StanfordORBDataparser)
    ds = Dataset(scene)
    cams, images, meta = ds.get_split("train")
    assert cams.shape[0] == 2
    assert meta["gt_mesh"].exists()


# ---- RF masked-real ----------------------------------------------------------

def test_rf_masked_real(tmp_path):
    import torch

    rng = np.random.default_rng(3)
    (tmp_path / "images").mkdir()
    n = 10
    for i in range(n):
        dump_float32_image(tmp_path / "images" / f"{i:04d}.png", _img(rng, 8, 8, 4))
    torch.save(
        {
            "c2w": torch.eye(4)[:3].repeat(n, 1, 1),
            "fx": torch.full((n,), 10.0), "fy": torch.full((n,), 10.0),
            "cx": torch.full((n,), 4.0), "cy": torch.full((n,), 4.0),
            "width": torch.full((n,), 8, dtype=torch.long),
            "height": torch.full((n,), 8, dtype=torch.long),
            "near": torch.full((n,), 0.1), "far": torch.full((n,), 10.0),
        },
        tmp_path / "cameras.pkl",
    )
    parser = recognize_dataparser(tmp_path)
    assert isinstance(parser, RFMaskedRealDataparser)
    ds = Dataset(tmp_path)
    cams, images, _ = ds.get_split("train")
    assert cams.shape[0] == 7  # 7/1/2 modulo split
    cams_t, _, _ = ds.get_split("test")
    assert cams_t.shape[0] == 2


# ---- synthetic mesh parsers ----------------------------------------------------

def test_shapenet_render_parse(tmp_path):
    models = tmp_path / "models"
    models.mkdir()
    v, fc = _cube_mesh()
    save_mesh(models / "model_normalized.obj", v, fc)
    (models / "model_normalized.mtl").write_text("newmtl m\n")
    parser = recognize_dataparser(tmp_path)
    assert isinstance(parser, ShapeNetDataparser)
    ds = Dataset(
        tmp_path,
        dataparser=ShapeNetDataparser(
            resolution=16, num_train_views=2, num_val_views=2, num_test_views=2
        ),
    )
    cams, images, meta = ds.get_split("train")
    assert images.shape == (2, 16, 16, 4)
    assert np.isfinite(images).all()
    assert images[..., 3].max() > 0  # the cube is visible


def test_mesh_dr_depth_parse(tmp_path):
    v, fc = _cube_mesh()
    save_mesh(tmp_path / "block.obj", v, fc)
    scene = tmp_path.rename(tmp_path.parent / "inputmodels")
    parser = recognize_dataparser(scene)
    assert isinstance(parser, MeshDRDataparser)
    ds = Dataset(
        scene,
        dataparser=MeshDRDataparser(
            resolution=16, num_train_views=2, num_val_views=2, num_test_views=2
        ),
    )
    cams, images, _ = ds.get_split("val")
    assert images.shape == (2, 16, 16, 4)
    hit = images[..., 3] > 0
    assert hit.any()
    assert (images[..., 0][hit] > 0).all()  # positive depth where hit
