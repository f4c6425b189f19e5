"""Task-layer tests: per-stage train tasks, export hand-offs, resume, and the
standalone eval task — the CLI surface of tests/model/test_geosplat*.py."""
import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosplatting_tpu.data.dataset import Dataset
from geosplatting_tpu.data.io import dump_float32_image
from geosplatting_tpu.engine.stage_io import (
    find_export, load_export, save_export,
)
from geosplatting_tpu.engine.train_task import (
    GeoSplatDeferTrainTask, GeoSplatMCTrainTask, GeoSplatTrainTask,
    GSplatTrainTask, RelightEvalTask, resume,
)
from geosplatting_tpu.graphics import images as gimages
from geosplatting_tpu.utils.config import load_dataclass

RES = 32
SF = RES / 800.0


def _sphere_rgba(cams):
    origins, dirs = cams.generate_rays()
    b = jnp.sum(origins * dirs, -1)
    c = jnp.sum(origins * origins, -1) - 0.25
    disc = b * b - c
    hit = (disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0)) > 0)
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    p = origins + t[..., None] * dirs
    n = p / 0.5
    shade = jnp.clip(jnp.sum(n * jnp.array([0.577, 0.577, 0.577]), -1), 0.1, 1.0)
    rgb = jnp.where(hit[..., None], shade[..., None] * jnp.ones(3) * 0.8, 0.0)
    a = hit[..., None].astype(jnp.float32)
    return jnp.concatenate((gimages.rgb2srgb(rgb) * a, a), -1)


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    """A miniature but *consistent* blender-layout dataset: stored at 800^2
    (the layout's fixed size) so scale_factor=RES/800 yields RES^2 training."""
    root = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(0)
    counts = {"train": 6, "test": 2, "val": 2}
    for split, n in counts.items():
        (root / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for i in range(n):
            th = 2 * np.pi * (i + (0.3 if split != "train" else 0)) / n
            eye = 3.0 * np.array(
                [np.cos(th) * 0.94, np.sin(th) * 0.94, 0.35]
            )
            fwd = -eye / np.linalg.norm(eye)
            up = np.array([0.0, 0.0, 1.0])
            right = np.cross(fwd, up)
            right /= np.linalg.norm(right)
            up2 = np.cross(right, fwd)
            c2w = np.eye(4)
            c2w[:3, 0] = right
            c2w[:3, 1] = up2
            c2w[:3, 2] = -fwd
            c2w[:3, 3] = eye
            frames.append({
                "file_path": f"./{split}/r_{i}",
                "transform_matrix": c2w.tolist(),
            })
            dump_float32_image(
                root / split / f"r_{i}.png",
                np.zeros((800, 800, 4), np.float32),
            )
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    # render consistent GT from the parsed (scaled) cameras, upsample, save
    ds = Dataset(root, scale_factor=SF)
    for split, n in counts.items():
        cams, _, _ = ds.get_split(split)
        gt = np.asarray(_sphere_rgba(cams))
        for i in range(n):
            big = np.kron(gt[i], np.ones((800 // RES, 800 // RES, 1)))
            dump_float32_image(root / split / f"r_{i}.png", big.astype(np.float32))
    return root


def _s1_task(root, outdir, steps=4):
    return GeoSplatTrainTask(
        dataset_path=root, experiment_name="t-s1", seed=0,
        num_steps=steps, batch_size=2, num_steps_per_save=2,
        num_steps_per_val=2, num_val_images=1, scale_factor=SF,
        resolution=10, light_resolution=32, scene_scale=1.0,
        tile_capacity=96,
    )


def test_stage_io_roundtrip(tmp_path):
    export = {
        "a": jnp.arange(5.0),
        "nested": {"w": jnp.ones((2, 3)), "deep": {"b": jnp.zeros(2)}},
        "none_field": None,
        "scalar": 1.5,
    }
    save_export(tmp_path / "export.npz", export)
    back = load_export(tmp_path / "export.npz")
    assert back["none_field"] is None
    np.testing.assert_allclose(back["a"], np.arange(5.0))
    np.testing.assert_allclose(back["nested"]["deep"]["b"], np.zeros(2))
    assert float(back["scalar"]) == 1.5


def test_stage1_task_run_and_resume(blender_scene, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # outputs/ under tmp
    task = _s1_task(blender_scene, tmp_path, steps=2)
    out = task.run()
    run_dir = Path(out["output_dir"])
    assert (run_dir / "task.py").exists()
    assert (run_dir / "export.npz").exists()
    assert "val_psnr" in out
    assert list((run_dir / "dump").glob("**/*.png"))

    # resume: extend to 4 steps from the dumped config + latest ckpt
    task2 = load_dataclass(run_dir / "task.py")
    task2 = dataclasses.replace(task2, num_steps=4)
    out2 = task2.run(resume_dir=run_dir)
    assert Path(out2["output_dir"]) == run_dir
    log = (run_dir / "log.txt").read_text()
    assert "resumed from step 2" in log
    assert "step 4:" in log


@pytest.mark.chain
def test_full_chain_via_tasks_and_eval(blender_scene, tmp_path):
    """The full 3-stage pipeline chained through TASKS (on-disk exports,
    stage-2/3 --load, standalone eval, relight API) — the task-layer
    equivalent of the reference's eval.sh. Runs in a subprocess: this is the
    heaviest compile workload in the suite and CPU XLA has shown an
    ordering-dependent crash when run after many other compilations."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    env.pop("XLA_FLAGS", None)
    # no persistent compile cache on CPU (see tests/conftest.py: cached
    # CPU executables embed host machine code and SIGILL across VM hosts)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["CHAIN_SCENE_DIR"] = str(blender_scene)
    env["CHAIN_TMP_DIR"] = str(tmp_path)
    result = subprocess.run(
        [sys.executable, "-c",
         "import tests.test_engine_tasks as m; m._run_chain_subprocess()"],
        env=env, capture_output=True, text=True,
        cwd=Path(__file__).resolve().parents[1], timeout=3000,
    )
    assert result.returncode == 0, (
        f"subprocess failed:\nstdout:{result.stdout[-3000:]}\n"
        f"stderr:{result.stderr[-3000:]}"
    )


def _run_chain_subprocess():
    import os

    blender_scene = Path(os.environ["CHAIN_SCENE_DIR"])
    tmp_path = Path(os.environ["CHAIN_TMP_DIR"])
    os.chdir(tmp_path)

    s1 = _s1_task(blender_scene, tmp_path, steps=2)
    out1 = s1.run()

    s2 = GeoSplatMCTrainTask(
        dataset_path=blender_scene, experiment_name="t-s2",
        num_steps=2, batch_size=2, num_steps_per_save=2, num_steps_per_val=2,
        num_val_images=1, scale_factor=SF, resolution=10, scene_scale=1.0,
        tile_capacity=96, num_samples_x=2, load=Path(out1["output_dir"]),
    )
    out2 = s2.run()
    assert (Path(out2["output_dir"]) / "export.npz").exists()

    s3 = GeoSplatDeferTrainTask(
        dataset_path=blender_scene, experiment_name="t-s3",
        num_steps=2, batch_size=2, num_steps_per_save=2, num_steps_per_val=2,
        num_val_images=1, scale_factor=SF, resolution=10, scene_scale=1.0,
        tile_capacity=96, num_samples_x=2, load=Path(out2["output_dir"]),
    )
    out3 = s3.run()
    s3_dir = Path(out3["output_dir"])
    assert (s3_dir / "export.npz").exists()

    ev = RelightEvalTask(
        load=s3_dir, dataset_path=blender_scene, scale_factor=SF,
        skip_rlit=True, skip_mat=True,
    )
    results = ev.run()
    assert "nvs" in results
    assert np.isfinite(results["nvs"]["psnr"])
    assert (s3_dir / "eval.json").exists()

    # relighting API + attribute renders on the exported stage-3 surface
    # (coverage moved from the former test_pipeline_3stage.py)
    model, _ = s3.build(None, None)
    export = load_export(find_export(s3_dir))
    params3, geom = export["params"], export["geometry"]
    assert float(params3["kd"].min()) >= 0.01  # trainer clamp applied
    ds = Dataset(blender_scene, scale_factor=SF)
    cams, _, _ = ds.get_split("test")
    new_env = jax.random.uniform(jax.random.key(5), (32, 64, 3), minval=0.1, maxval=2.0)
    rgba, _, _ = model.render(
        params3, geom, cams[jnp.array([0])], jax.random.key(6),
        relight_envmap=new_env, albedo_scaling=jnp.array([1.1, 0.9, 1.0]),
    )
    assert rgba.shape[0] == 1 and rgba.shape[-1] == 4
    assert np.isfinite(np.asarray(rgba)).all()
    kd_map = model.render_attribute(params3, cams[jnp.array([0])], "kd")
    ks_map = model.render_attribute(params3, cams[jnp.array([0])], "ks", geometry=geom)
    assert np.isfinite(np.asarray(kd_map)).all()
    assert np.isfinite(np.asarray(ks_map)).all()
    print("chain ok:", results["nvs"])


def test_gsplat_task_runs(blender_scene, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    task = GSplatTrainTask(
        dataset_path=blender_scene, experiment_name="t-gs",
        num_steps=3, batch_size=1, num_steps_per_save=3, num_steps_per_val=3,
        num_val_images=1, scale_factor=SF, num_init_gaussians=256,
        sh_degree=0, tile_capacity=128,
    )
    out = task.run()
    assert "val_psnr" in out
    assert np.isfinite(out["loss"])


def test_gsplat_task_vis_export(blender_scene, tmp_path, monkeypatch):
    """--vis_export_every writes standalone HTML splat-viewer snapshots
    during training (the env-constrained stand-in for the reference's live
    viser server, engine/train.py:72)."""
    monkeypatch.chdir(tmp_path)
    task = GSplatTrainTask(
        dataset_path=blender_scene, experiment_name="t-gs-vis",
        num_steps=2, batch_size=1, num_steps_per_save=2, num_steps_per_val=2,
        num_val_images=1, scale_factor=SF, num_init_gaussians=256,
        sh_degree=0, tile_capacity=128, vis_export_every=1,
    )
    out = task.run()
    run_dir = Path(out["output_dir"])
    snaps = sorted((run_dir / "vis_html").glob("*.html"))
    assert len(snaps) == 2
    assert "<html" in snaps[0].read_text()[:2000].lower()


def test_gsplat_task_data_parallel(blender_scene, tmp_path, monkeypatch):
    """The dp flag shards the camera batch over the 8-device CPU mesh and
    the loop runs unchanged (grad psum inserted by XLA from shardings)."""
    monkeypatch.chdir(tmp_path)
    task = GSplatTrainTask(
        dataset_path=blender_scene, experiment_name="t-gs-dp",
        num_steps=2, batch_size=2, num_steps_per_save=2, num_steps_per_val=2,
        num_val_images=1, scale_factor=SF, num_init_gaussians=256,
        sh_degree=0, tile_capacity=128, data_parallel=True,
    )
    out = task.run()
    assert np.isfinite(out["loss"])
