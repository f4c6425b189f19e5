#!/usr/bin/env python
"""Stage-2 (MC shading) training CLI with per-scene presets.

Parity target: ``tests/model/test_geosplat_mc.py:20-176``. Requires a stage-1
export: ``--load outputs/geosplat-<scene>/<ts>``.

Usage:
  python scripts/train_geosplat_mc.py s4r-hotdog \
      --dataset_path data/hotdog --load outputs/geosplat-s4r-hotdog/<ts>
  python scripts/train_geosplat_mc.py resume --dir outputs/geosplat-mc-.../<ts>
"""
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from geosplatting_tpu.engine.train_task import GeoSplatMCTrainTask, ResumeTask
from geosplatting_tpu.utils.config import run_task_group


def preset(name: str, **kw) -> GeoSplatMCTrainTask:
    return dataclasses.replace(GeoSplatMCTrainTask(experiment_name=name), **kw)


TASKS = {
    **{
        f"s4r-{s}": preset(
            f"geosplat-mc-s4r-{s}", resolution=96, scene_scale=0.8,
            num_steps=500, batch_size=8, pairs_budget=1_600_000,
        max_render_faces=1 << 17,
        )
        for s in ("hotdog", "chair", "jugs", "air_baloons")
    },
    # synthetic S4R-layout scene (unit box -> scene_scale 1.0)
    "s4r-twosphere": preset(
        "geosplat-mc-s4r-twosphere", resolution=96, scene_scale=1.0,
        num_steps=500, batch_size=8, pairs_budget=1_600_000,
        max_render_faces=1 << 17,
    ),
    **{
        f"tsir-{s}": preset(
            f"geosplat-mc-tsir-{s}", resolution=96, scene_scale=0.9,
            num_steps=500, batch_size=8, pairs_budget=1_600_000,
        max_render_faces=1 << 17,
        )
        for s in ("lego", "armadillo", "ficus", "hotdog")
    },
    **{
        f"sb-{s}": preset(
            f"geosplat-mc-sb-{s}", resolution=128, scene_scale=1.05,
            num_steps=1000, batch_size=8, initial_guess="specular",
            pairs_budget=2_400_000,
        )
        for s in ("ball", "car", "coffee", "helmet", "teapot", "toaster")
    },
    "custom": GeoSplatMCTrainTask(),
    "resume": ResumeTask(),
}

if __name__ == "__main__":
    run_task_group(TASKS)
