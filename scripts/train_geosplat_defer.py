#!/usr/bin/env python
"""Stage-3 (deferred shading) training CLI with per-scene presets.

Parity target: ``tests/model/test_geosplat_defer.py:35-117``. Requires a
stage-2 export: ``--load outputs/geosplat-mc-<scene>/<ts>``.

Usage:
  python scripts/train_geosplat_defer.py s4r-hotdog \
      --dataset_path data/hotdog --load outputs/geosplat-mc-s4r-hotdog/<ts>
"""
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from geosplatting_tpu.engine.train_task import (
    GeoSplatDeferTrainTask, RelightEvalTask, ResumeTask,
)
from geosplatting_tpu.utils.config import run_task_group


def preset(name: str, **kw) -> GeoSplatDeferTrainTask:
    return dataclasses.replace(GeoSplatDeferTrainTask(experiment_name=name), **kw)


TASKS = {
    **{
        f"s4r-{s}": preset(
            f"geosplat-defer-s4r-{s}", resolution=96, scene_scale=0.8,
            num_steps=100, batch_size=8, pairs_budget=1_600_000,
        )
        for s in ("hotdog", "chair", "jugs", "air_baloons")
    },
    # synthetic S4R-layout scene (unit box -> scene_scale 1.0)
    "s4r-twosphere": preset(
        "geosplat-defer-s4r-twosphere", resolution=96, scene_scale=1.0,
        num_steps=100, batch_size=8, pairs_budget=1_600_000,
    ),
    **{
        f"tsir-{s}": preset(
            f"geosplat-defer-tsir-{s}", resolution=96, scene_scale=0.9,
            num_steps=100, batch_size=8, pairs_budget=1_600_000,
        )
        for s in ("lego", "armadillo", "ficus", "hotdog")
    },
    **{
        f"sb-{s}": preset(
            f"geosplat-defer-sb-{s}", resolution=128, scene_scale=1.05,
            num_steps=100, batch_size=8, pairs_budget=2_400_000,
        )
        for s in ("ball", "car", "coffee", "helmet", "teapot", "toaster")
    },
    "custom": GeoSplatDeferTrainTask(),
    "resume": ResumeTask(),
    # eval subcommands against a finished stage-3 output dir
    # (test_geosplat_defer.py:119-537 nvseval/reliteval)
    "nvseval": RelightEvalTask(skip_rlit=True, skip_mat=True),
    "reliteval": RelightEvalTask(),
}

if __name__ == "__main__":
    run_task_group(TASKS)
