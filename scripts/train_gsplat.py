#!/usr/bin/env python
"""Vanilla 3DGS/2DGS training CLI (parity: ``tests/model/test_gsplat.py``).

Usage:
  python scripts/train_gsplat.py blender --dataset_path data/lego
  python scripts/train_gsplat.py blender-2dgs --dataset_path data/lego
"""
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from geosplatting_tpu.engine.train_task import GSplatTrainTask, ResumeTask
from geosplatting_tpu.utils.config import run_task_group


def preset(name: str, **kw) -> GSplatTrainTask:
    return dataclasses.replace(GSplatTrainTask(experiment_name=name), **kw)


TASKS = {
    "blender": preset("gsplat-blender", num_steps=7000, batch_size=1),
    "blender-antialiased": preset(
        "gsplat-blender-aa", rasterize_mode="antialiased", num_steps=7000
    ),
    "blender-2dgs": preset(
        "gsplat-blender-2dgs", rasterize_mode="2dgs", num_steps=7000
    ),
    "quick": preset("gsplat-quick", num_steps=1000, num_init_gaussians=16384),
    "custom": GSplatTrainTask(),
    "resume": ResumeTask(),
}

if __name__ == "__main__":
    run_task_group(TASKS)
