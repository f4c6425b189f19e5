#!/usr/bin/env python
"""Mesh-prior GeoSplatter training CLI.

Parity target: ``tests/model/test_geosplat_prior.py:19-252`` — optimize
vertex offsets + materials from a user-supplied initial mesh (GOF meshes for
unbounded scenes, object scans).

Usage:
  python scripts/train_geosplat_prior.py custom \
      --dataset_path data/truck --mesh_path meshes/truck.ply
"""
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from geosplatting_tpu.engine.train_task import GeoSplatPriorTrainTask, ResumeTask
from geosplatting_tpu.utils.config import run_task_group


def preset(name: str, **kw) -> GeoSplatPriorTrainTask:
    return dataclasses.replace(GeoSplatPriorTrainTask(experiment_name=name), **kw)


TASKS = {
    "object": preset("geosplat-prior-object", num_steps=500, batch_size=8),
    "unbounded": preset(
        "geosplat-prior-unbounded", num_steps=1000, batch_size=4,
        scene_scale=2.0,
    ),
    "custom": GeoSplatPriorTrainTask(),
    "resume": ResumeTask(),
}

if __name__ == "__main__":
    run_task_group(TASKS)
