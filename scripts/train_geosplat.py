#!/usr/bin/env python
"""Stage-1 training CLI with per-scene presets.

Parity target: ``tests/model/test_geosplat.py:360-384`` — named TrainTask
presets exposed as subcommands (s4r-hotdog, s4r-chair, ..., tensoir-lego,
shiny-ball, ...) with ``--dotted.flag`` overrides.

Usage: python scripts/train_geosplat.py s4r-hotdog --dataset_path data/hotdog
"""
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from geosplatting_tpu.engine.train_task import GeoSplatTrainTask, ResumeTask
from geosplatting_tpu.utils.config import run_task_group


def preset(name: str, **kw) -> GeoSplatTrainTask:
    return dataclasses.replace(
        GeoSplatTrainTask(experiment_name=name), **kw
    )


# per-scene presets mirroring tests/model/test_geosplat.py:15-344
S4R = {
    f"s4r-{scene}": preset(
        f"geosplat-s4r-{scene}", resolution=96, scene_scale=0.8,
        num_steps=500, batch_size=8, pairs_budget=1_600_000,
        max_render_faces=1 << 17,
    )
    for scene in ("hotdog", "chair", "jugs", "air_baloons")
}
# the in-repo synthetic S4R-layout scene (scripts/make_synthetic_scene.py)
# spans the unit box, so it trains at scene_scale 1.0
S4R["s4r-twosphere"] = preset(
    "geosplat-s4r-twosphere", resolution=96, scene_scale=1.0,
    num_steps=500, batch_size=8, pairs_budget=1_600_000,
    max_render_faces=1 << 17,
)
TENSOIR = {
    f"tsir-{scene}": preset(
        f"geosplat-tsir-{scene}", resolution=96, scene_scale=0.9,
        num_steps=500, batch_size=8, pairs_budget=1_600_000,
        max_render_faces=1 << 17,
    )
    for scene in ("lego", "armadillo", "ficus", "hotdog")
}
SHINY = {
    f"sb-{scene}": preset(
        f"geosplat-sb-{scene}", resolution=128, scene_scale=1.05,
        num_steps=500, batch_size=8, initial_guess="specular",
        pairs_budget=2_400_000,
    )
    for scene in ("ball", "car", "coffee", "helmet", "teapot", "toaster")
}
SHINY["sb-lego_highres"] = preset(
    "geosplat-sb-lego_highres", resolution=128, scene_scale=1.05,
    num_steps=1500, batch_size=8,
)

TASKS = {
    **S4R, **TENSOIR, **SHINY,
    "custom": GeoSplatTrainTask(),
    "resume": ResumeTask(),
}

if __name__ == "__main__":
    run_task_group(TASKS)
