"""The training loop (parity: ``rfstudio/engine/train.py:48-197``): dataset
iteration, trainer stepping, periodic checkpointing + config-as-script dump,
validation metrics, and resume.

Checkpoints are orbax pytrees of the full trainer state; the config script
(``task.py``) makes every run reproducible from its output directory — the
reference's genuinely-good trick (engine/task.py:151-158), kept."""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Dataset
from ..utils.config import dump_dataclass_as_str
from .experiment import Experiment


def save_checkpoint(ckpt_dir: Path, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp

    path = (ckpt_dir / f"{step}").absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_checkpoint(ckpt_dir: Path, abstract_state: Any, step: int | None = None) -> tuple[Any, int]:
    import orbax.checkpoint as ocp

    steps = sorted(int(p.name) for p in Path(ckpt_dir).iterdir() if p.name.isdigit())
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    step = steps[-1] if step is None else step
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore((Path(ckpt_dir) / f"{step}").absolute(), abstract_state)
    return state, step


@dataclasses.dataclass
class GeoSplatTrainTask:
    """Stage-1 training task: ``TrainTask`` over GeoSplatter (the CLI shape
    of tests/model/test_geosplat.py presets)."""

    dataset_path: Path = Path(".")
    experiment_name: str = "geosplat"
    seed: int = 0
    num_steps: int = 500
    batch_size: int = 8
    num_steps_per_save: int = 250
    num_steps_per_val: int = 100
    scale_factor: float | None = None
    # model knobs (flat; mapped onto GeoSplatter)
    resolution: int = 96
    light_resolution: int = 512
    scene_scale: float = 1.05
    initial_guess: str = "hybrid"
    tile_capacity: int = 768
    backend: str = "auto"

    def build(self):
        from ..models.geosplat import GeoSplatter
        from ..train.geosplat_trainer import GeoSplatTrainer, GeoSplatTrainerConfig

        model = GeoSplatter(
            resolution=self.resolution,
            light_resolution=self.light_resolution,
            scale=self.scene_scale,
            initial_guess=self.initial_guess,
            tile_capacity=self.tile_capacity,
            backend=self.backend,
        )
        trainer = GeoSplatTrainer(
            GeoSplatTrainerConfig(
                num_steps=self.num_steps, batch_size=self.batch_size
            ),
            model,
        )
        return model, trainer

    def run(self) -> dict:
        model, trainer = self.build()
        dataset = Dataset(self.dataset_path, scale_factor=self.scale_factor)
        exp = Experiment(self.experiment_name).setup()
        (exp.base_dir / "task.py").write_text(dump_dataclass_as_str(self))

        key = jax.random.key(self.seed)
        params = model.init(key)
        state = trainer.init_state(params)
        it = dataset.iter_batches("train", self.batch_size, seed=self.seed)

        t_start = time.time()
        metrics = {}
        for step in range(self.num_steps):
            cams, gt, _ = next(it)
            key, sub = jax.random.split(key)
            state, metrics = trainer.train_step(
                state, cams, gt, sub, jnp.asarray(step, jnp.float32),
                sampling=trainer.sampling_at(step),
            )
            if (step + 1) % self.num_steps_per_val == 0:
                loss = float(metrics["loss"])
                psnr = float(metrics["splat_psnr"])
                its = (step + 1) / (time.time() - t_start)
                exp.log(
                    f"step {step + 1}: loss={loss:.4f} splat_psnr={psnr:.2f} "
                    f"gaussians={int(metrics['num_gaussians'])} it/s={its:.2f}"
                )
            if (step + 1) % self.num_steps_per_save == 0 or step + 1 == self.num_steps:
                save_checkpoint(exp.ckpt_dir, step + 1, state)
        return {k: float(v) for k, v in metrics.items()}
