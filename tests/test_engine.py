"""Engine layer: config-as-script roundtrip, CLI overrides, checkpoint
save/restore, experiment logging."""
import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from geosplatting_tpu.engine.experiment import Experiment
from geosplatting_tpu.engine.train_task import load_checkpoint, save_checkpoint
from geosplatting_tpu.utils.config import (
    dump_dataclass_as_str, load_dataclass, run_task_group,
)


@dataclasses.dataclass(frozen=True)
class InnerCfg:
    lr: float = 1e-3
    steps: int = 100


@dataclasses.dataclass(frozen=True)
class DemoTask:
    name: str = "demo"
    inner: InnerCfg = InnerCfg()
    path: Path = Path("/tmp/x")

    def run(self):
        return self


def test_config_script_roundtrip(tmp_path):
    task = DemoTask(name="abc", inner=InnerCfg(lr=0.5))
    script = dump_dataclass_as_str(task)
    p = tmp_path / "task.py"
    p.write_text(script)
    loaded = load_dataclass(p)
    assert loaded == task


def test_cli_overrides():
    result = run_task_group(
        {"demo": DemoTask()},
        argv=["demo", "--name", "xyz", "--inner.lr", "0.25"],
    )
    assert result.name == "xyz"
    assert result.inner.lr == 0.25
    assert result.inner.steps == 100


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step_count": jnp.asarray(7),
    }
    save_checkpoint(tmp_path, 5, state)
    abstract = {
        "params": {"w": jnp.zeros((2, 3))},
        "step_count": jnp.asarray(0),
    }
    restored, step = load_checkpoint(tmp_path, abstract)
    assert step == 5
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )


def test_experiment_layout(tmp_path):
    exp = Experiment("trial", output_root=tmp_path, timestamp="t0").setup()
    exp.log("hello")
    out = exp.dump_image("val/img.png", np.zeros((4, 4, 3), np.float32))
    assert out.exists()
    assert (tmp_path / "trial" / "t0" / "log.txt").read_text().strip().endswith("hello")
