"""Training tasks for every model family + the shared training loop.

Parity: ``rfstudio/engine/train.py:48-197`` (loop, val metrics, image dumps,
dashboard, turntable frames, checkpoint/resume) and the per-model TrainTask
presets in ``tests/model/test_geosplat{,_mc,_defer,_prior}.py`` /
``test_gsplat.py``. Stage hand-offs are on-disk exports (``stage_io``)
consumed by the next stage's ``--load``; ``resume()`` re-executes a run's
dumped ``task.py`` and continues from the latest checkpoint.

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
from ..graphics import images as gimages
from ..utils.config import dump_dataclass_as_str, load_dataclass
from .experiment import Experiment

# blocked per-step training (default ON for remote/tunneled accelerators,
# off on CPU where the suite measures nothing through a tunnel): see the
# loop comment in _TrainTaskBase.run
_BLOCK_STEPS = __import__("os").environ.get("GEOS_BLOCK_STEPS", "1") == "1"
from .stage_io import find_export, load_export, save_export


def _mask_empty(state: Any) -> Any:
    """Orbax refuses zero-size arrays (e.g. shs at sh_degree 0) — swap them
    for a 1-element placeholder; the abstract state restores the shape."""
    return jax.tree.map(
        lambda x: np.zeros((1,), np.float32)
        if hasattr(x, "size") and x.size == 0 else x,
        state,
    )


def save_checkpoint(ckpt_dir: Path, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp

    path = (ckpt_dir / f"{step}").absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _mask_empty(state), force=True)


def load_checkpoint(ckpt_dir: Path, abstract_state: Any, step: int | None = None) -> tuple[Any, int]:
    import orbax.checkpoint as ocp

    steps = sorted(int(p.name) for p in Path(ckpt_dir).iterdir() if p.name.isdigit())
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    step = steps[-1] if step is None else step
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(
            (Path(ckpt_dir) / f"{step}").absolute(), _mask_empty(abstract_state)
        )
    state = jax.tree.map(
        lambda restored, ab: jnp.zeros(ab.shape, ab.dtype)
        if hasattr(ab, "size") and ab.size == 0 else restored,
        state, abstract_state,
    )
    return state, step


def resume(output_dir: Path, step: int | None = None) -> dict:
    """Continue a half-finished run from its output directory: re-import the
    dumped ``task.py`` config and restore the latest (or given) checkpoint
    (reference TrainTask.load_from_script, engine/train.py:192-197)."""
    output_dir = Path(output_dir)
    task = load_dataclass(output_dir / "task.py")
    return task.run(resume_dir=output_dir, resume_step=step)


@dataclasses.dataclass
class ResumeTask:
    """CLI resume: continue a half-finished run from its output directory."""

    dir: Path = Path(".")
    step: int | None = None

    def run(self) -> dict:
        return resume(self.dir, self.step)


@dataclasses.dataclass
class RelightEvalTask:
    """Standalone eval against a finished stage-3 output dir: rebuilds the
    model from the dumped ``task.py``, loads the exported params/geometry and
    runs the NVS / relight / material metric suite
    (tests/model/test_geosplat_defer.py nvseval/reliteval subcommands)."""

    load: Path = Path(".")
    dataset_path: Path = Path(".")
    scale_factor: float | None = None
    skip_nvs: bool = False
    skip_rlit: bool = False
    skip_mat: bool = False
    fast: bool = True
    seed: int = 0

    def run(self) -> dict:
        import json

        from .eval_tasks import RelightEvaler

        load = Path(self.load)
        task3 = load_dataclass(load / "task.py")
        model, _ = task3.build(None, None)
        export = load_export(find_export(load))
        ev = RelightEvaler(
            model=model, params=export["params"], geometry=export["geometry"],
            skip_nvs=self.skip_nvs, skip_rlit=self.skip_rlit,
            skip_mat=self.skip_mat, fast=self.fast, seed=self.seed,
        )
        dataset = Dataset(self.dataset_path, scale_factor=self.scale_factor)
        results = ev.run(dataset)
        (load / "eval.json").write_text(json.dumps(results, indent=2))
        for k, v in results.items():
            print(f"{k}: {v}")
        return results


def _psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((pred - gt) ** 2))
    return -10.0 * float(np.log10(max(mse, 1e-12)))


@dataclasses.dataclass
class _TrainTaskBase:
    """Shared training-loop shell; subclasses wire a model family in."""

    dataset_path: Path = Path(".")
    experiment_name: str = "task"
    seed: int = 0
    num_steps: int = 500
    batch_size: int = 8
    num_steps_per_save: int = 250
    num_steps_per_val: int = 100
    num_val_images: int = 2
    scale_factor: float | None = None
    dashboard: bool = False        # live rich dashboard (train.py:58-70)
    turntable: str = "disable"     # '+z' | '+y' enables turntable vis frames
    load: Path | None = None       # previous-stage output dir (export input)
    # in-training visualization (reference: live viser server,
    # engine/train.py:72; no browser in this env): every N steps write a
    # standalone HTML splat viewer snapshot under <run>/vis_html/
    vis_export_every: int = 0

    # ---- subclass hooks ----------------------------------------------------
    def build(self, dataset: Dataset, key) -> tuple[Any, Any]:
        """-> (model, trainer)"""
        raise NotImplementedError

    def init_state(self, model, trainer, key) -> dict:
        raise NotImplementedError

    def step_fn(self, model, trainer, state, cams, gt, key, step):
        raise NotImplementedError

    def val_render(self, model, trainer, state, cams, key) -> jnp.ndarray:
        """-> [B, H, W, 4] premultiplied-sRGB rgba prediction."""
        raise NotImplementedError

    def export(self, model, trainer, state, key) -> dict | None:
        return None

    def after_update(self, model, trainer, state, step, key, last_wh):
        return state

    def vis_splats(self, model, trainer, state, key):
        """-> Splats (or a means/scales/quats/opacities/colors dict) for the
        periodic HTML viewer snapshot, or None if the family has no cheap
        splat view."""
        return None

    # ---- data parallelism (SURVEY §2.11) ------------------------------------
    def _maybe_dp_state(self, state):
        """When the task opts into ``data_parallel``, build a 'dp' mesh over
        the largest device count dividing the batch and replicate the train
        state onto it (the camera batch is sharded per step in step_fn)."""
        if getattr(self, "data_parallel", False) and jax.device_count() > 1:
            import math

            from ..parallel.sharding import make_mesh, replicate

            n = math.gcd(self.batch_size, jax.device_count())
            if n > 1:
                self._mesh = make_mesh(n)
                state = replicate(state, self._mesh)
        return state

    # ---- the loop ----------------------------------------------------------
    def run(self, resume_dir: Path | None = None, resume_step: int | None = None) -> dict:
        from ..ui import console
        from ..visualization.turntable import OptimizationVisualizer

        dataset = Dataset(self.dataset_path, scale_factor=self.scale_factor)
        key = jax.random.key(self.seed)
        key, k_build, k_init = jax.random.split(key, 3)
        model, trainer = self.build(dataset, k_build)

        if resume_dir is not None:
            exp = Experiment.attach(Path(resume_dir)).setup()
        else:
            exp = Experiment(self.experiment_name).setup()
        (exp.base_dir / "task.py").write_text(dump_dataclass_as_str(self))

        state = self.init_state(model, trainer, k_init)
        start_step = 0
        if resume_dir is not None and (exp.ckpt_dir).exists():
            state, start_step = load_checkpoint(
                exp.ckpt_dir, jax.tree.map(np.asarray, state), resume_step
            )
            state = jax.tree.map(jnp.asarray, state)
            exp.log(f"resumed from step {start_step}")

        vis = None
        if self.turntable != "disable":
            val_cams0, _, _ = dataset.get_split(self._val_split(dataset))
            vis = OptimizationVisualizer(
                up=self.turntable, resolution=(val_cams0.width, val_cams0.height)
            )
            vis.setup(self.num_steps)

        it = dataset.iter_batches("train", self.batch_size, seed=self.seed)
        for _ in range(start_step):  # keep the data order deterministic
            next(it)

        dash_ctx = (
            console.screen(self.experiment_name, num_steps=self.num_steps)
            if self.dashboard else None
        )
        dash = dash_ctx.__enter__() if dash_ctx else None
        metrics: dict = {}
        val_metrics: dict = {}
        try:
            t_start = time.time()
            for step in range(start_step, self.num_steps):
                cams, gt, _ = next(it)
                key, sub = jax.random.split(key)
                state, metrics = self.step_fn(
                    model, trainer, state, cams, gt, sub, step
                )
                if _BLOCK_STEPS:
                    # bound the async dispatch queue to ONE in-flight step:
                    # the remote tunnel backs up (rwnd-limited, minutes of
                    # backlog, occasional lost responses) when hundreds of
                    # dispatches are enqueued ahead of the first fetch
                    # (BASELINE.md round-5 postmortem). An 8-byte scalar
                    # fetch per step costs one RPC round-trip.
                    jax.block_until_ready(metrics["loss"])
                key, sub = jax.random.split(key)
                state = self.after_update(
                    model, trainer, state, step, sub, (cams.width, cams.height)
                )

                if dash is not None:
                    dash(step + 1, {**metrics, **val_metrics})
                if vis is not None:
                    cam = vis.get_camera(step + 1)
                    if cam is not None:
                        key, sub = jax.random.split(key)
                        frame = self.val_render(
                            model, trainer, state, cam[None] if cam.shape == () else cam, sub
                        )
                        exp.dump_image(
                            f"vis/{step + 1:06d}.png", np.asarray(frame[0])
                        )
                if (
                    self.vis_export_every > 0
                    and (step + 1) % self.vis_export_every == 0
                ):
                    key, sub = jax.random.split(key)
                    sp = self.vis_splats(model, trainer, state, sub)
                    if sp is not None:
                        from ..visualization.viewer_html import vis_3dgs

                        out = vis_3dgs(
                            sp, exp.base_dir / "vis_html" / f"{step + 1:06d}.html"
                        )
                        exp.log(f"vis_html snapshot: {out}")

                if (step + 1) % self.num_steps_per_val == 0 or step + 1 == self.num_steps:
                    key, sub = jax.random.split(key)
                    val_metrics = self._validate(
                        model, trainer, state, dataset, exp, step + 1, sub
                    )
                    its = (step + 1 - start_step) / (time.time() - t_start)
                    line = " ".join(
                        f"{k}={float(v):.4g}" for k, v in metrics.items()
                    )
                    exp.log(
                        f"step {step + 1}: {line} "
                        + " ".join(f"{k}={v:.4g}" for k, v in val_metrics.items())
                        + f" it/s={its:.2f}"
                    )
                    # budget-overflow alarm (checked at the log cadence so it
                    # never forces an extra device sync): pair_fill >= 1.0
                    # means the depth-priority budget is actively dropping
                    # the farthest gaussians' pairs; > 0.95 is headroom-gone
                    fill = float(metrics.get("pair_fill", 0.0))
                    if fill > 0.95:
                        msg = (
                            f"WARNING step {step + 1}: pair_fill={fill:.3f}"
                            + (" — pair budget EXCEEDED, farthest gaussians"
                               " are being dropped" if fill >= 1.0 else
                               " — pair budget nearly full")
                            + "; raise pairs_budget (model config)"
                        )
                        exp.log(msg)
                        print(msg, flush=True)
                if (step + 1) % self.num_steps_per_save == 0 or step + 1 == self.num_steps:
                    save_checkpoint(exp.ckpt_dir, step + 1, state)
        finally:
            if dash_ctx:
                dash_ctx.__exit__(None, None, None)

        key, sub = jax.random.split(key)
        export = self.export(model, trainer, state, sub)
        if export is not None:
            save_export(exp.base_dir / "export.npz", export)
            exp.log("export written: export.npz")
        out = {k: float(v) for k, v in metrics.items()}
        out.update(val_metrics)
        out["output_dir"] = str(exp.base_dir)
        return out

    # ---- validation (val-split metrics + image dumps, train.py:104-137) ----
    def _val_split(self, dataset: Dataset) -> str:
        for split in ("val", "test"):
            try:
                dataset.get_split(split)
                return split
            except Exception:
                continue
        return "train"

    def _validate(self, model, trainer, state, dataset, exp, step, key) -> dict:
        split = self._val_split(dataset)
        cams, images, _ = dataset.get_split(split)
        n = min(self.num_val_images, cams.shape[0])
        if n == 0:
            return {}
        idx = jnp.asarray(np.linspace(0, cams.shape[0] - 1, n).astype(np.int32))
        # ONE jitted program for the val render (round 5): the eager render
        # path on the remote TPU is thousands of per-primitive dispatches —
        # for the MC/defer stages that flooded the tunnel with ~10 GB of
        # operand uploads at the first validation and wedged the client
        # (BASELINE.md round-5 postmortem). Cached per task instance; host
        # caches a subclass closes over (frozen geometry, base mesh) become
        # compile-time constants, which is exactly right for a frozen input.
        if getattr(self, "_val_render_jit", None) is None:
            self._val_render_jit = jax.jit(
                lambda s, c, k: self.val_render(model, trainer, s, c, k)
            )
        pred = self._val_render_jit(state, cams[idx], key)
        pred = np.asarray(pred)
        vals = []
        for i in range(n):
            gt = np.asarray(images[np.asarray(idx)[i]])
            p = np.clip(pred[i, ..., :3] + (1 - pred[i, ..., 3:]), 0, 1)
            g = np.clip(gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:]), 0, 1)
            vals.append(_psnr(p, g))
            exp.dump_image(f"{split}/{step:06d}-{i}.png", p)
            if step == self.num_steps_per_val:
                exp.dump_image(f"{split}/gt-{i}.png", g)
        return {"val_psnr": float(np.mean(vals))}


# --- stage 1 ---------------------------------------------------------------------


@dataclasses.dataclass
class GeoSplatTrainTask(_TrainTaskBase):
    """Stage-1 training task (tests/model/test_geosplat.py presets)."""

    experiment_name: str = "geosplat"
    # model knobs (flat; mapped onto GeoSplatter)
    resolution: int = 96
    light_resolution: int = 512
    scene_scale: float = 1.05
    initial_guess: str = "hybrid"
    tile_capacity: int = 768
    backend: str = "auto"
    # screen-pair budget: None sizes kernel buffers to the 3N worst case
    # (slow + HBM-hungry at production N); presets pass the measured-correct
    # budget for their shape (watch the pair_fill metric; the trainers alarm
    # at fill > 0.95 and overflow drops the FARTHEST gaussians first)
    pairs_budget: int | None = None
    tile_shape: str = "16"
    # padded face budget: every per-gaussian cost in stages 1-2 scales with
    # 6x this; live fill at the S4R shape (grid 96) is ~0.45 of the 1<<18
    # default, so production presets run 1<<17 (watch the face_fill metric)
    max_render_faces: int = 1 << 18
    # shard the camera batch over a 'dp' mesh axis (the TPU replacement for
    # the reference's gradient accumulation, SURVEY §2.11); exactness vs the
    # single-device step is tested in tests/test_dp_geosplat.py
    data_parallel: bool = False

    def build(self, dataset, key):
        from ..models.geosplat import GeoSplatter
        from ..train.geosplat_trainer import GeoSplatTrainer, GeoSplatTrainerConfig

        model = GeoSplatter(
            resolution=self.resolution,
            light_resolution=self.light_resolution,
            scale=self.scene_scale,
            initial_guess=self.initial_guess,
            tile_capacity=self.tile_capacity,
            pairs_budget=self.pairs_budget,
            tile_shape=self.tile_shape,
            max_render_faces=self.max_render_faces,
            backend=self.backend,
        )
        trainer = GeoSplatTrainer(
            GeoSplatTrainerConfig(
                num_steps=self.num_steps, batch_size=self.batch_size
            ),
            model,
        )
        return model, trainer

    def init_state(self, model, trainer, key):
        return self._maybe_dp_state(trainer.init_state(model.init(key)))

    def step_fn(self, model, trainer, state, cams, gt, key, step):
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            from ..parallel.sharding import shard_batch

            return trainer.train_step_dp(
                state, shard_batch(cams, mesh), shard_batch(gt, mesh), key,
                jnp.asarray(step, jnp.float32), mesh,
                sampling=trainer.sampling_at(step),
            )
        return trainer.train_step(
            state, cams, gt, key, jnp.asarray(step, jnp.float32),
            sampling=trainer.sampling_at(step),
        )

    def val_render(self, model, trainer, state, cams, key):
        rgba, _, _ = model.render(
            state["params"], cams, key, quality="exact"
        )
        rgb = gimages.rgb2srgb(jnp.clip(rgba[..., :3], 0, 1)) * rgba[..., 3:]
        return jnp.concatenate((rgb, rgba[..., 3:]), -1)

    def vis_splats(self, model, trainer, state, key):
        if not hasattr(self, "_vis_fn"):
            from ..models.geosplat import get_gaussians_from_face

            @jax.jit
            def fn(params):
                mesh, _, _ = model.get_geometry(params)
                splats, attrs, _, valid = get_gaussians_from_face(
                    model.field, params["field"], mesh, scale=model.scale,
                    initial_guess=model.initial_guess_bias(),
                    max_faces=model.max_render_faces,
                    eval_chunk=model.field_eval_chunk,
                )
                return splats, attrs.kd, valid

            self._vis_fn = fn
        splats, kd, valid = self._vis_fn(state["params"])
        keep = np.asarray(valid)
        return {
            "means": np.asarray(splats.means)[keep],
            "scales": np.asarray(splats.scales)[keep],
            "quats": np.asarray(splats.quats)[keep],
            "opacities": np.asarray(splats.opacities)[keep],
            "colors": np.clip(np.abs(np.asarray(kd)[keep]), 0, 1),
        }

    def export(self, model, trainer, state, key):
        from ..models.geosplat_mc import export_stage1

        return export_stage1(model, state["params"])


# --- stage 2 ---------------------------------------------------------------------


@dataclasses.dataclass
class GeoSplatMCTrainTask(_TrainTaskBase):
    """Stage-2 (MC shading) task; ``load`` = stage-1 output dir
    (tests/model/test_geosplat_mc.py:20-176)."""

    experiment_name: str = "geosplat-mc"
    num_steps_per_val: int = 100
    resolution: int = 96
    scene_scale: float = 1.05
    initial_guess: str = "hybrid"
    tile_capacity: int = 768
    num_samples_x: int = 8
    backend: str = "auto"
    pairs_budget: int | None = None   # see GeoSplatTrainTask.pairs_budget
    tile_shape: str = "16"
    max_render_faces: int = 1 << 18   # see GeoSplatTrainTask
    # dp camera-batch sharding (tests/test_dp_geosplat.py)
    data_parallel: bool = False

    def build(self, dataset, key):
        from ..models.geosplat_mc import GeoSplatterMC
        from ..train.geosplat_mc_trainer import (
            GeoSplatMCTrainer, GeoSplatMCTrainerConfig,
        )

        model = GeoSplatterMC(
            resolution=self.resolution,
            scale=self.scene_scale,
            initial_guess=self.initial_guess,
            tile_capacity=self.tile_capacity,
            num_samples_x=self.num_samples_x,
            pairs_budget=self.pairs_budget,
            tile_shape=self.tile_shape,
            max_render_faces=self.max_render_faces,
            backend=self.backend,
        )
        trainer = GeoSplatMCTrainer(
            GeoSplatMCTrainerConfig(
                num_steps=self.num_steps, batch_size=self.batch_size
            ),
            model,
        )
        return model, trainer

    def init_state(self, model, trainer, key):
        if self.load is None:
            raise ValueError("stage-2 requires --load <stage-1 output dir>")
        export = load_export(find_export(self.load))
        return self._maybe_dp_state(
            trainer.init_state(model.init_from_stage1(export, key))
        )

    def step_fn(self, model, trainer, state, cams, gt, key, step):
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            from ..parallel.sharding import shard_batch

            return trainer.train_step_dp(
                state, shard_batch(cams, mesh), shard_batch(gt, mesh), key,
                jnp.asarray(step, jnp.float32), mesh,
            )
        # per-camera dispatches: the fused stage-2 step exceeds the remote
        # compile deadline at production shape (BASELINE.md round 4)
        return trainer.train_step_accum(
            state, cams, gt, key, jnp.asarray(step, jnp.float32)
        )

    def val_render(self, model, trainer, state, cams, key):
        rgba, _, _ = model.render(state["params"], cams, key)
        rgb = gimages.rgb2srgb(jnp.clip(rgba[..., :3], 0, 1)) * rgba[..., 3:]
        return jnp.concatenate((rgb, rgba[..., 3:]), -1)

    def export(self, model, trainer, state, key):
        from ..models.geosplat_mc import compact_export

        # host-side live-row compaction: stage 3 optimizes per-gaussian
        # params, so handing it the face-budget padding (1.57M rows at the
        # production grid) OOMs its step (see compact_export). The device
        # part runs as ONE jitted program (eager on the remote TPU is a
        # per-primitive dispatch flood — see _validate).
        return compact_export(jax.device_get(
            jax.jit(model.export_model)(state["params"], key)
        ))


# --- stage 3 ---------------------------------------------------------------------


@dataclasses.dataclass
class GeoSplatDeferTrainTask(_TrainTaskBase):
    """Stage-3 (deferred shading) task; ``load`` = stage-2 output dir
    (tests/model/test_geosplat_defer.py presets)."""

    experiment_name: str = "geosplat-defer"
    num_steps: int = 100
    num_steps_per_save: int = 100
    num_steps_per_val: int = 50
    resolution: int = 96
    scene_scale: float = 1.05
    tile_capacity: int = 768
    num_samples_x: int = 8
    backend: str = "auto"
    pairs_budget: int | None = None   # see GeoSplatTrainTask.pairs_budget
    tile_shape: str = "16"
    # dp camera-batch sharding (tests/test_dp_geosplat.py)
    data_parallel: bool = False

    def build(self, dataset, key):
        from ..models.geosplat_defer import GeoSplatterDefer
        from ..train.geosplat_defer_trainer import (
            GeoSplatDeferTrainer, GeoSplatDeferTrainerConfig,
        )

        model = GeoSplatterDefer(
            resolution=self.resolution,
            scale=self.scene_scale,
            tile_capacity=self.tile_capacity,
            num_samples_x=self.num_samples_x,
            pairs_budget=self.pairs_budget,
            tile_shape=self.tile_shape,
            backend=self.backend,
        )
        trainer = GeoSplatDeferTrainer(
            GeoSplatDeferTrainerConfig(
                num_steps=self.num_steps, batch_size=self.batch_size
            ),
            model,
        )
        return model, trainer

    def _geometry(self, model):
        if getattr(self, "_geom_cache", None) is None:
            export = load_export(find_export(self.load))
            self._geom_cache = (export, model.frozen_geometry(export))
        return self._geom_cache

    def init_state(self, model, trainer, key):
        if self.load is None:
            raise ValueError("stage-3 requires --load <stage-2 output dir>")
        export, _ = self._geometry(model)
        return self._maybe_dp_state(
            trainer.init_state(model.init_from_stage2(export, key))
        )

    def step_fn(self, model, trainer, state, cams, gt, key, step):
        _, geom = self._geometry(model)
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            from ..parallel.sharding import shard_batch

            return trainer.train_step_dp(
                state, geom, shard_batch(cams, mesh), shard_batch(gt, mesh),
                key, jnp.asarray(step, jnp.float32), mesh,
            )
        return trainer.train_step_accum(
            state, geom, cams, gt, key, jnp.asarray(step, jnp.float32)
        )

    def val_render(self, model, trainer, state, cams, key):
        _, geom = self._geometry(model)
        rgba, _, _ = model.render(state["params"], geom, cams, key)
        rgb = gimages.rgb2srgb(jnp.clip(rgba[..., :3], 0, 1)) * rgba[..., 3:]
        return jnp.concatenate((rgb, rgba[..., 3:]), -1)

    def vis_splats(self, model, trainer, state, key):
        # stage-3 gaussians are direct parameters — zero extra compute
        p = state["params"]
        return {
            "means": p["means"], "scales": p["scales"], "quats": p["quats"],
            "opacities": p["opacities"],
            "colors": jnp.clip(p["kd"], 0, 1),
        }

    def export(self, model, trainer, state, key):
        # stage-3 output = final params + frozen geometry (the eval surface)
        export, geom = self._geometry(model)
        return {"params": state["params"], "geometry": geom}


# --- mesh-prior variant ----------------------------------------------------------


@dataclasses.dataclass
class GeoSplatPriorTrainTask(_TrainTaskBase):
    """Mesh-prior variant; ``mesh_path`` = initial mesh OBJ/PLY
    (tests/model/test_geosplat_prior.py:19-252)."""

    experiment_name: str = "geosplat-prior"
    mesh_path: Path = Path("mesh.obj")
    scene_scale: float = 1.05
    tile_capacity: int = 768
    num_samples_x: int = 8
    backend: str = "auto"

    def _base_mesh(self):
        if getattr(self, "_mesh_cache", None) is None:
            from ..graphics.mesh import TriangleMesh
            from ..graphics.mesh_io import load_mesh

            data = load_mesh(self.mesh_path)
            self._mesh_cache = TriangleMesh(
                vertices=jnp.asarray(data["vertices"]),
                indices=jnp.asarray(data["indices"]),
            )
        return self._mesh_cache

    def build(self, dataset, key):
        from ..models.geosplat_prior import GeoSplatterPrior
        from ..train.geosplat_prior_trainer import (
            GeoSplatPriorTrainer, GeoSplatPriorTrainerConfig,
        )

        model = GeoSplatterPrior(
            scale=self.scene_scale,
            tile_capacity=self.tile_capacity,
            num_samples_x=self.num_samples_x,
            backend=self.backend,
        )
        trainer = GeoSplatPriorTrainer(
            GeoSplatPriorTrainerConfig(
                num_steps=self.num_steps, batch_size=self.batch_size
            ),
            model,
        )
        return model, trainer

    def init_state(self, model, trainer, key):
        return trainer.init_state(model.init(self._base_mesh(), key))

    def step_fn(self, model, trainer, state, cams, gt, key, step):
        return trainer.train_step(
            state, self._base_mesh(), cams, gt, key,
            jnp.asarray(step, jnp.float32),
        )

    def val_render(self, model, trainer, state, cams, key):
        rgba, _, _ = model.render(state["params"], self._base_mesh(), cams, key)
        rgb = gimages.rgb2srgb(jnp.clip(rgba[..., :3], 0, 1)) * rgba[..., 3:]
        return jnp.concatenate((rgb, rgba[..., 3:]), -1)

    def export(self, model, trainer, state, key):
        return model.export_model(state["params"], self._base_mesh(), key)


# --- vanilla 3DGS ----------------------------------------------------------------


@dataclasses.dataclass
class GSplatTrainTask(_TrainTaskBase):
    """Vanilla 3DGS/2DGS with the densify/cull schedule
    (tests/model/test_gsplat.py presets)."""

    experiment_name: str = "gsplat"
    num_steps: int = 7000
    batch_size: int = 1
    num_steps_per_save: int = 2000
    num_steps_per_val: int = 500
    num_init_gaussians: int = 65536
    sh_degree: int = 3
    rasterize_mode: str = "classic"   # 'classic' | 'antialiased' | '2dgs'
    tile_capacity: int = 1024
    backend: str = "auto"
    # multi-chip data parallelism (greenfield vs the single-GPU reference,
    # SURVEY §2.11): shard the camera batch over a 'dp' mesh axis; params and
    # optimizer state are replicated and XLA inserts the gradient psum
    data_parallel: bool = False

    def build(self, dataset, key):
        from ..models.gsplatter import GSplatter
        from ..train.gsplat_trainer import GSplatTrainer, GSplatTrainerConfig

        model = GSplatter(
            sh_degree=self.sh_degree,
            rasterize_mode=self.rasterize_mode,
            tile_capacity=self.tile_capacity,
            backend=self.backend,
        )
        trainer = GSplatTrainer(
            GSplatTrainerConfig(
                num_steps=self.num_steps, batch_size=self.batch_size
            ),
            model,
            dataset_size=dataset.get_size("train"),
        )
        return model, trainer

    def init_state(self, model, trainer, key):
        from ..graphics.splats import Splats

        splats = Splats.random(
            key, self.num_init_gaussians, sh_degree=self.sh_degree,
            random_scale=1.0,
        )
        state = trainer.init_state(splats)
        if self.data_parallel and jax.device_count() > 1:
            import math

            from ..parallel.sharding import make_mesh, replicate

            # largest device count that divides the batch
            n = math.gcd(self.batch_size, jax.device_count())
            self._mesh = make_mesh(n)
            state = replicate(state, self._mesh)
        return state

    def mesh_size(self) -> int:
        mesh = getattr(self, "_mesh", None)
        return mesh.shape["dp"] if mesh is not None else 1

    def step_fn(self, model, trainer, state, cams, gt, key, step):
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            from ..parallel.sharding import shard_batch

            cams = shard_batch(cams, mesh)
            gt = shard_batch(gt, mesh)
        return trainer.train_step(
            state, cams, gt, key, trainer.max_sh_degree_at(step),
            reg_weights=trainer.reg_weights_at(step),
        )

    def after_update(self, model, trainer, state, step, key, last_wh):
        return trainer.after_update(state, step, key, last_wh)

    def val_render(self, model, trainer, state, cams, key):
        from ..train.gsplat_trainer import params_to_splats

        splats = params_to_splats(state["params"])

        def one(cam):
            rgba, _ = model.render_rgba(splats, cam)
            return rgba

        outs = [one(cams[i]) for i in range(cams.shape[0])]
        return jnp.stack(outs)

    def vis_splats(self, model, trainer, state, key):
        from ..train.gsplat_trainer import params_to_splats

        return params_to_splats(state["params"])

    def export(self, model, trainer, state, key):
        return {k: v for k, v in state["params"].items()}
