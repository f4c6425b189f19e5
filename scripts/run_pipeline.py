#!/usr/bin/env python
"""The full 3-stage pipeline runner (parity: reference ``eval.sh:1-5``):
stage-1 train -> export -> stage-2 train -> export -> stage-3 train ->
optional evaluation, all driven from one command.

Usage:
  python scripts/run_pipeline.py --scene hotdog --dataset_path data/hotdog \
      [--s1-steps 500 --s2-steps 500 --s3-steps 100 --resolution 96]
      [--eval reliteval --skip-nvs]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--dataset_path", type=Path, required=True)
    ap.add_argument("--resolution", type=int, default=96)
    ap.add_argument("--scene_scale", type=float, default=0.8)
    ap.add_argument("--light_resolution", type=int, default=512)
    ap.add_argument("--s1-steps", type=int, default=500)
    ap.add_argument("--s2-steps", type=int, default=500)
    ap.add_argument("--s3-steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scale_factor", type=float, default=None)
    ap.add_argument("--tile_capacity", type=int, default=768)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval", choices=["none", "nvseval", "reliteval"], default="none")
    ap.add_argument("--skip-nvs", action="store_true")
    ap.add_argument("--render-rlit", action="store_true")
    ap.add_argument("--render-albedo", action="store_true")
    args = ap.parse_args()

    from geosplatting_tpu.data.dataset import Dataset
    from geosplatting_tpu.engine.experiment import Experiment
    from geosplatting_tpu.models.geosplat import GeoSplatter
    from geosplatting_tpu.models.geosplat_mc import GeoSplatterMC, export_stage1
    from geosplatting_tpu.models.geosplat_defer import GeoSplatterDefer
    from geosplatting_tpu.train.geosplat_trainer import (
        GeoSplatTrainer, GeoSplatTrainerConfig,
    )
    from geosplatting_tpu.train.geosplat_mc_trainer import (
        GeoSplatMCTrainer, GeoSplatMCTrainerConfig,
    )
    from geosplatting_tpu.train.geosplat_defer_trainer import (
        GeoSplatDeferTrainer, GeoSplatDeferTrainerConfig,
    )
    from geosplatting_tpu.ui import console

    dataset = Dataset(args.dataset_path, scale_factor=args.scale_factor)
    exp = Experiment(f"pipeline-{args.scene}").setup()
    key = jax.random.key(args.seed)

    # ---- stage 1 --------------------------------------------------------------
    s1 = GeoSplatter(
        resolution=args.resolution, light_resolution=args.light_resolution,
        scale=args.scene_scale, tile_capacity=args.tile_capacity,
    )
    t1 = GeoSplatTrainer(
        GeoSplatTrainerConfig(num_steps=args.s1_steps, batch_size=args.batch), s1
    )
    state = t1.init_state(s1.init(jax.random.key(args.seed)))
    it = dataset.iter_batches("train", args.batch, seed=args.seed)
    t0 = time.time()
    for step in range(args.s1_steps):
        cams, gt, _ = next(it)
        key, sub = jax.random.split(key)
        state, m = t1.train_step(
            state, cams, gt, sub, jnp.asarray(step, jnp.float32),
            sampling=t1.sampling_at(step),
        )
        if (step + 1) % 50 == 0:
            exp.log(
                f"s1 step {step+1}: loss={float(m['loss']):.4f} "
                f"psnr={float(m['splat_psnr']):.2f} it/s={(step+1)/(time.time()-t0):.2f}"
            )
    export1 = export_stage1(s1, state["params"])
    console.print(f"[green]stage-1 done[/green] ({time.time()-t0:.0f}s)")

    # ---- stage 2 --------------------------------------------------------------
    s2 = GeoSplatterMC(
        resolution=args.resolution, scale=args.scene_scale,
        tile_capacity=args.tile_capacity,
    )
    t2 = GeoSplatMCTrainer(
        GeoSplatMCTrainerConfig(num_steps=args.s2_steps, batch_size=args.batch), s2
    )
    state2 = t2.init_state(s2.init_from_stage1(export1, jax.random.key(args.seed + 1)))
    t0 = time.time()
    for step in range(args.s2_steps):
        cams, gt, _ = next(it)
        key, sub = jax.random.split(key)
        state2, m = t2.train_step(state2, cams, gt, sub, jnp.asarray(step, jnp.float32))
        if (step + 1) % 50 == 0:
            exp.log(
                f"s2 step {step+1}: loss={float(m['loss']):.4f} "
                f"psnr={float(m['splat_psnr']):.2f}"
            )
    from geosplatting_tpu.models.geosplat_mc import compact_export
    export2 = compact_export(jax.device_get(
        s2.export_model(state2["params"], jax.random.key(args.seed + 2))))
    console.print(f"[green]stage-2 done[/green] ({time.time()-t0:.0f}s)")

    # ---- stage 3 --------------------------------------------------------------
    s3 = GeoSplatterDefer(
        resolution=args.resolution, scale=args.scene_scale,
        tile_capacity=args.tile_capacity,
    )
    params3 = s3.init_from_stage2(export2, jax.random.key(args.seed + 3))
    geometry = s3.frozen_geometry(export2)
    t3 = GeoSplatDeferTrainer(
        GeoSplatDeferTrainerConfig(num_steps=args.s3_steps, batch_size=args.batch), s3
    )
    state3 = t3.init_state(params3)
    t0 = time.time()
    for step in range(args.s3_steps):
        cams, gt, _ = next(it)
        key, sub = jax.random.split(key)
        state3, m = t3.train_step(
            state3, geometry, cams, gt, sub, jnp.asarray(step, jnp.float32)
        )
        if (step + 1) % 20 == 0:
            exp.log(
                f"s3 step {step+1}: loss={float(m['loss']):.4f} "
                f"psnr={float(m['splat_psnr']):.2f}"
            )
    console.print(f"[green]stage-3 done[/green] ({time.time()-t0:.0f}s)")

    from geosplatting_tpu.engine.train_task import save_checkpoint

    save_checkpoint(exp.ckpt_dir, args.s3_steps, state3["params"])

    # ---- evaluation --------------------------------------------------------------
    if args.eval != "none":
        from geosplatting_tpu.engine.eval_tasks import RelightEvaler

        ev = RelightEvaler(
            model=s3, params=state3["params"], geometry=geometry,
            skip_nvs=args.skip_nvs,
            skip_rlit=args.eval == "nvseval",
            skip_mat=args.eval == "nvseval",
        )
        results = ev.run(dataset)
        for k, v in results.items():
            console.print(f"{k}: {v}")
        exp.log(f"eval: {results}")


if __name__ == "__main__":
    main()
