#!/usr/bin/env python
"""Grad-quality acceptance test for pair-kernel precision knobs (VERDICT r3
#2a / BASELINE.md knob-decision procedure).

Round-4 resolution: the bf16 moment matmul (GEOS_MOMENT_PREC=default) was
re-measured at the tight-bounds pair volume and the r2-era −18% had shrunk
to −0.7% (BASELINE.md round-4 A/B table) — the knob stays at `highest` and
no quality gate was needed. This harness REMAINS the defined acceptance
test for any future numerics knob (BASELINE.md knob decision procedure #3):
train stage-1 ONLY on the analytic two-sphere scene at
the reduced quality-bench shape (128^2, grid 48, 200 steps, batch 4 — the
shape whose tracked floors live in BASELINE.md) under BOTH knob settings at
identical seeds, and require |delta s1-train PSNR| < 0.1 dB on every seed.
Stage 1 is where the knob bites: the moment matmul only exists in the
rasterizer BACKWARD, and its consumers are the geometry gradients
(means2d/conic) that drive SDF/deform convergence.

Run (sets the env knob itself in subprocesses so one invocation = verdict):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/moment_ab.py
Env: AB_SEEDS (default "0,1"), AB_STEPS (200), AB_RES (128), AB_GRID (48),
AB_KNOB (GEOS_MOMENT_PREC), AB_VALUES ("highest,default").
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SEEDS = [int(s) for s in os.environ.get("AB_SEEDS", "0,1").split(",")]
STEPS = int(os.environ.get("AB_STEPS", 200))
RES = int(os.environ.get("AB_RES", 128))
GRID = int(os.environ.get("AB_GRID", 48))
KNOB = os.environ.get("AB_KNOB", "GEOS_MOMENT_PREC")
VALUES = os.environ.get("AB_VALUES", "highest,default").split(",")
THRESHOLD_DB = float(os.environ.get("AB_THRESHOLD_DB", 0.1))

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
from geosplatting_tpu.bench import quality as q
from geosplatting_tpu.models.geosplat import GeoSplatter
from geosplatting_tpu.train.geosplat_trainer import (
    GeoSplatTrainer, GeoSplatTrainerConfig,
)

seed = {seed}
key = jax.random.key(seed)
rng = np.random.default_rng(seed)
cams = q.make_cameras("train", 24, width={res}, height={res})
env = q.make_envmap(kind="train")
gt = q.render_gt_views(cams, env, jax.random.key(7), 16)
model = GeoSplatter(resolution={grid}, light_resolution=128, scale=1.0,
                    tile_capacity=512, tile_chunk=4)
params = model.init(jax.random.key(1))
params["sdf"] = jnp.linalg.norm(
    model.make_grid().base_vertices(), axis=-1) - 0.45
trainer = GeoSplatTrainer(
    GeoSplatTrainerConfig(num_steps={steps}, batch_size=4,
                          vertex_sample_warmup=25),
    model,
)
state = trainer.init_state(params)
t0 = time.time()
psnrs = []
for step in range({steps}):
    key, sub = jax.random.split(key)
    idx = jnp.asarray(rng.choice(24, size=4, replace=False))
    state, m = trainer.train_step(
        state, cams[idx], gt[idx], sub, jnp.asarray(step, jnp.float32),
        sampling=trainer.sampling_at(step),
    )
    psnrs.append(float(m["splat_psnr"]))  # blocks every step
tail = float(np.mean(psnrs[-20:]))
print("AB_RESULT " + json.dumps({{
    "seed": seed, "knob": os.environ.get({knob!r}, "<unset>"),
    "tail_psnr": round(tail, 4), "final_psnr": round(psnrs[-1], 4),
    "wall_s": round(time.time() - t0, 1),
}}), flush=True)
"""


def run_one(value: str, seed: int) -> dict:
    env = dict(os.environ)
    env[KNOB] = value
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    code = _CHILD.format(repo=str(REPO), seed=seed, res=RES, grid=GRID,
                         steps=STEPS, knob=KNOB)
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=5400,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"{KNOB}={value} seed={seed} produced no result "
        f"(rc={proc.returncode}):\n{proc.stderr[-3000:]}"
    )


def main() -> None:
    t0 = time.time()
    results: dict[str, dict[int, dict]] = {}
    for value in VALUES:
        for seed in SEEDS:
            r = run_one(value, seed)
            results.setdefault(value, {})[seed] = r
            print(f"{KNOB}={value} seed={seed}: "
                  f"tail_psnr={r['tail_psnr']} wall={r['wall_s']}s",
                  flush=True)
    base, cand = VALUES[0], VALUES[1]
    deltas = {
        s: results[cand][s]["tail_psnr"] - results[base][s]["tail_psnr"]
        for s in SEEDS
    }
    ok = all(abs(d) < THRESHOLD_DB for d in deltas.values())
    print(json.dumps({
        "knob": KNOB, "base": base, "candidate": cand,
        "tail_psnr_base": {s: results[base][s]["tail_psnr"] for s in SEEDS},
        "tail_psnr_cand": {s: results[cand][s]["tail_psnr"] for s in SEEDS},
        "delta_db": {s: round(d, 4) for s, d in deltas.items()},
        "threshold_db": THRESHOLD_DB,
        "accept": ok,
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
