"""Op-level profile of the production stage-1 train step.

Captures a jax.profiler trace of REPS blocked steps on the real TPU and
prints the top HLO ops by self time via xprof's hlo_stats converter — the
ground-truth answer to "where do the 4.2 seconds actually go" that the
piece-level profilers can only bracket.

  PYTHONPATH=/root/.axon_site:/root/repo PAIRS_BUDGET=1400000 \
      python scripts/trace_stage1.py
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp

from geosplatting_tpu.graphics.cameras import Cameras
from geosplatting_tpu.models.geosplat import GeoSplatter
from geosplatting_tpu.train.geosplat_trainer import (
    GeoSplatTrainer, GeoSplatTrainerConfig,
)

W = H = int(os.environ.get("RES_IMG", 800))
RES = int(os.environ.get("RES_GRID", 96))
BATCH = int(os.environ.get("BATCH", 8))
REPS = int(os.environ.get("REPS", 2))
BUDGET = int(os.environ.get("PAIRS_BUDGET", 1_400_000))
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/geos_trace")
TOP = int(os.environ.get("TOP", 40))


def main():
    model = GeoSplatter(resolution=RES, scale=0.8, pairs_budget=BUDGET)
    params = model.init(jax.random.key(1))
    grid = model.make_grid()
    params["sdf"] = jnp.linalg.norm(grid.base_vertices(), axis=-1) - 0.45
    cams = Cameras.from_orbit(
        center=jnp.zeros(3), radius=2.0, elevation_degrees=15.0,
        num_samples=BATCH, width=W, height=H,
    )
    gt = jnp.zeros((BATCH, H, W, 4))
    trainer = GeoSplatTrainer(GeoSplatTrainerConfig(batch_size=BATCH), model)
    state = trainer.init_state(params)
    key = jax.random.key(0)

    def one(state, key):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(
            state, cams, gt, sub, jnp.asarray(200.0), sampling="face"
        )
        float(m["loss"])
        return state, key

    t0 = time.time()
    state, key = one(state, key)            # compile + warm
    print(f"warmup {time.time() - t0:.1f}s", flush=True)
    state, key = one(state, key)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(REPS):
            state, key = one(state, key)

    paths = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True
    ), key=os.path.getmtime)
    assert paths, f"no xplane under {TRACE_DIR}"
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # gviz table: cols + rows
    cols = [c["label"] for c in obj["cols"]]
    rows = [[c["v"] if c else None for c in r["c"]] for r in obj["rows"]]
    i_time = next(i for i, c in enumerate(cols)
                  if "self" in c.lower() and "time" in c.lower()
                  and "%" not in c)
    i_name = next((i for i, c in enumerate(cols)
                   if "expression" in c.lower() or "name" in c.lower()), 1)
    i_cat = next((i for i, c in enumerate(cols)
                  if "category" in c.lower()), None)
    rows.sort(key=lambda r: -(r[i_time] or 0))
    total = sum(r[i_time] or 0 for r in rows)
    print(f"total self time {total / 1e6:.1f} s (over {REPS} steps)")
    print(f"{'us':>12}  {'%':>5}  op")
    for r in rows[:TOP]:
        t = r[i_time] or 0
        cat = f" [{r[i_cat]}]" if i_cat is not None else ""
        name = str(r[i_name])[:150]
        print(f"{t:12.0f}  {100 * t / max(total, 1):5.1f}  {name}{cat}",
              flush=True)


if __name__ == "__main__":
    main()
