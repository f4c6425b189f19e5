"""Quality regression: the full 3-stage chain on the analytic two-sphere PBR
scene must keep reconstructing above floor PSNRs (VERDICT r1 #3 — a tracked
quality number with a regression threshold).

Thresholds are intentionally loose (tiny scale, few steps): they catch
catastrophic regressions — broken gradients, shading-path sign errors,
export/init hand-off corruption — not fine quality drift. The production
number is produced by ``scripts/quality_bench.py`` on TPU and recorded in
BASELINE.md.

Runs in a subprocess (heavy compile; same isolation as the task-chain test).
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest


@pytest.mark.chain
def test_quality_chain_thresholds():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    env.pop("XLA_FLAGS", None)
    # no persistent compile cache on CPU (see tests/conftest.py: cached
    # CPU executables embed host machine code and SIGILL across VM hosts)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    result = subprocess.run(
        [sys.executable, "-c",
         "import tests.test_quality as m; m._run()"],
        env=env, capture_output=True, text=True,
        cwd=Path(__file__).resolve().parents[1], timeout=3300,
    )
    assert result.returncode == 0, (
        f"subprocess failed:\nstdout:{result.stdout[-3000:]}\n"
        f"stderr:{result.stderr[-3000:]}"
    )


def _run():
    from geosplatting_tpu.bench.quality_chain import run_quality_chain

    r = run_quality_chain(
        img_res=32, grid_res=10, n_train=10, n_test=2, batch=2,
        s1_steps=40, s2_steps=12, s3_steps=8, gt_spp_x=6, train_spp_x=2,
        light_resolution=32, tile_capacity=96, tile_chunk=4, seed=0,
        log=lambda m: print(m, flush=True),
    )
    print("quality:", r, flush=True)
    # regression floors (tiny-scale; catastrophic-breakage detectors)
    assert r["nvs_psnr"] > 14.0, r
    assert r["relight_psnr"] > 12.0, r
    assert r["albedo_psnr"] > 15.0, r
    assert r["roughness_mse"] < 0.5, r
    assert r["s1_train_psnr"] > 14.0, r
