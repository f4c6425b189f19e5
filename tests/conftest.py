"""Test configuration: force an 8-virtual-device CPU backend so every test —
including multi-chip sharding tests — runs fast and without TPU hardware.

The container's sitecustomize registers a remote-TPU ('axon') PJRT plugin at
interpreter start and pins JAX_PLATFORMS=axon; we override both before any
backend is initialized (first jax.devices() call happens inside tests)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the heavy train-step compiles (3-10 min on CPU
# XLA) are identical across runs — cache them so repeat suite runs are fast.
# The suite OWNS its cache dir (VERDICT r3 #4): round 3's full-suite segfault
# was a corrupted entry in a /tmp cache shared with bench/profiler writers
# (fatal signal inside the persistent-cache read); tests now never share a
# cache with any other writer, and bench uses the repo's .jax_cache instead.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_cpu_tests")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got: " + str(jax.devices()[:1])
)
assert jax.device_count() == 8
