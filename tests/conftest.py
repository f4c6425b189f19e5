"""Test configuration: force an 8-virtual-device CPU backend so every test —
including multi-chip sharding tests — runs fast and without TPU hardware.

The container's sitecustomize registers a remote-TPU ('axon') PJRT plugin at
interpreter start and pins JAX_PLATFORMS=axon; we override both before any
backend is initialized (first jax.devices() call happens inside tests)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)  # see note below
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Suite wall time is dominated by XLA:CPU compiles of full train steps
# (pytest.ini). Dialing back the LLVM backend passes cuts the heaviest
# single test 289 -> 243 s (measured round 5) with zero coverage change —
# tests assert numerics, not op speed, and XLA's HLO-level semantics are
# unaffected by backend codegen effort.
if "xla_backend_optimization_level" not in flags:
    flags = (
        flags + " --xla_backend_optimization_level=1"
        " --xla_llvm_disable_expensive_passes=true"
    ).strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_default_matmul_precision", "highest")
# NO persistent compile cache for the CPU suite (round-4 diagnosis of the
# round-3 "corrupted cache" segfault): CPU-XLA cache entries embed HOST
# MACHINE CODE, and this VM's visible CPU features vary between sessions —
# the loader warns "Machine type used for XLA:CPU compilation doesn't match
# the machine type for execution ... could lead to execution errors such as
# SIGILL", and two separate rounds measured exactly that as a fatal signal
# mid-suite (round 3 in the cache READ, round 4 with a fresh suite-owned
# dir). Cold CPU compiles are the price of a suite that cannot be crashed
# by stale machine code; the TPU-side .jax_cache is unaffected (its entries
# are device binaries compiled remotely).

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got: " + str(jax.devices()[:1])
)
assert jax.device_count() == 8
