import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; integer DSP is bit-exact on any backend.
os.environ["JAX_PLATFORMS"] = "cpu"

# Drop the TPU (axon) PJRT plugin from the import path entirely: when its
# remote tunnel is unhealthy it can wedge even CPU-only JAX startup.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p)
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The fused pipelines are multi-minute LLVM compiles on small CI hosts;
# the persistent cache makes reruns instant. NB: in jax 0.9 the env var
# is not honored — jax.config.update is required.
import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, binding the platform config before this file runs;
# the env var above is then a no-op and jax.devices() would hit the TPU
# tunnel (which wedges under the test workload). Force the binding back.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the CPU-PJRT executable serialize/cache
# write path segfaults nondeterministically on this jaxlib (observed in
# rounds 2 and 3 at compilation_cache.py:265 even with a fresh cache
# dir), killing the whole suite. Reads are fine; writes are the hazard.
# Default OFF for reliability; opt back in with X264_TPU_TEST_CACHE=1.
if os.environ.get("X264_TPU_TEST_CACHE") == "1":
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/x264_tpu_jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


# XLA CPU compiles have segfaulted nondeterministically deep into a
# single-process run (after ~40 accumulated executables; observed in
# backend_compile_and_load and in the executable-serialize path).
# Dropping compiled-executable references between modules keeps the
# process footprint bounded and has kept the crash from reproducing.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
