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
jax.config.update("jax_compilation_cache_dir", "/tmp/x264_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
