import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; integer DSP is bit-exact on any backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The fused pipelines are multi-minute LLVM compiles on small CI hosts;
# the persistent cache makes reruns instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/x264_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
