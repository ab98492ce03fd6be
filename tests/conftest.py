import os

# Multi-device sharding tests run on a virtual 8-device CPU mesh; correctness
# tests (EOC / expectation tables) need float64, so force CPU + x64 here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU-tunnel plugin injects itself into jax_platforms regardless of
# the env var, so force CPU explicitly after import
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite re-jits the same kernels across
# many test files; caching compiles cuts the warm suite wall time sharply
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/dune_hdd_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
