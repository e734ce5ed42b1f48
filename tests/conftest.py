"""Test configuration: run everything on a virtual 8-device CPU mesh so
data-parallel/pjit paths are exercised without TPU hardware (SURVEY.md §4:
the TPU-world "fake backend")."""

import os

# must be set before jax imports anywhere in the test process; overwrite (not
# setdefault): the build environment presets JAX_PLATFORMS=axon (remote TPU),
# which would make every eager test op a network round-trip
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: repeated test runs skip recompiles
import jax  # noqa: E402

# the axon TPU plugin force-sets jax_platforms="axon,cpu" at import,
# OVERRIDING the env var — pin it back to cpu-only explicitly, with 8
# virtual devices for the data-parallel tests
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# golden-value tests compare against float64-ish numpy references; JAX's
# default matmul precision uses bf16 passes even for f32 inputs
jax.config.update("jax_default_matmul_precision", "highest")
