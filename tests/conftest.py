"""Test configuration: run everything on a virtual 8-device CPU mesh so
data-parallel/pjit paths are exercised without TPU hardware (SURVEY.md §4:
the TPU-world "fake backend")."""

import os

# must be set before jax imports anywhere in the test process
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
