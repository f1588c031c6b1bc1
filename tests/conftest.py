"""Test config: run everything on CPU with 8 virtual devices.

This is the standard JAX trick for testing Mesh/shard_map/psum code paths
without a pod (SURVEY.md §4): the same test code runs unchanged on a real
TPU slice.  Must run before jax initializes a backend.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
