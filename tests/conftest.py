"""Test config: run everything on CPU with 8 virtual devices.

This is the standard JAX trick for testing Mesh/shard_map/psum code paths
without a pod (SURVEY.md §4): the same test code runs unchanged on a real
TPU slice.  Must run before jax initializes a backend.

``JAX_PLATFORMS`` is forced (not defaulted): a pre-set TPU platform in the
environment would otherwise silently produce a 1-device mesh and sharding
tests would pass without testing sharding.  TPU-hardware-gated tests opt in
explicitly by spawning a subprocess without these vars (see
tests/test_render.py's golden TPU test).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: the suite's cost is dominated by XLA:CPU
# compiles of the traced render graphs, which are identical across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
