"""Test config: run everything on CPU with 8 virtual devices.

This is the standard JAX trick for testing Mesh/shard_map/psum code paths
without a pod (SURVEY.md §4): the same test code runs unchanged on a real
TPU slice.  Must run before jax initializes a backend.

``JAX_PLATFORMS`` is forced (not defaulted): a pre-set TPU platform in the
environment would otherwise silently produce a 1-device mesh and sharding
tests would pass without testing sharding.  The axon TPU plugin registers
itself from sitecustomize at interpreter start and ignores the env var,
so sharding tests additionally run in a scrubbed-env subprocess (see
tests/sharding_subproc.py) while TPU-hardware-gated tests (@tpu_only)
deliberately use the in-process tunnel backend.

When the axon relay (the tunnel endpoint) is DOWN, the first jax backend
init blocks forever in the plugin's connect loop and the whole test run
hangs before collecting a single test.  The probe below detects that and
pins the platform config to CPU (works even though jax is already
imported via pytest plugins — the override just has to land before
backend init), so the suite runs on the virtual-CPU backend and the
TPU-gated tests skip instead of hanging.
"""
import os
import socket

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


def _axon_relay_dead() -> bool:
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
        return False
    try:
        socket.create_connection(("127.0.0.1", 8103), timeout=5).close()
        return False
    except OSError:
        return True


if _axon_relay_dead():
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    print("conftest: axon relay is down -> CPU backend "
          "(TPU-gated tests will skip)", file=sys.stderr)
