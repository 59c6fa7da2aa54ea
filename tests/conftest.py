import os
import sys

# Tests run on the CPU backend with an 8-device virtual mesh so that all
# sharding/collective paths are exercised without TPU hardware (the analog of
# the reference's "no cluster needed" property — SURVEY.md §4.3).
#
# The environment's sitecustomize registers a remote-TPU (axon) PJRT plugin
# and pins JAX_PLATFORMS=axon, so we must override the config explicitly —
# setdefault is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-bound on a small host
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/halo2_tpu/xla_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults (in fresh compiles and in compile-cache
    deserialization alike) once a process has accumulated enough live JIT
    executables — the same program always works in a fresh process.
    Dropping executables between modules keeps the resident JIT footprint
    bounded; the persistent on-disk cache makes re-loads cheap."""
    yield
    jax.clear_caches()
