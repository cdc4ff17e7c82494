"""Test config: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding logic is exercised without TPU hardware.

Note: this image pre-sets JAX_PLATFORMS=axon and the env var cannot be
overridden from outside; jax.config.update() before backend init is the
only reliable switch (gotcha recorded in .claude/skills/verify/SKILL.md).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the fused frame programs take minutes to
# build on this 1-core box; cache them across test files/processes.
# PCAMV_JAX_CACHE overrides the dir — concurrent pytest processes on
# the SAME cache segfault on racing entries (use a private dir).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PCAMV_JAX_CACHE",
                                 os.path.expanduser("~/.cache/pcamv_jax_cpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live compiled executables after each test module.

    The full suite compiles hundreds of XLA CPU programs in one
    process; keeping them all live has crashed LLVM mid-compile
    (deterministic SIGSEGV ~2/3 into the suite, reproduced twice, gone
    when the crashing test runs alone). The persistent compile cache
    makes the recompiles cheap."""
    yield
    jax.clear_caches()
