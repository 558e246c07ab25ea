"""Test configuration: run on CPU with 8 virtual devices and x64 enabled.

Tests validate exact reference-parity numerics (float64 energies) and multi-chip
sharding on a virtual CPU mesh; TPU performance is exercised by bench.py instead.

Note: this environment's sitecustomize force-registers a remote TPU plugin and
sets JAX_PLATFORMS=axon, so the env var alone is not enough — the platform must
be overridden via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# OPT-IN persistent XLA compilation cache (export MCMC_TPU_TEST_CACHE=1):
# the fast tier is compile-bound on this 1-vCPU host and the programs are
# identical across runs, so a warm ./.jax_test_cache (gitignored) saves
# minutes — but XLA executable (de)serialization in this jax/jaxlib build
# segfaults nondeterministically (observed in BOTH get_executable_and_time
# and put_executable_and_time, single process, healthy disk/RAM). Limiting
# writes to >= 5s programs cut exposure ~20x, yet after any code change
# that dirties the big entries the re-writes still killed 2/2 suite runs
# (SIGSEGV in put_executable_and_time, 2026-08-20). A test suite that
# flakes on infra is worse than a slower one, so persistence is now OFF
# unless explicitly requested; iterate locally with MCMC_TPU_TEST_CACHE=1
# once the cache is warm for your tree, and `rm -rf .jax_test_cache` +
# rerun uncached if a cached run segfaults in compilation_cache.*.
if os.environ.get("MCMC_TPU_TEST_CACHE", "0") == "1":
    _cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                              ".jax_test_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
