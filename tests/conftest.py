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

# Persistent XLA compilation cache: the fast tier is compile-bound on this
# 1-vCPU host (hundreds of jit/shard_map programs), and the programs are
# identical across runs. First run populates ./.jax_test_cache (gitignored);
# repeat runs skip XLA backend compilation. Safe: keyed by HLO + compile
# options + backend, so any code change recompiles.
# CAUTION: XLA executable (de)serialization in this jax/jaxlib build
# segfaults nondeterministically (~1/1000 entries; observed in BOTH
# get_executable_and_time and put_executable_and_time, single process,
# healthy disk/RAM). At min_compile_time 0.1s a cold suite writes ~900
# entries and dies most runs; caching only the genuinely expensive
# programs (>= 5s: the persistent-NUTS machines, fused shard_map
# pipelines) keeps most of the 32 -> 13 min fast-tier win at ~20x less
# exposure. If a run still dies with a segfault in compilation_cache.*,
# `rm -rf .jax_test_cache` and rerun, or export MCMC_TPU_TEST_CACHE=0 to
# disable persistence entirely.
if os.environ.get("MCMC_TPU_TEST_CACHE", "1") != "0":
    _cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                              ".jax_test_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
