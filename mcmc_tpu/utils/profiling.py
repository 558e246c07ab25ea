"""Profiling and throughput counters.

The reference's only tracing is wall-clock prints around warmup/sampling
(reference run_benchmarks.py:497-557, SURVEY.md §5); here that is upgraded to
jax.profiler integration plus steps/sec and ESS/sec counters — the BASELINE
metrics — while keeping simple wall-clock timers for the result schema.
"""

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def wall_timer():
    """Wall-clock timer context: `with wall_timer() as t: ...; t.elapsed`."""
    class _T:
        elapsed = 0.0
    t = _T()
    start = time.time()
    try:
        yield t
    finally:
        t.elapsed = time.time() - start


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context (viewable in TensorBoard / Perfetto).

    No-op when log_dir is None so call sites can be left in production code.
    """
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def force_completion(tree):
    """Force device execution to finish (timing barrier).

    block_until_ready alone can return early through remote-TPU tunnels; a
    scalar host transfer is the reliable barrier.
    """
    import jax.numpy as jnp
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))
    return tree


def throughput_counters(num_samples: int, n_chains: int, num_steps: int,
                        sample_time: float, ess_bulk_min: Optional[float] = None,
                        n_devices: int = 1) -> Dict[str, float]:
    """steps/sec, chain-steps/sec, grad-evals/sec and ESS/sec(/chip)."""
    chain_steps = num_samples * n_chains
    out = {
        "steps_per_sec": num_samples / sample_time,
        "chain_steps_per_sec": chain_steps / sample_time,
        "grad_evals_per_sec": chain_steps * num_steps / sample_time,
        "chain_steps_per_sec_per_chip": chain_steps / sample_time / n_devices,
    }
    if ess_bulk_min is not None:
        out["ess_per_sec"] = ess_bulk_min / sample_time
        out["ess_per_sec_per_chip"] = ess_bulk_min / sample_time / n_devices
    return out


def enable_compilation_cache(default_dir: str = "~/.cache/mcmc_tpu/jax"):
    """Enable the persistent XLA compilation cache unless the user opted out.

    Policy (shared by both CLIs): honor JAX_COMPILATION_CACHE_DIR if the
    variable is SET — including set-to-empty, which disables caching (e.g.
    read-only $HOME, debugging a stale cache). Only when unset fall back to
    `default_dir`. Safe to call any time before the first compilation.
    """
    import os

    import jax

    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        path = os.environ["JAX_COMPILATION_CACHE_DIR"]
    else:
        path = os.path.expanduser(default_dir)
    # empty -> None actively DISABLES a previously-enabled cache, so the
    # opt-out works even after an earlier enable in the same process
    jax.config.update("jax_compilation_cache_dir", path or None)
