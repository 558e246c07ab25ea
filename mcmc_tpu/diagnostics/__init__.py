"""On-device MCMC diagnostics: R-hat, ESS, MCSE, quality gates, Sliced-W2.

Replaces the reference's host-side arviz delegation (run_benchmarks.py:161-195)
with batched jnp reductions that run where the samples live.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_tpu.diagnostics.rhat_ess import (
    split_rhat, ess_bulk, ess_tail, ess_mean, mcse_mean,
)
from mcmc_tpu.diagnostics.wasserstein import (
    sliced_wasserstein_distance, compute_sliced_w2,
)
from mcmc_tpu.diagnostics.gates import (
    detect_divergences, check_summary_statistics, evaluate_gates,
    MIN_ESS_HARD_GATE, MIN_ESS_TAIL_HARD_GATE, MIN_ESS_QUALITY,
    MIN_ESS_TAIL_QUALITY, INEFFICIENT_THRESHOLD, HIGH_EFFICIENCY_THRESHOLD,
    DIVERGENCE_DELTA_H,
)


@jax.jit
def _diagnostics_device(samples):
    """All scalar diagnostics in one fused device computation."""
    rhat = split_rhat(samples)
    bulk = ess_bulk(samples)
    tail = ess_tail(samples)
    mcse = mcse_mean(samples)
    flat = samples.reshape(-1, samples.shape[-1])
    mean = jnp.mean(flat, axis=0)
    std = jnp.std(flat, axis=0)
    return rhat, bulk, tail, mcse, mean, std


def compute_diagnostics(samples) -> dict:
    """Convergence diagnostics + summary statistics for (n, chains, dim) samples.

    Output-key parity with the reference's arviz-based version
    (run_benchmarks.py:161-195); ``summary`` is a plain dict of arrays instead
    of an arviz DataFrame.
    """
    rhat, bulk, tail, mcse, mean, std = _diagnostics_device(jnp.asarray(samples))
    rhat, bulk, tail = np.asarray(rhat), np.asarray(bulk), np.asarray(tail)
    return {
        "rhat_max": float(np.max(rhat)),
        "rhat_mean": float(np.mean(rhat)),
        "ess_bulk_min": float(np.min(bulk)),
        "ess_bulk_mean": float(np.mean(bulk)),
        "ess_tail_min": float(np.min(tail)),
        "ess_tail_mean": float(np.mean(tail)),
        "mean_estimate": np.asarray(mean),
        "std_estimate": np.asarray(std),
        "summary": {
            "mean": np.asarray(mean),
            "sd": np.asarray(std),
            "mcse_mean": np.asarray(mcse),
            "ess_bulk": bulk,
            "ess_tail": tail,
            "r_hat": rhat,
        },
    }


__all__ = [
    "split_rhat", "ess_bulk", "ess_tail", "ess_mean", "mcse_mean",
    "sliced_wasserstein_distance", "compute_sliced_w2",
    "detect_divergences", "check_summary_statistics", "evaluate_gates",
    "compute_diagnostics",
    "MIN_ESS_HARD_GATE", "MIN_ESS_TAIL_HARD_GATE", "MIN_ESS_QUALITY",
    "MIN_ESS_TAIL_QUALITY", "INEFFICIENT_THRESHOLD", "HIGH_EFFICIENCY_THRESHOLD",
    "DIVERGENCE_DELTA_H",
]
