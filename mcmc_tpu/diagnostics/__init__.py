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
    ConvergenceW2Tracker,
)
from mcmc_tpu.diagnostics.model_comparison import (
    psis_loo, waic, compare, pointwise_log_likelihood,
    LooResult, WaicResult,
)
from mcmc_tpu.diagnostics.streaming import (
    ess_bulk_chunked, split_rhat_chunked, ess_tail_chunked,
    ess_mean_chunked, mcse_mean_chunked, compute_diagnostics_chunked,
)
from mcmc_tpu.diagnostics.gates import (
    detect_divergences, check_summary_statistics, evaluate_gates,
    evaluate_smc_gates,
    MIN_ESS_HARD_GATE, MIN_ESS_TAIL_HARD_GATE, MIN_ESS_QUALITY,
    MIN_ESS_TAIL_QUALITY, INEFFICIENT_THRESHOLD, HIGH_EFFICIENCY_THRESHOLD,
    DIVERGENCE_DELTA_H,
)


@jax.jit
def _moments_device(samples):
    flat = samples.reshape(-1, samples.shape[-1])
    return jnp.mean(flat, axis=0), jnp.std(flat, axis=0)


# Dims processed per dispatch for large histories. Keeping each diagnostics
# program modest avoids a remote-TPU runtime fault observed when the fully
# fused (R-hat + bulk/tail ESS + MCSE) program ran on multi-hundred-MB
# histories ("TPU worker process crashed"), and caps peak memory for the FFT
# buffers (which are complex64 at 2x the padded history size per dim).
_DIM_CHUNK = 8


def _diagnostics_device(samples):
    """All scalar diagnostics, dispatched piecewise over dim chunks."""
    n, m, d = samples.shape
    outs = {"rhat": [], "bulk": [], "tail": [], "mcse": []}
    for start in range(0, d, _DIM_CHUNK):
        block = samples[:, :, start:start + _DIM_CHUNK]
        outs["rhat"].append(split_rhat(block))
        outs["bulk"].append(ess_bulk(block))
        outs["tail"].append(ess_tail(block))
        outs["mcse"].append(mcse_mean(block))
    mean, std = _moments_device(samples)
    cat = {k: jnp.concatenate(v) for k, v in outs.items()}
    return cat["rhat"], cat["bulk"], cat["tail"], cat["mcse"], mean, std


# Above this history size the per-dim-block programs still hold every chain's
# FFT/sort buffers at once; route to the chain+dim-chunked estimators instead
# (identical statistics up to summation order — test_streaming_diagnostics).
_CHUNKED_THRESHOLD_BYTES = 1 << 28


def compute_diagnostics(samples) -> dict:
    """Convergence diagnostics + summary statistics for (n, chains, dim) samples.

    Output-key parity with the reference's arviz-based version
    (run_benchmarks.py:161-195); ``summary`` is a plain dict of arrays instead
    of an arviz DataFrame. Histories over ~256 MB are transparently computed
    with the chain-chunked streaming estimators (identical results up to
    float summation order), so gates work unchanged at 65k-chain scale.
    """
    samples = jnp.asarray(samples)
    if samples.size * samples.dtype.itemsize > _CHUNKED_THRESHOLD_BYTES:
        return compute_diagnostics_chunked(samples)
    from mcmc_tpu.diagnostics.streaming import _mesh_axis_of_chains
    mesh, _ = _mesh_axis_of_chains(samples)
    if mesh is not None and mesh.devices.size > 1:
        # Chain-sharded history on a live mesh: the per-dim-sharded
        # estimators (streaming.py) reshard once per dim block and run every
        # statistic device-locally — exactly equal to the monolithic path,
        # without GSPMD sorting/FFT along a sharded axis (VERDICT r2 #4).
        return compute_diagnostics_chunked(samples)
    rhat, bulk, tail, mcse, mean, std = _diagnostics_device(samples)
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
    "ess_bulk_chunked", "split_rhat_chunked", "ess_tail_chunked",
    "ess_mean_chunked", "mcse_mean_chunked", "compute_diagnostics_chunked",
    "sliced_wasserstein_distance", "compute_sliced_w2",
    "ConvergenceW2Tracker",
    "psis_loo", "waic", "compare", "pointwise_log_likelihood",
    "LooResult", "WaicResult",
    "detect_divergences", "check_summary_statistics", "evaluate_gates",
    "evaluate_smc_gates",
    "compute_diagnostics",
    "MIN_ESS_HARD_GATE", "MIN_ESS_TAIL_HARD_GATE", "MIN_ESS_QUALITY",
    "MIN_ESS_TAIL_QUALITY", "INEFFICIENT_THRESHOLD", "HIGH_EFFICIENCY_THRESHOLD",
    "DIVERGENCE_DELTA_H",
]
