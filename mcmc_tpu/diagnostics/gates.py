"""Two-tier statistical quality gates and the Bonferroni z-score mean test.

Threshold parity with the reference (run_benchmarks.py:41-62,777-804 and
README:179-195):

- usable (hard gate):  R-hat < 1.05, bulk ESS >= 400, tail ESS >= 100,
  divergence rate < 5%
- quality_pass:        R-hat < 1.01, bulk ESS >= 400, tail ESS >= 200,
  divergence rate < 1%, Bonferroni z-test pass (when ground truth exists)
- efficiency flags:    inefficient ESS/N < 1%, high-efficiency ESS/N > 10%

Unlike the reference — which hard-codes divergence_rate = 0.0
(run_benchmarks.py:706-710) so the divergence criteria can never fire — the
samplers here report real |dH| > threshold counts, wired into these gates
(documented fix, SURVEY.md §6 quirks).
"""

from typing import Dict, Optional

import numpy as np
import scipy.stats

import jax.numpy as jnp

# Gate constants (reference run_benchmarks.py:55-62)
MIN_ESS_HARD_GATE = 400
MIN_ESS_TAIL_HARD_GATE = 100
MIN_ESS_QUALITY = 400
MIN_ESS_TAIL_QUALITY = 200
INEFFICIENT_THRESHOLD = 0.01
HIGH_EFFICIENCY_THRESHOLD = 0.1

RHAT_USABLE = 1.05
RHAT_QUALITY = 1.01
DIVERGENCE_USABLE = 0.05
DIVERGENCE_QUALITY = 0.01

# Divergence threshold on |delta_H| in nats (reference run_benchmarks.py:90-103,
# NUTS delta_max default — reference NUTS.py:455)
DIVERGENCE_DELTA_H = 1000.0


def detect_divergences(delta_H, threshold: float = DIVERGENCE_DELTA_H):
    """Boolean mask of divergent transitions: |delta_H| > threshold."""
    return jnp.abs(delta_H) > threshold


def check_summary_statistics(diagnostics: Dict, target, significance: float = 0.05) -> Dict:
    """Bonferroni-corrected z-score test of the posterior mean vs ground truth.

    z_i = (mean_i - true_mean_i) / mcse_i, reject if max |z| exceeds the
    two-sided threshold at level significance/dim. Parity: reference
    run_benchmarks.py:108-158 (including the relative epsilon on MCSE).
    """
    if target.true_mean is None or target.true_cov is None:
        return {"pass": True, "max_z": 0.0, "threshold": None, "reason": "No ground truth"}

    summary = diagnostics["summary"]
    means = np.asarray(summary["mean"])
    mcse = np.asarray(summary["mcse_mean"])
    true_mean = np.asarray(target.true_mean)

    n_dim = means.shape[0]
    individual_alpha = significance / n_dim
    z_threshold = float(scipy.stats.norm.ppf(1 - individual_alpha / 2))

    epsilon = 1e-8 * np.maximum(np.abs(true_mean), 1.0) + 1e-16
    z_scores = (means - true_mean) / (mcse + epsilon)
    max_z = float(np.max(np.abs(z_scores)))
    passed = max_z < z_threshold

    return {
        "pass": passed,
        "max_z": max_z,
        "threshold": z_threshold,
        "z_scores": z_scores,
        "reason": None if passed else f"max |z|={max_z:.2f} > {z_threshold:.2f}",
    }


def evaluate_gates(
    rhat_max: float,
    ess_bulk_min: float,
    ess_tail_min: float,
    divergence_rate: float,
    num_samples: int,
    stats_pass: bool = True,
    has_true_mean: bool = False,
) -> Dict:
    """Evaluate the two-tier usable / quality_pass gates + efficiency flags."""
    ess_per_sample = ess_bulk_min / num_samples if num_samples > 0 else 0.0

    usable = (
        rhat_max < RHAT_USABLE
        and ess_bulk_min >= MIN_ESS_HARD_GATE
        and ess_tail_min >= MIN_ESS_TAIL_HARD_GATE
        and divergence_rate < DIVERGENCE_USABLE
    )

    if usable:
        quality_pass = (
            rhat_max < RHAT_QUALITY
            and ess_bulk_min >= MIN_ESS_QUALITY
            and ess_tail_min >= MIN_ESS_TAIL_QUALITY
            and divergence_rate < DIVERGENCE_QUALITY
            and (not has_true_mean or stats_pass)
        )
        is_inefficient = ess_per_sample < INEFFICIENT_THRESHOLD
        is_high_efficiency = ess_per_sample > HIGH_EFFICIENCY_THRESHOLD
    else:
        quality_pass = False
        is_inefficient = False
        is_high_efficiency = False

    return {
        "usable": usable,
        "quality_pass": quality_pass,
        "ess_per_sample": ess_per_sample,
        "is_inefficient": is_inefficient,
        "is_high_efficiency": is_high_efficiency,
    }


def evaluate_smc_gates(
    ess: float,
    divergence_rate: float,
    log_z: float,
    n_particles: int,
    stats_pass: bool = True,
    has_true_mean: bool = False,
) -> Dict:
    """Two-tier gates for annealed-SMC rows (samplers/smc.py).

    SMC produces ONE exchangeable weighted population, not chains over
    time, so the MCMC criteria translate as follows:

    - **R-hat has no analogue and is omitted.** Splitting an exchangeable
      population into pseudo-chains always reads ~1 (between-block and
      within-block variance estimate the same population variance even
      when the population is wrong), so including it would be a gate that
      can never fire.
    - **ESS is the importance-sampling ESS** of the final weights,
      1/sum(w_i^2) — the single number that captures weight degeneracy,
      the only failure channel the bulk/tail split of MCMC ESS exists to
      separate (an exchangeable population has no autocorrelation
      structure, so there is no separate tail estimate to check). Same
      thresholds as the MCMC gates.
    - **Divergences** come from the move kernels' |dH| checks, same
      thresholds.
    - **log_Z must be finite** — a NaN/inf evidence estimate means the
      bridge degenerated (all weights -inf at some stage) and nothing
      downstream of that stage is trustworthy.

    Efficiency flags reuse the reference thresholds with ESS-per-particle
    in place of ESS-per-draw.
    """
    log_z_ok = bool(np.isfinite(log_z))
    ess_per_sample = ess / n_particles if n_particles > 0 else 0.0

    usable = (
        log_z_ok
        and ess >= MIN_ESS_HARD_GATE
        and divergence_rate < DIVERGENCE_USABLE
    )
    if usable:
        quality_pass = (
            ess >= MIN_ESS_QUALITY
            and divergence_rate < DIVERGENCE_QUALITY
            and (not has_true_mean or stats_pass)
        )
        is_inefficient = ess_per_sample < INEFFICIENT_THRESHOLD
        is_high_efficiency = ess_per_sample > HIGH_EFFICIENCY_THRESHOLD
    else:
        quality_pass = False
        is_inefficient = False
        is_high_efficiency = False

    return {
        "usable": usable,
        "quality_pass": quality_pass,
        "ess_per_sample": ess_per_sample,
        "is_inefficient": is_inefficient,
        "is_high_efficiency": is_high_efficiency,
    }
