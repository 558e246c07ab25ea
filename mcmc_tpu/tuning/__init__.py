"""Adaptive warmup: dual averaging, Welford mass-matrix learning, windowed
adaptation, sequential ESJD friction tuning."""

from mcmc_tpu.tuning.welford import (
    WelfordState, welford_init, welford_update, welford_update_batch,
    welford_covariance, chain_averaged_variance, shrink_variance,
)
from mcmc_tpu.tuning.dual_averaging import (
    DualAveragingState, da_init, da_update, da_reset, da_step_size,
    da_final_step_size,
    JointDualAveragingState, joint_da_init, joint_da_update, joint_tune_grahmc,
    dual_averaging_tune_rwmh, dual_averaging_tune_hmc, dual_averaging_tune_nuts,
    TARGET_ACCEPT_RWMH, TARGET_ACCEPT_HMC, TARGET_ACCEPT_NUTS,
    TARGET_ACCEPT_GRAHMC,
)
from mcmc_tpu.tuning.adaptation import build_schedule, run_adaptive_warmup
from mcmc_tpu.tuning.sequential import sequential_tune_grahmc

__all__ = [
    "WelfordState", "welford_init", "welford_update", "welford_update_batch",
    "welford_covariance", "chain_averaged_variance", "shrink_variance",
    "DualAveragingState", "da_init", "da_update", "da_reset", "da_step_size",
    "da_final_step_size",
    "JointDualAveragingState", "joint_da_init", "joint_da_update",
    "joint_tune_grahmc",
    "dual_averaging_tune_rwmh", "dual_averaging_tune_hmc",
    "dual_averaging_tune_nuts",
    "TARGET_ACCEPT_RWMH", "TARGET_ACCEPT_HMC", "TARGET_ACCEPT_NUTS",
    "TARGET_ACCEPT_GRAHMC",
    "build_schedule", "run_adaptive_warmup", "sequential_tune_grahmc",
]
