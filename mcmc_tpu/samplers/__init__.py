"""Samplers: RWMH, HMC, NUTS, GRAHMC — batched, scan-based, shard-ready.

All run functions return a uniform RunResult(samples, log_probs, accept_rate,
final_state, info); reference-shaped tuple wrappers live in mcmc_tpu.compat.
"""

from mcmc_tpu.samplers.base import ChainState, RunResult, ensure_batched
from mcmc_tpu.samplers.rwmh import rwmh_init, rwmh_step, rwmh_run
from mcmc_tpu.samplers.hmc import hmc_init, hmc_step, hmc_run, leapfrog
from mcmc_tpu.samplers.nuts import nuts_init, nuts_step, nuts_run
from mcmc_tpu.samplers.nuts_persistent import nuts_run_persistent
from mcmc_tpu.samplers.tempered import tempered_run, geometric_ladder
from mcmc_tpu.samplers.smc import (smc_run, SMCResult, gaussian_base,
                                   systematic_resample, weighted_moments)
from mcmc_tpu.samplers.grahmc import (
    grahmc_init, grahmc_step, grahmc_run,
    rahmc_init, rahmc_step, rahmc_run,
    FRICTION_SCHEDULES, get_friction_schedule, default_steepness, NO_FRICTION,
    constant_schedule, tanh_schedule, sigmoid_schedule, linear_schedule,
    sine_schedule,
)

__all__ = [
    "ChainState", "RunResult", "ensure_batched",
    "rwmh_init", "rwmh_step", "rwmh_run",
    "hmc_init", "hmc_step", "hmc_run", "leapfrog",
    "nuts_init", "nuts_step", "nuts_run", "nuts_run_persistent",
    "tempered_run", "geometric_ladder",
    "smc_run", "SMCResult", "gaussian_base", "systematic_resample",
    "weighted_moments",
    "grahmc_init", "grahmc_step", "grahmc_run",
    "rahmc_init", "rahmc_step", "rahmc_run",
    "FRICTION_SCHEDULES", "get_friction_schedule", "default_steepness",
    "NO_FRICTION", "constant_schedule", "tanh_schedule", "sigmoid_schedule",
    "linear_schedule", "sine_schedule",
]
