"""Hamiltonian Monte Carlo (behavioral parity: reference samplers/HMC.py).

HMC is the friction-free special case of the shared conformal-leapfrog
trajectory (samplers/trajectory.py): kick-drift-kick with diagonal mass,
momentum flip, non-finite-H reject guard, burn-in counter reset, optional
proposal tracking. Divergences (|dH| > 1000) are counted for real (the
reference hard-codes 0.0 — run_benchmarks.py:706-710).
"""

from functools import partial
from typing import Callable, Optional

import jax.numpy as jnp
from jax import jit

from mcmc_tpu.samplers.base import ChainState, RunResult, init_chain_state
from mcmc_tpu.samplers.grahmc import grahmc_run, grahmc_step, NO_FRICTION
from mcmc_tpu.samplers.trajectory import integrate_trajectory

Array = jnp.ndarray


def hmc_init(init_position, log_prob_fn, value_and_grad_fn=None) -> ChainState:
    return init_chain_state(init_position, log_prob_fn, value_and_grad_fn,
                            needs_grad=True)


def leapfrog(q, p, lp, grad, value_and_grad, step_size, num_steps: int,
             inv_mass_matrix):
    """Standard leapfrog integration (no friction). Returns (q, p, lp, grad)."""
    return integrate_trajectory(q, p, lp, grad, value_and_grad, step_size,
                                num_steps, inv_mass_matrix,
                                friction_schedule=None)


def hmc_step(key, state: ChainState, value_and_grad, step_size, num_steps: int,
             inv_mass_matrix):
    """One HMC step: delegates to the shared step with no friction schedule."""
    return grahmc_step(key, state, value_and_grad, step_size, num_steps,
                       gamma=0.0, steepness=1.0,
                       inv_mass_matrix=inv_mass_matrix, friction_schedule=None)


@partial(jit, static_argnames=("log_prob_fn", "num_steps", "num_samples",
                               "burn_in", "track_proposals", "value_and_grad_fn",
                               "collect_chains", "backend"))
def hmc_run(
    key,
    log_prob_fn,
    init_position,
    step_size,
    num_steps: int,
    num_samples: int,
    burn_in: int = 0,
    inv_mass_matrix: Optional[Array] = None,
    track_proposals: bool = False,
    value_and_grad_fn: Optional[Callable] = None,
    collect_chains: Optional[int] = None,
    backend: str = "xla",
) -> RunResult:
    """Run HMC chains. Returns RunResult (see samplers.base)."""
    return grahmc_run(
        key, log_prob_fn, init_position, step_size, num_steps,
        gamma=0.0, steepness=1.0, num_samples=num_samples, burn_in=burn_in,
        inv_mass_matrix=inv_mass_matrix,
        friction_schedule=NO_FRICTION,
        track_proposals=track_proposals,
        value_and_grad_fn=value_and_grad_fn,
        collect_chains=collect_chains,
        backend=backend,
    )
