"""Nesterov dual averaging for step-size adaptation (Hoffman & Gelman 2014).

Stan constants gamma=0.05, t0=10, kappa=0.75 (parity: reference
tuning/dual_averaging.py:47-49,806-887). The functional core here is
jnp-scalar-based so DA states live inside lax.scan carries — warmup windows run
fully on device with no host round-trips (the reference updates DA on host
between 100-step sampler calls).

Per-sampler convergence-driven tuners (dual_averaging_tune_{rwmh,hmc,nuts})
keep the reference's protocol — 100-sample batches, relative-change tolerance
with patience after min_iter — but execute in device-side chunks with host
convergence checks between chunks. joint_tune_grahmc (vector DA over
[log eps, log gamma]) is kept for parity but deprecated in favor of
sequential ESJD tuning (see tuning/sequential.py), matching the reference's
own guidance (dual_averaging.py:683-708).
"""

from typing import NamedTuple, Tuple, Dict, Optional, Callable

import jax
import jax.numpy as jnp
from jax import lax, random

DA_GAMMA = 0.05   # shrinkage toward mu (Stan)
DA_T0 = 10.0      # iteration offset (Stan)
DA_KAPPA = 0.75   # smoothing decay (Stan)

TARGET_ACCEPT_RWMH = 0.234   # Roberts & Rosenthal optimal
TARGET_ACCEPT_HMC = 0.65
TARGET_ACCEPT_NUTS = 0.65
TARGET_ACCEPT_GRAHMC = 0.65  # code parity (README says 0.55; code uses 0.65 —
                             # reference run_benchmarks.py:549, SURVEY.md §6)


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray      # current (noisy) log step size
    log_step_bar: jnp.ndarray  # smoothed log step size
    h_bar: jnp.ndarray         # running error average
    mu: jnp.ndarray            # shrinkage reference point
    count: jnp.ndarray         # iteration counter m


def da_init(initial_step_size) -> DualAveragingState:
    log_step = jnp.log(jnp.asarray(initial_step_size, jnp.float64 if
                                   jax.config.jax_enable_x64 else jnp.float32))
    return DualAveragingState(
        log_step=log_step,
        log_step_bar=log_step,
        h_bar=jnp.zeros_like(log_step),
        mu=log_step,
        count=jnp.zeros_like(log_step),
    )


def da_update(state: DualAveragingState, accept_stat, target_accept) -> DualAveragingState:
    """One DA update from a batch-mean acceptance statistic. Pure jnp."""
    m = state.count + 1.0
    eta = 1.0 / (m + DA_T0)
    h_bar = (1.0 - eta) * state.h_bar + eta * (target_accept - accept_stat)
    log_step = state.mu - (jnp.sqrt(m) / DA_GAMMA) * h_bar
    m_kappa = m ** (-DA_KAPPA)
    smoothed = m_kappa * log_step + (1.0 - m_kappa) * state.log_step_bar
    # First iteration initializes the smoothed value outright.
    log_step_bar = jnp.where(m == 1.0, log_step, smoothed)
    return DualAveragingState(log_step, log_step_bar, h_bar, state.mu, m)


def da_reset(state: DualAveragingState) -> DualAveragingState:
    """Restart adaptation around the current best estimate (new mu).

    Used when the mass matrix changes: keeps the smoothed step as the new
    reference so tuning restarts from the best known geometry-adjusted value.
    """
    current = jnp.where(state.count > 0, state.log_step_bar, state.log_step)
    return DualAveragingState(
        log_step=current,
        log_step_bar=current,
        h_bar=jnp.zeros_like(current),
        mu=current,
        count=jnp.zeros_like(state.count),
    )


def da_step_size(state: DualAveragingState):
    """Current exploration step size exp(log_step)."""
    return jnp.exp(state.log_step)


def da_final_step_size(state: DualAveragingState):
    """Final smoothed step size exp(log_step_bar)."""
    return jnp.exp(state.log_step_bar)


# ============================================================================
# Convergence-driven per-sampler tuners (host-chunked device scans)
# ============================================================================

def _tune_with_da(
    run_batch: Callable,        # (key, position, step_size) -> (accept_stat, position)
    init_step_size: float,
    target_accept: float,
    init_position,
    key,
    tolerance: float = 0.01,
    max_iter: int = 2000,
    min_iter: int = 100,
    patience: int = 10,
    chunk: int = 25,
) -> Tuple[float, Dict]:
    """Generic DA tuning loop: device-side chunks of `chunk` DA iterations,
    host-side convergence check between chunks (relative change of the
    smoothed step below tolerance for `patience` consecutive iterations after
    `min_iter`)."""

    @jax.jit
    def run_chunk(key, position, da_state):
        def body(carry, _):
            k, pos, da = carry
            k, sub = random.split(k)
            accept_stat, pos = run_batch(sub, pos, da_step_size(da))
            da = da_update(da, accept_stat, target_accept)
            return (k, pos, da), (da_final_step_size(da), accept_stat)
        (key, position, da_state), (steps, accepts) = lax.scan(
            body, (key, position, da_state), length=chunk)
        return key, position, da_state, steps, accepts

    da_state = da_init(init_step_size)
    position = init_position
    step_hist, accept_hist = [], []
    converged_count = 0
    converged_iter = max_iter
    prev = float(da_final_step_size(da_state))

    m = 0
    while m < max_iter:
        key, position, da_state, steps, accepts = run_chunk(key, position, da_state)
        steps = [float(s) for s in steps]
        accept_hist.extend(float(a) for a in accepts)
        step_hist.extend(steps)
        for s in steps:
            m += 1
            if m >= min_iter:
                rel = abs(s - prev) / (abs(prev) + 1e-10)
                converged_count = converged_count + 1 if rel < tolerance else 0
                if converged_count >= patience:
                    converged_iter = m
                    break
            prev = s
        if converged_iter < max_iter:
            break

    final = step_hist[converged_iter - 1] if converged_iter <= len(step_hist) else step_hist[-1]
    history = {
        "scale_history": step_hist,
        "step_size_history": step_hist,
        "accept_history": accept_hist,
        "converged_iter": converged_iter,
        "target_accept": target_accept,
    }
    return float(final), history


def dual_averaging_tune_rwmh(
    key, log_prob_fn, init_position,
    target_accept: float = TARGET_ACCEPT_RWMH,
    tolerance: float = 0.01, max_iter: int = 2000, min_iter: int = 100,
    patience: int = 10, n_samples_per_tune: int = 100,
) -> Tuple[float, Dict]:
    """Tune the RWMH proposal scale. Init 2.38/sqrt(d) (Roberts & Rosenthal)."""
    from mcmc_tpu.samplers.rwmh import rwmh_step, rwmh_init

    d = init_position.shape[-1]
    state0 = rwmh_init(init_position, log_prob_fn)

    def run_batch(key, position, scale):
        st = state0._replace(position=position,
                             log_prob=log_prob_fn(position).astype(state0.log_prob.dtype))
        def body(carry, _):
            k, s = carry
            k, s, accept = rwmh_step(k, s, log_prob_fn, scale)
            return (k, s), accept
        (key, st), accepts = lax.scan(body, (key, st), length=n_samples_per_tune)
        return jnp.mean(accepts), st.position

    return _tune_with_da(run_batch, 2.38 / jnp.sqrt(d), target_accept,
                         state0.position, key, tolerance, max_iter, min_iter, patience)


def dual_averaging_tune_hmc(
    key, log_prob_fn, init_position, num_steps: int = 20,
    target_accept: float = TARGET_ACCEPT_HMC,
    inv_mass_matrix=None, value_and_grad_fn=None,
    tolerance: float = 0.01, max_iter: int = 2000, min_iter: int = 100,
    patience: int = 10, n_samples_per_tune: int = 100,
) -> Tuple[float, Dict]:
    """Tune the HMC step size at fixed trajectory length. Init 0.5/sqrt(d)."""
    from mcmc_tpu.samplers.hmc import hmc_init, hmc_step
    from mcmc_tpu.samplers.base import make_value_and_grad

    d = init_position.shape[-1]
    vag = make_value_and_grad(log_prob_fn, value_and_grad_fn)
    state0 = hmc_init(init_position, log_prob_fn, value_and_grad_fn)
    if inv_mass_matrix is None:
        inv_mass_matrix = jnp.ones(d, state0.position.dtype)

    def run_batch(key, position, step_size):
        lp, grad = vag(position)
        st = state0._replace(position=position,
                             log_prob=lp.astype(state0.log_prob.dtype),
                             grad_log_prob=grad.astype(position.dtype))
        def body(carry, _):
            k, s = carry
            k, s, (accept, *_rest) = hmc_step(k, s, vag, step_size, num_steps,
                                              inv_mass_matrix)
            return (k, s), accept
        (key, st), accepts = lax.scan(body, (key, st), length=n_samples_per_tune)
        return jnp.mean(accepts), st.position

    return _tune_with_da(run_batch, 0.5 / jnp.sqrt(d), target_accept,
                         state0.position, key, tolerance, max_iter, min_iter, patience)


def dual_averaging_tune_nuts(
    key, log_prob_fn, init_position, max_tree_depth: int = 10,
    target_accept: float = TARGET_ACCEPT_NUTS,
    inv_mass_matrix=None, value_and_grad_fn=None,
    tolerance: float = 0.01, max_iter: int = 2000, min_iter: int = 100,
    patience: int = 10, n_samples_per_tune: int = 100,
) -> Tuple[float, Dict]:
    """Tune the NUTS step size; accept statistic = mean trajectory alpha."""
    from mcmc_tpu.samplers.nuts import nuts_init, nuts_step
    from mcmc_tpu.samplers.base import make_value_and_grad

    d = init_position.shape[-1]
    vag = make_value_and_grad(log_prob_fn, value_and_grad_fn)
    vag_single = (value_and_grad_fn if value_and_grad_fn is not None
                  else jax.value_and_grad(log_prob_fn))
    state0 = nuts_init(init_position, log_prob_fn, value_and_grad_fn)
    if inv_mass_matrix is None:
        inv_mass_matrix = jnp.ones(d, state0.position.dtype)

    def run_batch(key, position, step_size):
        lp, grad = vag(position)
        st = state0._replace(position=position,
                             log_prob=lp.astype(state0.log_prob.dtype),
                             grad_log_prob=grad.astype(position.dtype))
        def body(carry, _):
            k, s = carry
            k, s, (depths, mean_alpha) = nuts_step(
                k, s, vag_single, step_size, inv_mass_matrix, max_tree_depth)
            return (k, s), jnp.mean(mean_alpha)
        (key, st), alphas = lax.scan(body, (key, st), length=n_samples_per_tune)
        return jnp.mean(alphas), st.position

    return _tune_with_da(run_batch, 0.5 / jnp.sqrt(d), target_accept,
                         state0.position, key, tolerance, max_iter, min_iter, patience)


# ============================================================================
# Joint [step, gamma] dual averaging for GRAHMC (kept for parity; deprecated)
# ============================================================================

class JointDualAveragingState(NamedTuple):
    """Vector DA over [log step, log gamma] driven by one scalar accept error."""
    log_params: jnp.ndarray
    log_params_bar: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


GAMMA_CLIP = (0.01, 20.0)   # reference dual_averaging.py:648-652


def joint_da_init(initial_params) -> JointDualAveragingState:
    lp = jnp.log(jnp.asarray(initial_params))
    return JointDualAveragingState(lp, lp, jnp.zeros(()), lp, jnp.zeros(()))


def joint_da_update(state: JointDualAveragingState, accept_stat,
                    target_accept) -> JointDualAveragingState:
    m = state.count + 1.0
    eta = 1.0 / (m + DA_T0)
    h_bar = (1.0 - eta) * state.h_bar + eta * (target_accept - accept_stat)
    log_params = state.mu - (jnp.sqrt(m) / DA_GAMMA) * h_bar
    log_params = log_params.at[1].set(
        jnp.clip(log_params[1], jnp.log(GAMMA_CLIP[0]), jnp.log(GAMMA_CLIP[1])))
    m_kappa = m ** (-DA_KAPPA)
    bar = m_kappa * log_params + (1.0 - m_kappa) * state.log_params_bar
    bar = jnp.where(m == 1.0, log_params, bar)
    return JointDualAveragingState(log_params, bar, h_bar, state.mu, m)


def joint_tune_grahmc(
    key, log_prob_fn, grad_log_prob_fn, init_position, num_steps: int,
    schedule_type: str = "constant", target_accept: float = TARGET_ACCEPT_GRAHMC,
    max_iter: int = 1000, inv_mass_matrix=None, current_step_size=None,
    fixed_steepness: float = 10.0, value_and_grad_fn=None,
    n_samples_per_tune: int = 50,
) -> Tuple[float, float, float, Dict]:
    """DEPRECATED joint acceptance-driven tuning of (step_size, gamma).

    Step size and friction have opposite monotone relationships with the
    acceptance rate, so a single scalar error signal cannot tune both —
    kept only for experimental comparison (the reference reached the same
    conclusion: dual_averaging.py:683-708). Production path:
    tuning.sequential.sequential_tune_grahmc.
    """
    from mcmc_tpu.samplers.grahmc import (grahmc_init, grahmc_step,
                                          get_friction_schedule)
    from mcmc_tpu.samplers.base import make_value_and_grad

    schedule = get_friction_schedule(schedule_type)
    vag = make_value_and_grad(log_prob_fn, value_and_grad_fn)
    d = init_position.shape[-1]
    state = grahmc_init(init_position, log_prob_fn, value_and_grad_fn)
    if inv_mass_matrix is None:
        inv_mass_matrix = jnp.ones(d, state.position.dtype)

    init_step = current_step_size if current_step_size is not None else 0.5 / float(jnp.sqrt(d))
    da = joint_da_init(jnp.array([init_step, 1.0]))

    @jax.jit
    def iteration(key, chain_state, da_state):
        params = jnp.exp(da_state.log_params)
        step_size = params[0]
        gamma = jnp.clip(params[1], 0.001, 50.0)
        def body(carry, _):
            k, s = carry
            k, s, (accept, *_r) = grahmc_step(
                k, s, vag, step_size, num_steps, gamma, fixed_steepness,
                inv_mass_matrix, schedule)
            return (k, s), accept
        (key, chain_state), accepts = lax.scan(
            body, (key, chain_state), length=n_samples_per_tune)
        da_state = joint_da_update(da_state, jnp.mean(accepts), target_accept)
        return key, chain_state, da_state, jnp.mean(accepts)

    history = {"step_size": [], "gamma": [], "accept_rate": []}
    for _ in range(max_iter):
        key, state, da, acc = iteration(key, state, da)
        bar = jnp.exp(da.log_params_bar)
        history["step_size"].append(float(bar[0]))
        history["gamma"].append(float(bar[1]))
        history["accept_rate"].append(float(acc))

    final = jnp.exp(da.log_params_bar)
    return float(final[0]), float(final[1]), fixed_steepness, history
