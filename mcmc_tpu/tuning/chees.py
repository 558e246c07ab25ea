"""ChEES: cross-chain trajectory-length adaptation for HMC / GRAHMC.

Implements the ChEES criterion (Change in the Estimator of the Expected
Square) of Hoffman, Radul & Sountsov, "An Adaptive-MCMC Scheme for Setting
Trajectory Lengths in Hamiltonian Monte Carlo" (AISTATS 2021): maximize

    ChEES(T) = (1/4) E[ (||q' - mu'||^2 - ||q - mu||^2)^2 ]

over the trajectory length T, where q'/q are proposed/current states and
mu'/mu their cross-chain means. Each iteration samples a jittered length
t = h * T (h quasirandom in (0,1), SHARED by all chains), runs all chains
for the same leapfrog count, and ascends d ChEES / d log T with Adam using
the per-chain gradient estimate

    g_i = h * T * alpha_i * c_i * <q'_i - mu', v'_i>,
    c_i = ||q'_i - mu'||^2 - ||q_i - mu||^2,   v' = dq'/dt = M^{-1} p'

(alpha_i the MH acceptance probability; norms computed in the mass-matrix-
sphered space so the criterion is scale-free under preconditioning).

Why this replaces the reference's L grid search: the reference selects the
trajectory length by running the FULL warmup+sampling pipeline once per
candidate L (reference run_benchmarks.py:1055-1056: 7 candidates) and
keeping the best bulk-ESS/gradient. ChEES folds the selection into ONE
warmup run. It is also the TPU-native formulation of the problem: the
criterion's cross-chain expectations need many chains to be low-variance
per iteration — exactly the thousands-of-SPMD-chains regime this framework
targets — and the shared jitter keeps every iteration a dense
(n_chains, dim) block with a single dynamic trip-count while_loop (no
per-chain control flow, nothing for XLA to unroll badly). Under a chain
mesh the two cross-chain means are each one `pmean` on ICI per iteration.

Step size is tuned concurrently by the same dual-averaging core as the
windowed warmup (tuning/dual_averaging.py), and the diagonal mass matrix by
the same Welford windows — `run_chees_warmup` is a drop-in alternative to
`run_adaptive_warmup` returning the same (step_size, inv_mass, position,
info) tuple, with the tuned trajectory in info["trajectory_length"] /
info["num_steps"].
"""

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

from mcmc_tpu import precision
from mcmc_tpu.diagnostics.gates import DIVERGENCE_DELTA_H
from mcmc_tpu.samplers.base import make_value_and_grad, init_chain_state
from mcmc_tpu.samplers.trajectory import (
    integrate_trajectory_dynamic, kinetic_energy)
from mcmc_tpu.tuning.adaptation import build_schedule
from mcmc_tpu.tuning.dual_averaging import (
    da_init, da_update, da_reset, da_step_size, da_final_step_size)
from mcmc_tpu.tuning.welford import (
    welford_init, welford_update, chain_averaged_variance, shrink_variance)

Array = jnp.ndarray

CHEES_ADAM_LR = 0.025          # paper's Adam learning rate on log T
CHEES_ADAM_EPS = 1e-8
DEFAULT_MAX_STEPS = 256        # hard cap on leapfrogs per jittered trajectory


def halton_sequence(n: int, offset: int = 0) -> np.ndarray:
    """First `n` points of the base-2 radical-inverse (van der Corput)
    sequence, skipping `offset` — the quasirandom jitter stream. Host-side;
    the values are scan inputs, not traced computation."""
    idx = np.arange(offset + 1, offset + n + 1, dtype=np.uint64)
    out = np.zeros(n, dtype=np.float64)
    denom = 1.0
    while idx.any():
        denom *= 2.0
        out += (idx & 1) / denom
        idx >>= 1
    return out


class ChEESState(NamedTuple):
    """Adam-on-log-T state. All leaves are scalars (replicated under a
    mesh, like the DA state)."""
    log_t: Array
    m: Array       # first-moment EMA
    v: Array       # second-moment EMA
    count: Array   # update count (bias correction)


def chees_init(initial_trajectory_length, dtype=jnp.float64) -> ChEESState:
    z = jnp.zeros((), dtype)
    return ChEESState(
        log_t=jnp.asarray(jnp.log(initial_trajectory_length), dtype),
        m=z, v=z, count=z)


def chees_update(state: ChEESState, grad, lr=CHEES_ADAM_LR,
                 beta1=0.9, beta2=0.999) -> ChEESState:
    """One Adam ASCENT step on log T. The raw criterion gradient's scale is
    problem-dependent; Adam's second-moment normalization makes the update
    scale-free, so no explicit gradient normalization is needed."""
    count = state.count + 1.0
    m = beta1 * state.m + (1.0 - beta1) * grad
    v = beta2 * state.v + (1.0 - beta2) * grad * grad
    mhat = m / (1.0 - beta1 ** count)
    vhat = v / (1.0 - beta2 ** count)
    log_t = state.log_t + lr * mhat / (jnp.sqrt(vhat) + CHEES_ADAM_EPS)
    return ChEESState(log_t=log_t, m=m, v=v, count=count)


CHEES_WINSOR_MULT = 10.0   # clip per-chain gradients at this x median |g|


def chees_log_t_grad(q0: Array, q1: Array, p1: Array, h, trajectory_length,
                     alpha: Array, inv_mass: Array,
                     axis_name: Optional[str] = None,
                     winsorize: float = CHEES_WINSOR_MULT) -> Array:
    """Acceptance-weighted cross-chain estimate of d ChEES / d log T.

    q0/q1: (C, D) current/proposed positions; p1 the UNFLIPPED endpoint
    momentum (dq/dt = M^{-1} p evaluated before the reversibility flip);
    h the iteration's jitter; alpha the per-chain MH acceptance
    probability. Norms are taken in the sphered space z = q / sqrt(M^{-1})
    (inv_mass tracks posterior variance, so z is approximately whitened and
    the criterion treats all dimensions on one scale).

    winsorize: clip each chain's gradient contribution at this multiple of
    the cross-chain median |g_i| (0 disables). Unclipped, the estimator is
    unbounded on targets with near-linear density tails (measured on
    log_gamma: a chain drifting down the flat left tail gains squared
    distance quadratically in T at ZERO energy cost — leapfrog integrates
    linear potentials exactly, so acceptance never penalizes the runaway
    and a few tail chains drag T to the cap). Clipping at ~10x the median
    leaves light-tailed behavior untouched (the Gaussian quarter-period
    optimum is preserved by the convergence tests) while bounding any
    single chain's pull to the typical scale."""
    scale = jnp.sqrt(inv_mass)            # z = q / scale
    z0 = q0 / scale
    z1 = q1 / scale
    vz1 = p1 * scale                      # dz/dt = M^{-1} p / sqrt(M^{-1})
    # A diverged trajectory overflows q1/p1 to inf/nan; its alpha is 0
    # (energy guard) but 0 * nan = nan, and one nan row would poison the
    # cross-chain mean mu1 for EVERY chain — mask diverged chains out of
    # both the means and the weighted gradient.
    finite = (jnp.all(jnp.isfinite(z1), axis=-1)
              & jnp.all(jnp.isfinite(vz1), axis=-1))
    fmask = finite.astype(z1.dtype)
    z1 = jnp.where(finite[:, None], z1, 0.0)
    vz1 = jnp.where(finite[:, None], vz1, 0.0)
    n_fin = jnp.sum(fmask)
    mu0 = jnp.mean(z0, axis=0)
    mu1_num = jnp.sum(z1, axis=0)
    if axis_name is not None:
        mu0 = lax.pmean(mu0, axis_name)
        mu1_num = lax.psum(mu1_num, axis_name)
        n_fin = lax.psum(n_fin, axis_name)
    mu1 = mu1_num / jnp.maximum(n_fin, 1.0)
    d1 = z1 - mu1
    c = jnp.sum(d1 * d1, axis=-1) - jnp.sum((z0 - mu0) ** 2, axis=-1)
    dc_dt = fmask * c * jnp.sum(d1 * vz1, axis=-1)
    alpha = alpha * fmask
    if winsorize:
        med = jnp.median(jnp.abs(dc_dt))
        if axis_name is not None:
            # median of per-device medians — exact enough for a clip bound
            med = lax.pmean(med, axis_name)
        bound = winsorize * med
        dc_dt = jnp.clip(dc_dt, -bound, bound)
    w_num = jnp.sum(alpha * dc_dt)
    w_den = jnp.sum(alpha)
    if axis_name is not None:
        w_num = lax.psum(w_num, axis_name)
        w_den = lax.psum(w_den, axis_name)
    g = w_num / jnp.maximum(w_den, 1e-12)
    # chain rule t = h * T: d/dlogT = t * d/dt
    return g * h * trajectory_length


def num_leapfrog_steps(t, step_size, max_steps: int) -> Array:
    """Quantize trajectory time t to a leapfrog count (>=1, capped)."""
    n = jnp.ceil(t / step_size).astype(jnp.int32)
    return jnp.clip(n, 1, max_steps)


def run_chees_warmup(
    sampler: str,
    target_log_prob,
    target_grad_log_prob,            # API parity with run_adaptive_warmup
    initial_position: Array,
    key: Array,
    num_warmup: int = 1000,
    target_accept: float = 0.651,
    schedule_type: Optional[str] = None,
    update_freq: int = 100,
    learn_mass_matrix: bool = True,
    value_and_grad_fn=None,
    verbose: bool = False,
    max_steps: int = DEFAULT_MAX_STEPS,
    adam_lr: float = CHEES_ADAM_LR,
    initial_trajectory_length: Optional[float] = None,
    gamma: float = 1.0,
    steepness: Optional[float] = None,
    mesh=None,
    **kwargs,
) -> Tuple[float, Optional[Array], Array, Dict]:
    """ChEES warmup: jointly adapt step size (dual averaging), diagonal mass
    matrix (Welford windows) and trajectory length (ChEES/Adam).

    Same window schedule, DA core, shrinkage and return contract as
    `run_adaptive_warmup`; the extra product is the tuned trajectory:
    info["trajectory_length"] (continuous T) and info["num_steps"] (the
    equivalent fixed leapfrog count round(T / step_size), what the sampling
    phase should use as L — with jittered sampling, as the MAX length).

    sampler: 'hmc', or 'grahmc'/'rahmc' (friction fixed at `gamma` during
    adaptation; tune gamma afterwards exactly as the windowed pipeline
    does). target_accept defaults to the jittered-HMC optimum 0.651.
    """
    if sampler not in ("hmc", "grahmc", "rahmc"):
        raise ValueError(f"ChEES adaptation supports hmc/grahmc, got {sampler}")
    n_chains, n_dim = initial_position.shape
    pos_dtype = initial_position.dtype

    friction_schedule = None
    if sampler in ("grahmc", "rahmc"):
        from mcmc_tpu.samplers.grahmc import (
            get_friction_schedule, default_steepness)
        friction_schedule = get_friction_schedule(schedule_type or "constant")
        if steepness is None:
            steepness = default_steepness(schedule_type or "constant")

    vag = make_value_and_grad(target_log_prob, value_and_grad_fn)
    axis_name = None
    if mesh is not None:
        from mcmc_tpu.parallel import CHAIN_AXIS
        axis_name = CHAIN_AXIS

    def _pmean(x):
        return x if axis_name is None else lax.pmean(x, axis_name)

    initial_step = 0.5 / float(np.sqrt(n_dim))
    if initial_trajectory_length is None:
        # one leapfrog step to start; Adam on log T grows it geometrically
        initial_trajectory_length = initial_step

    def step_body(carry, xs):
        key, cs, da, ch, wf, accumulate = carry
        h = xs
        eps = da_step_size(da).astype(pos_dtype)
        e_dtype = cs.log_prob.dtype
        T = jnp.clip(jnp.exp(ch.log_t).astype(pos_dtype),
                     eps, max_steps * eps)
        n = num_leapfrog_steps(h.astype(pos_dtype) * T, eps, max_steps)

        key, k_mom, k_acc = random.split(key, 3)
        inv_mass = wf.inv_mass
        p0 = (random.normal(k_mom, (cs.position.shape), dtype=pos_dtype)
              / jnp.sqrt(inv_mass))
        h0 = -cs.log_prob + kinetic_energy(p0, inv_mass).astype(e_dtype)
        q1, p1, lp1, grad1 = integrate_trajectory_dynamic(
            cs.position, p0, cs.log_prob, cs.grad_log_prob, vag, eps, n,
            inv_mass, friction_schedule=friction_schedule,
            gamma_max=gamma, steepness=steepness)
        h1 = -lp1 + kinetic_energy(p1, inv_mass).astype(e_dtype)
        h1 = precision.guard_energy(h1)
        log_alpha = jnp.minimum(jnp.asarray(0.0, e_dtype), h0 - h1)
        alpha = jnp.exp(log_alpha)
        divergent = jnp.abs(h1 - h0) > DIVERGENCE_DELTA_H

        g = chees_log_t_grad(cs.position, q1, p1, h.astype(pos_dtype), T,
                             alpha.astype(pos_dtype), inv_mass,
                             axis_name=axis_name)
        ch = chees_update(ch, g, lr=adam_lr)

        u = random.uniform(k_acc, (cs.position.shape[0],), dtype=e_dtype)
        accept = jnp.log(u) < log_alpha
        cs = cs._replace(
            position=jnp.where(accept[:, None], q1, cs.position),
            log_prob=jnp.where(accept, lp1, cs.log_prob),
            grad_log_prob=jnp.where(accept[:, None], grad1, cs.grad_log_prob),
            accept_count=cs.accept_count + accept.astype(jnp.int32),
            divergence_count=cs.divergence_count + divergent.astype(jnp.int32),
        )
        wf = wf._replace(state=lax.cond(
            accumulate,
            lambda s: welford_update(s, cs.position),
            lambda s: s, wf.state))
        accept_stat = _pmean(jnp.mean(alpha))
        return (key, cs, da, ch, wf, accumulate), (accept_stat, n, ch.log_t)

    class _WF(NamedTuple):
        # mass matrix + Welford bundled so the scan carry stays one pytree
        inv_mass: Array
        state: object

    def batch_body(carry, xs):
        key, cs, da, ch, wf, accumulate = carry
        (key, cs, da, ch, wf, accumulate), (accepts, ns, log_ts) = lax.scan(
            step_body, (key, cs, da, ch, wf, accumulate), xs)
        da = da_update(da, jnp.mean(accepts), target_accept)
        return (key, cs, da, ch, wf, accumulate), (
            jnp.mean(accepts), jnp.mean(log_ts), jnp.mean(ns.astype(pos_dtype)))

    @jax.jit
    def run_window(key, cs, da, ch, wf, accumulate, jitter):
        (key, cs, da, ch, wf, _), trace = lax.scan(
            batch_body, (key, cs, da, ch, wf, accumulate), jitter)
        return key, cs, da, ch, wf, trace

    # --- initial state ----------------------------------------------------
    da = da_init(initial_step)
    ch = chees_init(initial_trajectory_length,
                    dtype=jnp.asarray(initial_step).dtype)
    cs = init_chain_state(initial_position, target_log_prob,
                          value_and_grad_fn, needs_grad=True)
    wf = _WF(inv_mass=jnp.ones(n_dim, dtype=pos_dtype),
             state=welford_init((n_chains, n_dim)))

    schedule = build_schedule(
        num_warmup,
        exploration_steps=kwargs.get("exploration_steps", 500),
        adaptation_windows=kwargs.get("adaptation_windows"),
        cooldown_steps=kwargs.get("cooldown_steps", 125))
    if verbose:
        print(f"ChEES adaptation schedule "
              f"({sum(e - s for s, e, _ in schedule)} steps), "
              f"max_steps={max_steps}, adam_lr={adam_lr}")

    halton_offset = 0
    accept_trace, log_t_trace, mean_n_trace = [], [], []
    final_phase_log_ts = []
    for start_idx, end_idx, phase in schedule:
        window_len = end_idx - start_idx
        accumulate = phase == "adaptation" and learn_mass_matrix
        if accumulate:
            wf = wf._replace(state=welford_init((n_chains, n_dim)))
        num_batches = max(1, window_len // update_freq)
        samples_per_batch = window_len // num_batches
        jitter = jnp.asarray(
            halton_sequence(num_batches * samples_per_batch, halton_offset)
            .reshape(num_batches, samples_per_batch), pos_dtype)
        halton_offset += num_batches * samples_per_batch

        key, cs, da, ch, wf, (accepts, log_ts, mean_ns) = run_window(
            key, cs, da, ch, wf, jnp.asarray(accumulate), jitter)
        accept_trace.extend(float(a) for a in accepts)
        log_t_trace.extend(float(t) for t in log_ts)
        mean_n_trace.extend(float(x) for x in mean_ns)
        if phase == "cooldown":
            final_phase_log_ts.extend(float(t) for t in log_ts)

        if accumulate:
            variance = chain_averaged_variance(wf.state)
            inv_mass = shrink_variance(variance, wf.state.count).astype(pos_dtype)
            wf = wf._replace(inv_mass=inv_mass)
            da = da_reset(da)
            if verbose:
                print(f"  window [{start_idx}-{end_idx}]: "
                      f"T={float(jnp.exp(ch.log_t)):.4f} "
                      f"mass range [{float(jnp.min(inv_mass)):.4f}, "
                      f"{float(jnp.max(inv_mass)):.4f}]")

    step_size = float(da_final_step_size(da))
    # Polyak-style iterate averaging: the final Adam iterate is a noisy
    # sample of the stochastic ascent; average log T over the cooldown
    # phase (where step size and mass matrix are frozen) instead.
    log_t_final = (float(np.mean(final_phase_log_ts))
                   if final_phase_log_ts else float(ch.log_t))
    trajectory_length = float(np.clip(np.exp(log_t_final),
                                      step_size, max_steps * step_size))
    num_steps = int(max(1, round(trajectory_length / step_size)))
    inv_mass = wf.inv_mass if learn_mass_matrix else None
    info = {
        "trajectory_length": trajectory_length,
        "num_steps": num_steps,
        "step_size": step_size,
        "accept_history": accept_trace,
        "log_t_history": log_t_trace,
        "mean_leapfrogs_history": mean_n_trace,
        "halton_offset": halton_offset,
        "max_steps_cap_hit": num_steps >= max_steps,
        "target_accept": target_accept,
    }
    if verbose:
        print(f"ChEES complete: T={trajectory_length:.4f} "
              f"step={step_size:.5f} -> L={num_steps}")
    return step_size, inv_mass, cs.position, info
