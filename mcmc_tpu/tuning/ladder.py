"""Adaptive tempering-ladder tuning (stochastic approximation on spacings).

Beyond-reference capability (the reference has no tempering at all; the
rebuild's `samplers/tempered.py` added the ladder, this module tunes it).
A geometric ladder equalizes swap acceptance only when the energy scales
linearly in beta — on funnels, mixtures with unequal-width modes, or any
target whose effective dimension changes along the ladder, geometric
spacing leaves some adjacent pairs near-frozen (swap acceptance ~ 0, the
ladder splits in two) while others waste rungs at ~1.

The standard remedy (Miasojedow, Moulines & Vihola 2013, "An adaptive
parallel tempering algorithm") is Robbins-Monro on the LOG-SPACINGS of the
inverse temperatures, driving every adjacent pair's swap acceptance to the
optimal 0.234 (Atchade, Roberts & Rosenthal 2011 — same 0.234 as RWMH, and
the constant the reference already targets for RWMH step tuning,
reference tuning/dual_averaging.py:20):

    beta_0 = 1,  beta_{k+1} = beta_k * exp(-exp(rho_k))
    rho_k <- rho_k + eta_t * (A_k - 0.234)

Acceptance above target => the rungs are closer than they need to be =>
widen the spacing (rho up); below target => narrow. The parameterization
keeps the ladder sorted and positive BY CONSTRUCTION — no projection step.

TPU-native shape: each adaptation round is ONE jitted tempered scan
(`samplers/tempered.py::tempered_run` — fused Pallas kernels, mesh
shard_map, everything the sampling phase uses) whose per-pair swap
acceptance comes back as a (K-1,) vector; the host loop only does the
K-scalar Robbins-Monro update between rounds, exactly the host/device
split the dual-averaging warmup already uses (tuning/adaptation.py). The
betas enter `tempered_run` as a TRACED operand, so every round reuses one
compiled executable.
"""

from typing import Callable, Dict, Optional, Tuple

import numpy as np

DEFAULT_SWAP_TARGET = 0.234  # Atchade-Roberts-Rosenthal optimal PT swap rate


def spacings_to_betas(rho: np.ndarray) -> np.ndarray:
    """Map free log-spacings (K-1,) to a sorted ladder (K,) with beta_0=1."""
    rho = np.asarray(rho, np.float64)
    return np.exp(-np.concatenate([[0.0], np.cumsum(np.exp(rho))]))


def geometric_spacings(n_temps: int, beta_min: float) -> np.ndarray:
    """Log-spacings reproducing geometric_ladder(n_temps, beta_min)."""
    if n_temps < 2:
        raise ValueError("ladder tuning needs n_temps >= 2")
    if not 0.0 < beta_min < 1.0:
        raise ValueError("beta_min must be in (0, 1)")
    step = -np.log(beta_min) / (n_temps - 1)
    return np.full(n_temps - 1, np.log(step), np.float64)


def tune_ladder(
    run_round: Callable,
    n_temps: int,
    beta_min_init: float = 0.05,
    target_swap: float = DEFAULT_SWAP_TARGET,
    n_rounds: int = 24,
    learning_rate: float = 0.5,
    decay: float = 0.6,
    t0: float = 2.0,
    beta_floor: float = 1e-4,
    verbose: bool = False,
) -> Tuple[np.ndarray, Dict]:
    """Adapt the inverse-temperature ladder to uniform swap acceptance.

    run_round(betas: (K,) float32, replica_position or None)
        -> (swap_accept_rate: (K-1,), replica_final_positions)
    runs a short tempered sampling burst at the given ladder, continuing
    from the previous round's full (K*C, D) replica state — the caller
    decides the backend (XLA / fused Pallas / mesh shard_map) by closing
    over `tempered_run` or `tempered_run_sharded`.

    Returns (betas, info). info carries the swap-rate history (pre/post
    deviation from target is the tuning's honest report card), the final
    replica positions (seed the sampling phase with them: the hot rungs
    are already equilibrated), and the spacing trace.
    """
    rho = geometric_spacings(n_temps, beta_min_init)
    log_floor = -np.log(beta_floor)
    replica_pos = None
    history = []
    for t in range(n_rounds):
        betas = spacings_to_betas(rho).astype(np.float32)
        swap_rates, replica_pos = run_round(betas, replica_pos)
        swap_rates = np.asarray(swap_rates, np.float64)
        history.append({"betas": betas.tolist(),
                        "swap_rates": swap_rates.tolist()})
        if not np.all(np.isfinite(swap_rates)):
            # divergent hot rungs produce NaN acceptance: freeze rather
            # than feed NaN into the spacings
            if verbose:
                print(f"  [ladder] round {t}: non-finite swap rates, "
                      "skipping update")
            continue
        eta = learning_rate / (t0 + t) ** decay
        rho = rho + eta * (swap_rates - target_swap)
        # keep the coldest rung above beta_floor by shrinking all spacings
        # proportionally (relative geometry is what the update learned)
        total = float(np.sum(np.exp(rho)))
        if total > log_floor:
            rho = rho + np.log(log_floor / total)
        if verbose:
            dev = float(np.mean(np.abs(swap_rates - target_swap)))
            print(f"  [ladder] round {t}: mean|A-{target_swap:.3f}|={dev:.3f}"
                  f" beta_min={spacings_to_betas(rho)[-1]:.4f}")
    betas = spacings_to_betas(rho).astype(np.float32)
    first = np.asarray(history[0]["swap_rates"], np.float64)
    last = np.asarray(history[-1]["swap_rates"], np.float64)
    info = {
        "betas": betas,
        "replica_final_positions": replica_pos,
        "n_rounds": n_rounds,
        "target_swap": target_swap,
        "initial_deviation": float(np.mean(np.abs(first - target_swap))),
        "final_deviation": float(np.mean(np.abs(last - target_swap))),
        "history": history,
    }
    return betas, info
