"""Adaptive tempering-ladder tuning (tuning/ladder.py).

Beyond-reference capability (the reference has no tempering; the rebuild
added the ladder in samplers/tempered.py and this tuner on top): Robbins-
Monro on the ladder's log-spacings drives every adjacent pair's swap
acceptance to the optimal 0.234. Tests cover the parameterization (sorted
positive ladders by construction), convergence on an analytic acceptance
model, the beta floor, the NaN freeze guard, a real tempered_run closure,
and the benchmark runner's Phase-1b integration (--tempering-ladder
adaptive).
"""

import numpy as np
import pytest
import jax.numpy as jnp
import jax.random as random

from mcmc_tpu.samplers import geometric_ladder, tempered_run
from mcmc_tpu.targets import get_target, standard_normal
from mcmc_tpu.tuning.ladder import (DEFAULT_SWAP_TARGET, geometric_spacings,
                                    spacings_to_betas, tune_ladder)


def test_spacings_roundtrip_geometric():
    """geometric_spacings reproduces geometric_ladder exactly through
    spacings_to_betas; ladders are sorted descending with beta_0 = 1 BY
    CONSTRUCTION for any real-valued spacings."""
    rho = geometric_spacings(6, 0.05)
    np.testing.assert_allclose(spacings_to_betas(rho),
                               np.asarray(geometric_ladder(6, 0.05)),
                               rtol=1e-6)
    rng = np.random.default_rng(0)
    for _ in range(5):
        b = spacings_to_betas(rng.normal(size=7) * 2.0)
        assert b[0] == 1.0
        assert np.all(np.diff(b) < 0) and np.all(b > 0)
    with pytest.raises(ValueError, match="n_temps"):
        geometric_spacings(1, 0.05)
    with pytest.raises(ValueError, match="beta_min"):
        geometric_spacings(4, 2.0)


def test_tune_ladder_synthetic_convergence():
    """On an analytic acceptance model A_k = exp(-s_k) (s_k the adjacent
    log-spacing) every pair has the same fixed point s* = -ln(0.234); the
    tuner must converge all spacings to it."""
    def run_round(betas, steps, replica_pos):
        assert steps is None                 # step tuning not enabled
        s = np.log(betas[:-1]) - np.log(betas[1:])
        return np.exp(-s), None, None, None

    betas, info = tune_ladder(run_round, 4, beta_min_init=0.05, n_rounds=40,
                              learning_rate=1.5)
    assert info["initial_deviation"] > 0.1          # geometric start is off
    assert info["final_deviation"] < 0.01
    s_star = -np.log(DEFAULT_SWAP_TARGET)
    s = np.log(betas[:-1].astype(np.float64)) - np.log(
        betas[1:].astype(np.float64))
    np.testing.assert_allclose(s, s_star, rtol=0.05)
    assert betas[0] == 1.0 and np.all(np.diff(betas) < 0)


def test_tune_ladder_beta_floor():
    """Acceptance pinned above target widens spacings every round; the
    floor renormalizes them so the coldest rung never drops below
    beta_floor (relative geometry preserved)."""
    betas, _ = tune_ladder(lambda b, s, r: (np.ones(3), np.ones(3), None,
                                            None), 4,
                           beta_min_init=0.05, n_rounds=30,
                           beta_floor=0.01)
    assert betas[-1] >= 0.0099
    np.testing.assert_allclose(betas[-1], 0.01, rtol=1e-3)
    # equal per-pair acceptance => floor keeps the ladder geometric
    r = betas[1:] / betas[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-4)


def test_tune_ladder_step_adaptation():
    """Joint per-rung step tuning: on a model where transition acceptance
    is a known decreasing function of the sqrt-beta-scaled step, every
    free rung converges to the target-acceptance fixed point while the
    cold rung stays PINNED at the warmup-tuned value (scale_0 = 1)."""
    target_accept = 0.65

    def run_round(betas, steps, rep):
        swap = np.full(len(betas) - 1, DEFAULT_SWAP_TARGET)  # ladder static
        scaled = np.asarray(steps, np.float64) * np.sqrt(
            np.asarray(betas, np.float64))
        return swap, None, np.exp(-scaled), None             # A = e^{-x}

    betas, info = tune_ladder(run_round, 4, beta_min_init=0.05,
                              n_rounds=60, step_size=1.0,
                              target_accept=target_accept,
                              step_learning_rate=1.5)
    steps = np.asarray(info["step_sizes"], np.float64)
    scaled = steps * np.sqrt(np.asarray(betas, np.float64))
    np.testing.assert_allclose(scaled[0], 1.0, rtol=1e-5)    # pinned
    # free rungs: fixed point x* solves e^{-x} = 0.65
    np.testing.assert_allclose(scaled[1:], -np.log(target_accept),
                               rtol=0.05)


def test_tune_ladder_nan_freeze_guard():
    """Non-finite swap rates (divergent hot rungs) freeze the update
    instead of corrupting the spacings."""
    betas, info = tune_ladder(
        lambda b, s, r: (np.full(3, np.nan), np.ones(3), None, None), 4,
        beta_min_init=0.05, n_rounds=5)
    np.testing.assert_allclose(betas, np.asarray(geometric_ladder(4, 0.05)),
                               rtol=1e-6)
    assert len(info["history"]) == 5


def test_tune_ladder_rejects_unattempted_pairs():
    """A burst whose swap_attempts report a never-attempted pair (burst
    shorter than one even/odd cycle, e.g. 16 draws at swap_interval=16)
    raises on the FIRST round: the pair's rate reads 0, and feeding that
    fake always-rejected signal to Robbins-Monro would silently drive its
    spacing toward zero until the ladder degenerates."""
    with pytest.raises(ValueError, match=r"never attempted.*\[1\]"):
        tune_ladder(lambda b, s, r: (np.array([0.3, 0.0, 0.3]),
                                     np.array([8.0, 0.0, 8.0]), None, None),
                    4, beta_min_init=0.05, n_rounds=4)


def test_tune_ladder_partial_nan_masks_per_pair():
    """NaN masking is PER PAIR: finite pairs keep adapting while a
    divergent pair's spacing freezes (the round-2 all-or-nothing freeze
    would stall the whole ladder on one bad rung)."""
    def run_round(betas, steps, rep):
        return np.array([1.0, np.nan, 1.0]), np.ones(3), None, None

    betas, _ = tune_ladder(run_round, 4, beta_min_init=0.05, n_rounds=3)
    b = betas.astype(np.float64)
    s = np.log(b[:-1]) - np.log(b[1:])
    s_geo = -np.log(0.05) / 3.0
    np.testing.assert_allclose(s[1], s_geo, rtol=1e-6)   # frozen pair
    assert s[0] > s_geo * 1.2 and s[2] > s_geo * 1.2     # adapted pairs


def test_tune_ladder_real_tempered_run():
    """Closing run_round over the real jitted tempered_run (betas traced:
    every round reuses the executable): deviation from the 0.234 target
    must not grow, the ladder stays valid, and the replica state threads
    through rounds at full (K*C, D) shape."""
    t = standard_normal(4)
    init = random.normal(random.PRNGKey(1), (32, 4)) * 0.2
    calls = [0]

    def burst(betas, steps, rep):
        k = random.fold_in(random.PRNGKey(7), calls[0])
        calls[0] += 1
        r = tempered_run(k, t.log_prob_fn, init,
                         step_size=jnp.asarray(steps),
                         num_steps=8, num_samples=24,
                         betas=jnp.asarray(betas),
                         init_replica_position=rep,
                         value_and_grad_fn=t.value_and_grad_fn)
        return (np.asarray(r.info["swap_accept_rate"]),
                np.asarray(r.info["swap_attempts"]),
                np.asarray(r.info["replica_accept_rate"]),
                r.info["replica_final_positions"])

    betas, info = tune_ladder(burst, 4, beta_min_init=0.05, n_rounds=8,
                              step_size=0.5, target_accept=0.65)
    assert calls[0] == 8
    assert betas.shape == (4,) and betas[0] == 1.0
    assert np.all(np.diff(betas) < 0)
    assert info["replica_final_positions"].shape == (4 * 32, 4)
    assert info["final_deviation"] <= info["initial_deviation"] + 0.05


def test_runner_adaptive_ladder_e2e():
    """--tempering-ladder adaptive through the full pipeline: Phase 1b
    tunes the ladder, Phase 2 samples it (tuned betas in the row, NOT the
    geometric default), and the burst-equilibrated replica state seeds
    sampling."""
    from mcmc_tpu.benchmark.runner import run_single_benchmark_with_L

    t = get_target("standard_normal", dim=4)
    r = run_single_benchmark_with_L(
        "hmc", t, "standard_normal", random.PRNGKey(9), n_chains=16,
        num_warmup=120, num_samples=250, schedule_type="constant",
        num_steps=8, mesh_devices="off", tempering=3,
        tempering_ladder="adaptive")
    assert r.get("error") is None
    assert r["tempering"] == 3
    assert r["tempering_ladder"] == "adaptive"
    assert r["ladder_rounds"] == 16
    assert np.isfinite(r["ladder_final_deviation"])
    assert r["ladder_tune_time"] > 0
    betas = np.asarray(r["tempering_betas"])
    assert betas.shape == (3,) and betas[0] == 1.0
    assert np.all(np.diff(betas) < 0)
    # tuned ladder actually reached Phase 2: the recorded betas differ
    # from the geometric default it would otherwise run
    geo = np.asarray(geometric_ladder(3, 0.05))
    assert not np.allclose(betas, geo, atol=1e-3)
    # per-rung steps tuned jointly; cold rung pinned to the warmup step
    steps = np.asarray(r["tempering_step_sizes"])
    assert steps.shape == (3,) and np.all(steps > 0)
    np.testing.assert_allclose(steps[0], r["step_size"], rtol=1e-3)
    assert np.isfinite(r["rhat_max"])


def test_runner_adaptive_ladder_long_swap_interval():
    """swap_interval > burst/2 used to starve odd pairs of swap attempts
    inside the 16-draw tuning bursts, silently driving their spacings to
    zero: the runner must size bursts to cover a full even/odd cycle
    (num_samples >= 2 * swap_interval), which the tuner's zero-attempt
    check now enforces — this run raising no ValueError IS the test."""
    from mcmc_tpu.benchmark.runner import run_single_benchmark_with_L

    t = get_target("standard_normal", dim=2)
    r = run_single_benchmark_with_L(
        "hmc", t, "standard_normal", random.PRNGKey(3), n_chains=8,
        num_warmup=60, num_samples=64, schedule_type="constant",
        num_steps=4, mesh_devices="off", tempering=3,
        tempering_swap_interval=16, tempering_ladder="adaptive")
    assert r.get("error") is None
    betas = np.asarray(r["tempering_betas"])
    assert betas.shape == (3,) and np.all(np.diff(betas) < 0)
    # every adjacent pair saw real swap evidence during sampling too
    assert all(0.0 <= a <= 1.0 for a in r["swap_accept_rate"])


def test_runner_ladder_validation():
    """chees + tempering is rejected at the single-run level too (the
    criterion would adapt to the cold replica only), as is an unknown
    ladder mode — loudly, before any warmup is paid."""
    from mcmc_tpu.benchmark.runner import run_single_benchmark_with_L

    t = get_target("standard_normal", dim=4)
    with pytest.raises(ValueError, match="ChEES"):
        run_single_benchmark_with_L(
            "hmc", t, "standard_normal", random.PRNGKey(0), n_chains=8,
            num_warmup=10, num_samples=10, schedule_type="constant",
            num_steps=4, mesh_devices="off", tempering=3,
            trajectory_tuner="chees")
    with pytest.raises(ValueError, match="tempering_ladder"):
        run_single_benchmark_with_L(
            "hmc", t, "standard_normal", random.PRNGKey(0), n_chains=8,
            num_warmup=10, num_samples=10, schedule_type="constant",
            num_steps=4, mesh_devices="off", tempering=3,
            tempering_ladder="bogus")
