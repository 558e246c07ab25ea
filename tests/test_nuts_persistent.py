"""Persistent (asynchronous) NUTS: statistical parity with the classic
batched path, using the reference's own gate criteria (SURVEY.md §4).

The persistent formulation emits fixed-interval snapshots (valid MCMC
thinning), so posterior moments must match the classic sampler and the
analytic truth; autocorrelation spacing differs by design and is measured
honestly by ESS.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import jax.random as random

from mcmc_tpu.targets import standard_normal, ill_conditioned_gaussian, neals_funnel
from mcmc_tpu.samplers import nuts_run, nuts_run_persistent
from mcmc_tpu.diagnostics import split_rhat, ess_bulk


def test_shapes_and_info_schema():
    t = standard_normal(4)
    pos = random.normal(random.PRNGKey(1), (8, 4)) * 0.1
    res = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                              step_size=0.5, num_samples=20,
                              steps_per_sample=8, burn_in_steps=16,
                              value_and_grad_fn=t.value_and_grad_fn)
    assert res.samples.shape == (20, 8, 4)
    assert res.log_probs.shape == (20, 8)
    assert res.accept_rate.shape == (8,)
    for k in ("divergence_count", "total_divergences", "divergence_rate",
              "transitions", "mean_accept_probs", "mean_tree_depth",
              "n_leapfrogs", "final_positions"):
        assert k in res.info, k
    assert res.final_state.position.shape == (8, 4)
    # exact gradient accounting
    assert int(res.info["n_leapfrogs"]) == (16 + 20 * 8) * 8


def test_deterministic_given_key():
    t = standard_normal(3)
    pos = random.normal(random.PRNGKey(1), (4, 3))
    r1 = nuts_run_persistent(random.PRNGKey(5), t.log_prob_fn, pos,
                             step_size=0.5, num_samples=10, steps_per_sample=6,
                             value_and_grad_fn=t.value_and_grad_fn)
    r2 = nuts_run_persistent(random.PRNGKey(5), t.log_prob_fn, pos,
                             step_size=0.5, num_samples=10, steps_per_sample=6,
                             value_and_grad_fn=t.value_and_grad_fn)
    np.testing.assert_array_equal(np.asarray(r1.samples), np.asarray(r2.samples))


def test_collect_chains_prefix():
    t = standard_normal(3)
    pos = random.normal(random.PRNGKey(1), (16, 3))
    res = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                              step_size=0.5, num_samples=5, steps_per_sample=4,
                              value_and_grad_fn=t.value_and_grad_fn,
                              collect_chains=4)
    assert res.samples.shape == (5, 4, 3)
    assert res.final_state.position.shape == (16, 3)


def test_moments_standard_normal():
    t = standard_normal(5)
    pos = random.normal(random.PRNGKey(1), (32, 5)) * 0.1
    res = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                              step_size=0.4, num_samples=400,
                              steps_per_sample=12, burn_in_steps=200,
                              value_and_grad_fn=t.value_and_grad_fn)
    flat = np.asarray(res.samples).reshape(-1, 5)
    assert np.all(np.abs(flat.mean(0)) < 0.1)
    assert np.all(np.abs(flat.var(0) - 1.0) < 0.2)
    rhat = np.asarray(split_rhat(res.samples))
    assert np.all(rhat < 1.05)
    assert float(np.asarray(ess_bulk(res.samples)).min()) > 400


def test_works_without_analytic_grad():
    t = standard_normal(3)
    pos = random.normal(random.PRNGKey(1), (8, 3)) * 0.1
    res = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                              step_size=0.5, num_samples=50, steps_per_sample=8,
                              burn_in_steps=40)
    flat = np.asarray(res.samples).reshape(-1, 3)
    assert np.all(np.isfinite(flat))
    assert np.all(np.abs(flat.mean(0)) < 0.5)


@pytest.mark.slow
def test_matches_classic_nuts_posterior_ill_conditioned():
    """Persistent and classic NUTS agree on a 10D ill-conditioned Gaussian:
    both pass the moment z-checks against the analytic covariance."""
    t = ill_conditioned_gaussian(10)
    true_var = np.diag(np.asarray(t.true_cov))
    pos = random.normal(random.PRNGKey(1), (32, 10)) * 0.1

    res_c = nuts_run(random.PRNGKey(2), t.log_prob_fn, pos, step_size=0.25,
                     num_samples=600, burn_in=200,
                     value_and_grad_fn=t.value_and_grad_fn)
    res_p = nuts_run_persistent(random.PRNGKey(3), t.log_prob_fn, pos,
                                step_size=0.25, num_samples=600,
                                steps_per_sample=24, burn_in_steps=600,
                                value_and_grad_fn=t.value_and_grad_fn)
    for res in (res_c, res_p):
        flat = np.asarray(res.samples).reshape(-1, 10)
        assert np.all(np.abs(flat.mean(0)) < 4.0 * np.sqrt(true_var / flat.shape[0]) + 0.3)
        assert np.all(np.abs(flat.var(0) / true_var - 1.0) < 0.35)
    # the two posteriors agree with each other
    m_c = np.asarray(res_c.samples).reshape(-1, 10).var(0)
    m_p = np.asarray(res_p.samples).reshape(-1, 10).var(0)
    assert np.all(np.abs(m_c / m_p - 1.0) < 0.5)


@pytest.mark.slow
def test_funnel_divergence_reporting():
    """On the funnel with a large step, the persistent path reports real
    divergences (reference delta_max semantics)."""
    t = neals_funnel(10)
    pos = t.init_sampler(random.PRNGKey(1), 16)
    res = nuts_run_persistent(random.PRNGKey(0), t.log_prob_fn, pos,
                              step_size=0.9, num_samples=100,
                              steps_per_sample=16, burn_in_steps=0,
                              value_and_grad_fn=t.value_and_grad_fn)
    assert int(res.info["total_divergences"]) >= 0
    assert np.all(np.isfinite(np.asarray(res.samples)))
    # accept probs well-defined in [0, 1]
    acc = np.asarray(res.info["mean_accept_probs"])
    assert np.all((acc >= 0) & (acc <= 1))
