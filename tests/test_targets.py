"""Target distribution tests: analytic grads vs jax.grad, moments, samplers."""

import jax
import jax.numpy as jnp
import jax.random as random
import numpy as np
import pytest

from mcmc_tpu.targets import (
    get_target, get_reference_sampler, has_reference_sampler,
    standard_normal, correlated_gaussian, ill_conditioned_gaussian,
    neals_funnel, log_gamma, student_t, rosenbrock, gaussian_mixture,
)

ALL_NAMES = [
    "standard_normal", "correlated_gaussian", "ill_conditioned_gaussian",
    "student_t", "log_gamma", "rosenbrock", "neals_funnel",
    "neals_funnel_noncentered", "gaussian_mixture",
    "multimodal_funnel_2d", "concentric_l1_2d", "concentric_l1_3d",
    "nested_l1_2d", "nested_l1_3d", "hierarchical_logistic",
]


def _positions_for(target, key, n=16):
    """Draw test positions from the target's support."""
    if target.init_sampler is not None:
        return target.init_sampler(key, n)
    return random.normal(key, (n, target.dim))


@pytest.mark.parametrize("name", ALL_NAMES)
def test_analytic_grad_matches_autodiff(name):
    target = get_target(name, dim=7 if name not in (
        "multimodal_funnel_2d", "concentric_l1_2d", "nested_l1_2d") else 2)
    key = random.PRNGKey(0)
    x = _positions_for(target, key).astype(jnp.float64)

    lp_analytic, grad_analytic = target.value_and_grad_fn(x)
    lp_auto, grad_auto = jax.vmap(jax.value_and_grad(target.log_prob_fn))(x)

    np.testing.assert_allclose(np.asarray(lp_analytic), np.asarray(lp_auto),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(grad_analytic), np.asarray(grad_auto),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_log_prob_batched_matches_single(name):
    target = get_target(name)
    key = random.PRNGKey(1)
    x = _positions_for(target, key, n=5)
    batched = target.log_prob_fn(x)
    singles = jnp.stack([target.log_prob_fn(x[i]) for i in range(5)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles), rtol=1e-12)


@pytest.mark.parametrize("name", [n for n in ALL_NAMES if has_reference_sampler(n)
                                  and n != "rosenbrock"])
def test_reference_sampler_moments(name):
    """Exact samplers must reproduce the analytic moments."""
    target = get_target(name)
    sampler = get_reference_sampler(name, dim=target.dim)
    samples = sampler(random.PRNGKey(2), 200_000)
    assert samples.shape == (200_000, target.dim)

    mean = jnp.mean(samples, axis=0)
    # Monte Carlo error of the mean: sd/sqrt(n); 5-sigma tolerance.
    sd = jnp.std(samples, axis=0)
    tol = 5.0 * sd / jnp.sqrt(200_000.0)
    assert jnp.all(jnp.abs(mean - target.true_mean) < tol + 1e-6), (
        f"{name}: mean {mean} vs {target.true_mean}")

    if target.true_cov is not None and name != "student_t":
        # Variance check (looser: 4th-moment-driven error). Skip student_t
        # (df=3 has infinite 4th moment, variance estimate converges slowly).
        var = jnp.var(samples, axis=0)
        true_var = jnp.diag(target.true_cov)
        if name in ("neals_funnel", "multimodal_funnel_2d"):
            # Funnel tails are log-normal: kurtosis ~ 3 e^9, so the variance
            # estimator of the non-neck dims barely converges at n=200k.
            # Check only the neck dimension (Gaussian, var 9 / mu^2+sigma^2).
            var, true_var = var[:1], true_var[:1]
        rel_err = jnp.abs(var - true_var) / true_var
        assert jnp.all(rel_err < 0.15), f"{name}: var {var} vs {true_var}"


def test_log_gamma_support_guard():
    target = get_target("log_gamma", dim=4)
    x_bad = jnp.array([[1.0, -0.5, 2.0, 1.0]])
    lp, grad = target.value_and_grad_fn(x_bad)
    assert jnp.isneginf(lp[0])
    assert jnp.all(jnp.isfinite(grad))


def test_funnel_true_variance_constant():
    """Var of funnel non-neck dims is exp(4.5) (reference targets.py:199)."""
    t = neals_funnel(10)
    assert np.isclose(float(t.true_cov[1, 1]), np.exp(4.5))


def test_mixture_true_variance():
    t = gaussian_mixture(10, separation=5.0)
    assert np.isclose(float(t.true_cov[0, 0]), 1.0 + 2.5**2)


def test_get_target_unknown_raises():
    with pytest.raises(ValueError):
        get_target("nope")


def test_registry_names_match_reference():
    for name in ALL_NAMES:
        t = get_target(name)
        assert t.dim >= 2
        assert t.log_prob_fn is not None and t.value_and_grad_fn is not None


def test_value_and_grad_works_unbatched():
    t = standard_normal(5)
    x = jnp.arange(5.0)
    lp, g = t.value_and_grad_fn(x)
    assert lp.shape == () and g.shape == (5,)


def test_noncentered_funnel_transform_recovers_funnel_moments():
    """funnel_transform maps exact non-centered draws to draws with the
    centered funnel's moments (Var[x0]=9, Var[x_i]=e^{4.5}; reference
    targets.py:199-203) — the green-gate funnel remedy (VERDICT r2 #5)."""
    from mcmc_tpu.targets import funnel_transform, neals_funnel_noncentered

    t = neals_funnel_noncentered(6)
    assert t.transform is funnel_transform
    sampler = get_reference_sampler("neals_funnel_noncentered", dim=6)
    y = sampler(random.PRNGKey(3), 400_000)
    x = funnel_transform(y)

    # x0 is v itself
    np.testing.assert_allclose(np.asarray(x[:, 0]), np.asarray(y[:, 0]))
    var = np.var(np.asarray(x), axis=0)
    assert abs(var[0] - 9.0) / 9.0 < 0.05
    v_rest = float(np.exp(4.5))
    # heavy-tailed (log-normal-scaled) coordinates: generous MC tolerance
    assert np.all(np.abs(var[1:] - v_rest) / v_rest < 0.5)

    # funnel log-density of transformed draws equals non-centered density
    # minus the log-Jacobian (d-1)/2 * v of the transform
    f = get_target("neals_funnel", dim=6)
    lp_f = np.asarray(f.log_prob_fn(x[:100]))
    lp_nc = np.asarray(t.log_prob_fn(y[:100]))
    jac = 2.5 * np.asarray(y[:100, 0])      # (dim-1)/2 * v
    np.testing.assert_allclose(lp_f, lp_nc - jac, rtol=1e-8, atol=1e-8)
