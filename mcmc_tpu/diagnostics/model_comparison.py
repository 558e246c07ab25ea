"""Model comparison: WAIC and PSIS-LOO cross-validation, on device.

The reference ships arviz in its requirements (reference
requirements.txt:1-7) and with it users get `arviz.loo` / `arviz.waic` /
`arviz.compare` for model comparison; the rebuild replaced arviz with
on-device diagnostics (diagnostics/rhat_ess.py, streaming.py), so this
module closes the remaining arviz capability a switching user would miss.
Everything is batched jnp on the (draws, n_data) log-likelihood matrix —
per-datapoint computations are independent columns (vmap), the Pareto
fits are sort + fixed-grid profile likelihood (no host loops), and the
whole estimator jits with static shapes.

References:
- WAIC: Watanabe (2010); the elpd formulation of Vehtari, Gelman & Gabry
  (2017), "Practical Bayesian model evaluation using leave-one-out
  cross-validation and WAIC" (Stat. Comput. 27) — eq. (11)-(13).
- PSIS-LOO: Vehtari, Gelman & Gabry (2017) eq. (3)-(10) + Vehtari,
  Simpson, Gelman, Yao & Gabry (2024), "Pareto smoothed importance
  sampling" (JMLR 25): tail fraction min(0.2 S, 3 sqrt(S)), generalized-
  Pareto fit on the exceedances, expected-order-statistic replacement of
  the tail weights, truncation at the raw maximum, and the k-hat > 0.7
  reliability threshold.
- GPD fit: Zhang & Stephens (2009), "A new and efficient estimation
  method for the generalized Pareto distribution" (Technometrics 51) —
  the profile-posterior grid estimator arviz uses, including the weak
  (k_hat (M) + 0.5*10) / (M + 10) shrinkage prior from Vehtari et al.

The model's pointwise log-likelihood matrix is the user contract (same as
arviz's `log_likelihood` group): `ll[s, i] = log p(y_i | theta_s)` for S
posterior draws and n data points. `pointwise_log_likelihood` builds it
from a per-draw function by vmap.
"""

from functools import partial
from typing import Callable, Dict, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import jit, lax, vmap
from jax.scipy.special import logsumexp

Array = jnp.ndarray

# PSIS reliability thresholds (Vehtari et al. 2024, Table 1 guidance)
KHAT_GOOD = 0.7


class LooResult(NamedTuple):
    """PSIS-LOO estimate.

    elpd:      expected log pointwise predictive density (sum over data)
    se:        standard error of elpd (sqrt(n * var(elpd_i)))
    p_eff:     effective number of parameters (lppd - elpd)
    elpd_i:    (n,) per-datapoint elpd contributions
    khat:      (n,) Pareto k-hat per datapoint; > 0.7 means the i-th
               importance distribution is too heavy-tailed to trust
    n_bad_khat: count of khat > 0.7
    """
    elpd: float
    se: float
    p_eff: float
    elpd_i: Array
    khat: Array
    n_bad_khat: int


class WaicResult(NamedTuple):
    """WAIC estimate (elpd scale, like LooResult).

    n_high_penalty counts datapoints with p_waic_i > 0.4, where the
    variance-based penalty (and hence WAIC itself) is unreliable and
    PSIS-LOO should be preferred (Vehtari et al. 2017, sec. 2.2).
    """
    elpd: float
    se: float
    p_eff: float
    elpd_i: Array
    p_waic_i: Array
    n_high_penalty: int


def pointwise_log_likelihood(ll_fn: Callable, samples: Array) -> Array:
    """Build the (S, n_data) log-likelihood matrix from a per-draw fn.

    ll_fn: theta (dim,) -> (n_data,) pointwise log-likelihoods.
    samples: (draws, chains, dim) history or (S, dim) flat draws.
    """
    samples = jnp.asarray(samples)
    if samples.ndim == 3:
        samples = samples.reshape(-1, samples.shape[-1])
    return vmap(ll_fn)(samples)


def _gpd_fit(x: Array):
    """Generalized-Pareto (sigma, k) fit to exceedances x > 0 (any order).

    Zhang & Stephens (2009) profile-posterior grid estimator with the
    Vehtari et al. (2024) shrinkage prior on k. Parameterization:
    cdf(y) = 1 - (1 + k y / sigma)^(-1/k), k > 0 heavy tails.
    Returns (k_hat, sigma_hat). Degenerate all-equal x is guarded to
    (0, mean) — exponential-like, never NaN.
    """
    M = x.shape[0]
    xs = jnp.sort(x)
    x_star = xs[(M - 1) // 4]           # first-quartile order statistic
    x_max = xs[-1]
    m_grid = 30 + int(np.floor(np.sqrt(M)))
    j = jnp.arange(1, m_grid + 1, dtype=x.dtype)
    # theta = k / sigma candidates; guard zero quartiles (ties at 0)
    x_star = jnp.maximum(x_star, 1e-12 * jnp.maximum(x_max, 1.0))
    theta = 1.0 / x_max + (1.0 - jnp.sqrt(m_grid / (j - 0.5))) / (
        3.0 * x_star)
    # profile k(theta) = -mean log(1 - theta x); theta < 1/x_max by
    # construction except the j=... boundary — clamp the log argument
    one_m = jnp.maximum(1.0 - theta[:, None] * xs[None, :], 1e-30)
    k_prof = -jnp.mean(jnp.log(one_m), axis=1)
    # k(theta) carries theta's sign (negative theta -> bounded tail, k<0;
    # Zhang-Stephens allows both) so theta/k > 0 always; only guard the
    # k -> 0 neighborhood where the ratio's limit is 1/mean(x)
    k_safe = jnp.where(jnp.abs(k_prof) < 1e-12,
                       jnp.where(k_prof < 0, -1e-12, 1e-12), k_prof)
    log_lik = M * (jnp.log(jnp.abs(theta / k_safe)) + k_prof - 1.0)
    # posterior-probability weights over the grid (normalized in a
    # numerically safe way: subtract the max)
    w = jnp.exp(log_lik - jnp.max(log_lik))
    w = w / jnp.sum(w)
    theta_hat = jnp.sum(w * theta)
    # Zhang-Stephens' shape has the OPPOSITE sign of the standard GPD xi
    # (their F = 1 - (1 - k x/sigma)^(1/k), so their k = -xi): the
    # standard-convention estimate is +mean log(1 - theta x), and sigma
    # is convention-invariant as (their k)/theta = -xi/theta... i.e.
    # sigma = -k_hat/theta. Validated on synthetic GPD tails
    # (tests/test_model_comparison.py::test_gpd_fit_recovers_known_shapes).
    k_hat = jnp.mean(jnp.log(jnp.maximum(1.0 - theta_hat * xs, 1e-30)))
    sigma_hat = -k_hat / theta_hat
    # weak prior: regularize k toward 0.5 for small tails (Vehtari 2024:
    # pseudo-count 10 at k = 0.5, i.e. (M k + 10*0.5) / (M + 10))
    k_hat = (M * k_hat + 10.0 * 0.5) / (M + 10.0)
    # degenerate exceedances (all ~equal): theta_hat ~ 1/x_max, sigma>0
    sigma_hat = jnp.where(jnp.isfinite(sigma_hat) & (sigma_hat > 0.0),
                          sigma_hat, jnp.mean(xs))
    return k_hat, sigma_hat


def _gpd_quantile(q: Array, k: Array, sigma: Array) -> Array:
    """Inverse cdf of the generalized Pareto: sigma/k ((1-q)^-k - 1)."""
    # k -> 0 limit is -sigma log(1-q); branch smoothly via where
    small = jnp.abs(k) < 1e-6
    k_safe = jnp.where(small, 1.0, k)
    main = sigma / k_safe * (jnp.power(1.0 - q, -k_safe) - 1.0)
    limit = -sigma * jnp.log1p(-q)
    return jnp.where(small, limit, main)


def _psis_column(lr: Array, n_tail: int):
    """Pareto-smooth ONE column of raw log importance ratios (S,).

    Returns (lw, khat): self-normalized smoothed log-weights and the
    tail-shape diagnostic. Static n_tail keeps the sorts fixed-shape.
    """
    S = lr.shape[0]
    lr = lr - jnp.max(lr)
    # ascending sort once; tail = top n_tail, cutoff = next order stat
    order = jnp.argsort(lr)
    sorted_lr = lr[order]
    cutoff_log = sorted_lr[S - n_tail - 1]
    tail_log = sorted_lr[S - n_tail:]
    cutoff = jnp.exp(cutoff_log)
    exceed = jnp.exp(tail_log) - cutoff
    # degenerate tail (all ratios ~equal, e.g. a theta-independent
    # likelihood column): nothing to smooth — keep the raw weights and
    # report khat = -inf (lightest possible tail), never NaN
    degenerate = exceed[-1] <= 0.0
    exceed_safe = jnp.where(degenerate,
                            jnp.arange(1, n_tail + 1, dtype=lr.dtype),
                            exceed)
    khat, sigma = _gpd_fit(exceed_safe)
    # expected-order-statistic replacement, truncated at the raw max
    # (= 1.0 after the max shift)
    q = (jnp.arange(1, n_tail + 1, dtype=lr.dtype) - 0.5) / n_tail
    smoothed = jnp.minimum(cutoff + _gpd_quantile(q, khat, sigma), 1.0)
    new_sorted = jnp.concatenate(
        [sorted_lr[:S - n_tail], jnp.log(jnp.maximum(smoothed, 1e-300))])
    new_lr = jnp.zeros_like(lr).at[order].set(new_sorted)
    new_lr = jnp.where(degenerate, lr, new_lr)
    khat = jnp.where(degenerate, -jnp.inf, khat)
    return new_lr - logsumexp(new_lr), khat


@partial(jit, static_argnames=("n_tail",))
def _psis_loo_core(ll: Array, n_tail: int):
    lw_raw = -ll                             # log 1/p(y_i | theta_s)
    lw, khat = vmap(_psis_column, in_axes=(1, None),
                    out_axes=(1, 0))(lw_raw, n_tail)
    elpd_i = logsumexp(ll + lw, axis=0)      # lw self-normalized per column
    S = ll.shape[0]
    lppd_i = logsumexp(ll, axis=0) - jnp.log(jnp.asarray(S, ll.dtype))
    return elpd_i, khat, lppd_i


def psis_loo(ll: Array) -> LooResult:
    """PSIS-LOO: leave-one-out elpd from one posterior sample.

    ll: (S, n_data) pointwise log-likelihood matrix (draws flattened over
    chains; use `pointwise_log_likelihood`). Importance ratios
    1/p(y_i | theta_s) target each leave-one-out posterior; their heavy
    tails are Pareto-smoothed per datapoint. Trust elpd where khat < 0.7.
    """
    ll = jnp.asarray(ll)
    if ll.ndim == 3:                         # (draws, chains, n) history
        ll = ll.reshape(-1, ll.shape[-1])
    S, n = ll.shape
    if S < 25:
        raise ValueError(f"PSIS needs >= 25 draws, got {S}")
    n_tail = int(min(np.ceil(0.2 * S), np.ceil(3.0 * np.sqrt(S))))
    elpd_i, khat, lppd_i = _psis_loo_core(ll, n_tail)
    elpd_i = np.asarray(elpd_i)
    elpd = float(elpd_i.sum())
    se = float(np.sqrt(n * np.var(elpd_i)))
    p_eff = float(np.asarray(lppd_i).sum() - elpd)
    n_bad = int((np.asarray(khat) > KHAT_GOOD).sum())
    return LooResult(elpd, se, p_eff, jnp.asarray(elpd_i), khat, n_bad)


@jit
def _waic_core(ll: Array):
    S = ll.shape[0]
    lppd_i = logsumexp(ll, axis=0) - jnp.log(jnp.asarray(S, ll.dtype))
    p_i = jnp.var(ll, axis=0, ddof=1)
    return lppd_i - p_i, p_i


def waic(ll: Array) -> WaicResult:
    """WAIC on the elpd scale: lppd_i - var_s(ll_si), summed over data."""
    ll = jnp.asarray(ll)
    if ll.ndim == 3:
        ll = ll.reshape(-1, ll.shape[-1])
    elpd_i, p_i = _waic_core(ll)
    elpd_i = np.asarray(elpd_i)
    p_i = np.asarray(p_i)
    n = elpd_i.shape[0]
    return WaicResult(
        elpd=float(elpd_i.sum()),
        se=float(np.sqrt(n * np.var(elpd_i))),
        p_eff=float(p_i.sum()),
        elpd_i=jnp.asarray(elpd_i),
        p_waic_i=jnp.asarray(p_i),
        n_high_penalty=int((p_i > 0.4).sum()),
    )


def compare(results: Dict[str, LooResult]) -> Dict:
    """Rank models by elpd with paired difference standard errors.

    results: {model_name: LooResult or WaicResult} over the SAME data.
    Returns {"ranking": [names best->worst], "table": {name: {elpd, se,
    d_elpd, d_se, p_eff, n_bad_khat}}}. d_elpd/d_se are vs the best model,
    with d_se from the PAIRED per-datapoint differences (Vehtari et al.
    2017 eq. 24) — the right uncertainty for "is A better than B".
    """
    if not results:
        raise ValueError("compare() needs at least one model")
    lens = {np.asarray(r.elpd_i).shape[0] for r in results.values()}
    if len(lens) != 1:
        raise ValueError(
            f"models were evaluated on different data sizes: {lens}")
    ranking = sorted(results, key=lambda m: results[m].elpd, reverse=True)
    best = results[ranking[0]]
    best_i = np.asarray(best.elpd_i)
    n = best_i.shape[0]
    table = {}
    for name in ranking:
        r = results[name]
        diff = np.asarray(r.elpd_i) - best_i
        table[name] = {
            "elpd": float(r.elpd),
            "se": float(r.se),
            "p_eff": float(r.p_eff),
            "d_elpd": float(diff.sum()),
            "d_se": float(np.sqrt(n * np.var(diff))),
            "n_bad_khat": int(getattr(r, "n_bad_khat", 0)),
        }
    return {"ranking": ranking, "table": table}
