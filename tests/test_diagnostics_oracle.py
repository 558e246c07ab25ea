"""Independent NumPy oracle for R-hat/ESS (Vehtari et al. 2021 formulas).

A from-first-principles scipy/NumPy reimplementation — no shared code with
mcmc_tpu.diagnostics — checked against the on-device versions to tight
tolerance. This substitutes for arviz (absent in this environment) as the
algorithmic cross-check.
"""

import numpy as np
import scipy.stats
import jax.numpy as jnp
import jax.random as random

from mcmc_tpu.diagnostics import split_rhat, ess_bulk, ess_mean


def _np_split(x):
    n = x.shape[0] // 2
    return np.concatenate([x[:n], x[n:2 * n]], axis=1)


def _np_rank_normalize(x):
    n, m = x.shape[:2]
    flat = x.reshape(n * m)
    ranks = scipy.stats.rankdata(flat, method="average")
    z = scipy.stats.norm.ppf((ranks - 0.375) / (n * m + 0.25))
    return z.reshape(n, m)


def _np_rhat_classic(x):
    n = x.shape[0]
    means = x.mean(axis=0)
    W = x.var(axis=0, ddof=1).mean()
    B = n * means.var(ddof=1)
    var_plus = (n - 1) / n * W + B / n
    return np.sqrt(var_plus / W)


def _np_rhat(x2d):
    """Rank-normalized split R-hat for one dim: (n, m) -> scalar."""
    xs = _np_split(x2d)
    bulk = _np_rhat_classic(_np_rank_normalize(xs))
    folded = np.abs(xs - np.median(xs))
    tail = _np_rhat_classic(_np_rank_normalize(folded))
    return max(bulk, tail)


def _np_ess(x2d):
    """ESS via FFT autocovariance + Geyer initial monotone sequence (n, m)."""
    x = _np_split(x2d)
    n, m = x.shape
    xc = x - x.mean(axis=0)
    size = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(xc, n=size, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=size, axis=0)[:n].real / n

    chain_var = acov[0] * n / (n - 1)
    W = chain_var.mean()
    var_plus = W * (n - 1) / n + x.mean(axis=0).var(ddof=1)
    rho = 1.0 - (W - acov.mean(axis=1)) / var_plus
    rho[0] = 1.0

    P = rho[: 2 * (n // 2)].reshape(-1, 2).sum(axis=1)
    # initial positive sequence
    k_stop = len(P)
    for k in range(1, len(P)):
        if P[k] <= 0:
            k_stop = k
            break
    P = P[:k_stop]
    # initial monotone sequence
    P = np.minimum.accumulate(P)
    tau = max(-1.0 + 2.0 * P.sum(), 1.0 / np.log10(n * m + 10))
    return n * m / tau


def _np_ess_bulk(x2d):
    xs = _np_split(x2d)
    z = _np_rank_normalize(xs)
    # _np_ess splits again internally; feed the unsplit-equivalent by
    # reconstructing: run the core on z directly instead.
    n, m = z.shape
    xc = z - z.mean(axis=0)
    size = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(xc, n=size, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=size, axis=0)[:n].real / n
    chain_var = acov[0] * n / (n - 1)
    W = chain_var.mean()
    var_plus = W * (n - 1) / n + z.mean(axis=0).var(ddof=1)
    rho = 1.0 - (W - acov.mean(axis=1)) / var_plus
    rho[0] = 1.0
    P = rho[: 2 * (n // 2)].reshape(-1, 2).sum(axis=1)
    k_stop = len(P)
    for k in range(1, len(P)):
        if P[k] <= 0:
            k_stop = k
            break
    P = np.minimum.accumulate(P[:k_stop])
    tau = max(-1.0 + 2.0 * P.sum(), 1.0 / np.log10(n * m + 10))
    return n * m / tau


def _make_correlated_chains(key, n=800, m=4, d=3, rho=0.7, shift=0.0):
    """AR(1) chains with optional per-chain mean shifts (nonconvergence)."""
    rng = np.random.default_rng(int(key))
    innov = rng.normal(size=(n, m, d)) * np.sqrt(1 - rho**2)
    x = np.zeros((n, m, d))
    x[0] = rng.normal(size=(m, d))
    for t_ in range(1, n):
        x[t_] = rho * x[t_ - 1] + innov[t_]
    if shift:
        x += shift * np.arange(m)[None, :, None]
    return x


def test_rhat_matches_numpy_oracle():
    for shift in (0.0, 0.5):
        x = _make_correlated_chains(1, shift=shift)
        ours = np.asarray(split_rhat(jnp.asarray(x)))
        oracle = np.array([_np_rhat(x[:, :, j]) for j in range(x.shape[2])])
        np.testing.assert_allclose(ours, oracle, rtol=1e-6, atol=1e-8)


def test_ess_mean_matches_numpy_oracle():
    x = _make_correlated_chains(2)
    ours = np.asarray(ess_mean(jnp.asarray(x)))
    oracle = np.array([_np_ess(x[:, :, j]) for j in range(x.shape[2])])
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_ess_bulk_matches_numpy_oracle():
    x = _make_correlated_chains(3)
    ours = np.asarray(ess_bulk(jnp.asarray(x)))
    oracle = np.array([_np_ess_bulk(x[:, :, j]) for j in range(x.shape[2])])
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_rhat_with_exact_ties_matches_average_ranks():
    """Discrete-valued draws: average-rank handling must match scipy exactly."""
    rng = np.random.default_rng(7)
    x = rng.integers(0, 5, size=(400, 4, 2)).astype(np.float64)
    x += rng.normal(size=x.shape) * 0  # keep exact ties
    ours = np.asarray(split_rhat(jnp.asarray(x)))
    oracle = np.array([_np_rhat(x[:, :, j]) for j in range(2)])
    np.testing.assert_allclose(ours, oracle, rtol=1e-6)
