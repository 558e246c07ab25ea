"""Minimal numpy `arviz` stand-in for running the reference pipeline.

arviz is not installed in this image; the reference delegates R-hat / ESS /
summary to it (reference run_benchmarks.py:161-195). This module implements
the same published algorithms (Vehtari, Gelman, Simpson, Carpenter, Bürkner
2021: rank-normalized split R-hat, FFT-autocovariance Geyer ESS) in plain
numpy/scipy, exposing exactly the API surface the reference touches:

    az.from_dict(posterior={"x": (chain, draw, dim)}), az.rhat,
    az.ess(method="bulk"/"tail"), az.summary -> ["mean"]/["mcse_mean"].values

Using one diagnostic implementation for BOTH arms of the funnel parity
experiment is deliberate: gate differences then reflect sampling behavior,
not diagnostic-library differences. The formulas here are validated against
mcmc_tpu.diagnostics (and transitively against scipy rankdata semantics) by
tests/test_diagnostics_oracle.py.
"""

import numpy as np
import scipy.stats


class _Vals:
    def __init__(self, values):
        self.values = np.asarray(values)


class _IData:
    def __init__(self, x):
        # x: (chain, draw, dim) -> internal (draw, chain, dim)
        self.x = np.asarray(x).transpose(1, 0, 2)


def from_dict(posterior=None, coords=None, dims=None):
    return _IData(posterior["x"])


def _split(x):
    n = x.shape[0] // 2
    return np.concatenate([x[:n], x[n:2 * n]], axis=1)


def _rank_normalize(x):
    n, m = x.shape[:2]
    flat = x.reshape(n * m)
    ranks = scipy.stats.rankdata(flat, method="average")
    z = scipy.stats.norm.ppf((ranks - 0.375) / (n * m + 0.25))
    return z.reshape(n, m)


def _rhat_classic(x):
    n = x.shape[0]
    means = x.mean(axis=0)
    W = x.var(axis=0, ddof=1).mean()
    B = n * means.var(ddof=1)
    var_plus = (n - 1) / n * W + B / n
    return np.sqrt(var_plus / W)


def _rhat_1d(x2d):
    xs = _split(x2d)
    bulk = _rhat_classic(_rank_normalize(xs))
    folded = np.abs(xs - np.median(xs))
    tail = _rhat_classic(_rank_normalize(folded))
    return max(bulk, tail)


def _ess_core(z):
    """Geyer initial-monotone ESS of already-split/transformed (n, m)."""
    n, m = z.shape
    xc = z - z.mean(axis=0)
    size = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(xc, n=size, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=size, axis=0)[:n].real / n
    chain_var = acov[0] * n / (n - 1)
    W = chain_var.mean()
    var_plus = W * (n - 1) / n + z.mean(axis=0).var(ddof=1)
    if var_plus <= 0:
        return float(n * m)
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


def _ess_bulk_1d(x2d):
    return _ess_core(_rank_normalize(_split(x2d)))


def _ess_tail_1d(x2d):
    xs = _split(x2d)
    flat = xs.reshape(-1)
    out = []
    for q in (0.05, 0.95):
        ind = (xs <= np.quantile(flat, q)).astype(np.float64)
        out.append(_ess_core(ind))
    return min(out)


def _ess_mean_1d(x2d):
    return _ess_core(_split(x2d))


def rhat(idata, var_names=None, **kw):
    x = idata.x
    return {"x": _Vals([_rhat_1d(x[:, :, j]) for j in range(x.shape[2])])}


def ess(idata, var_names=None, method="bulk", **kw):
    x = idata.x
    fn = {"bulk": _ess_bulk_1d, "tail": _ess_tail_1d,
          "mean": _ess_mean_1d}[method]
    return {"x": _Vals([fn(x[:, :, j]) for j in range(x.shape[2])])}


class _Summary:
    """pandas-DataFrame-shaped access: summary["mean"].values."""

    def __init__(self, cols):
        self._cols = cols

    def __getitem__(self, k):
        return _Vals(self._cols[k])


def summary(idata, var_names=None, **kw):
    x = idata.x
    d = x.shape[2]
    flat = x.reshape(-1, d)
    mean = flat.mean(axis=0)
    sd = flat.std(axis=0, ddof=1)
    ess_m = np.array([_ess_mean_1d(x[:, :, j]) for j in range(d)])
    mcse = sd / np.sqrt(ess_m)
    return _Summary({
        "mean": mean, "sd": sd, "mcse_mean": mcse,
        "ess_bulk": np.array([_ess_bulk_1d(x[:, :, j]) for j in range(d)]),
        "ess_tail": np.array([_ess_tail_1d(x[:, :, j]) for j in range(d)]),
        "r_hat": np.array([_rhat_1d(x[:, :, j]) for j in range(d)]),
    })
