"""Padding-aware analytic value-and-grad for Pallas kernel blocks.

Pallas TPU blocks are lane-padded: a (chains_tile, dim) state lives in a
(chains_tile, d_pad) VMEM block with d_pad a multiple of 128. The fused
kernels maintain the invariant that padded columns of q are ZERO (momenta and
gradients are zeroed there), so each target family only needs:

- reductions that ignore zero columns (sums of per-coordinate terms vanish),
- dimension CONSTANTS taken from the true dim, not q.shape[-1],
- explicit masking where zero inputs still produce nonzero gradients
  (correlated Gaussian's b*sum(x) term, Rosenbrock's pair couplings,
  log-gamma's positivity test).

Pallas kernels may not capture constant arrays, so every mask / eigenvalue
row is rebuilt from broadcasted_iota inside the function (scalars fold into
the compiled kernel). Builders are keyed by the ``pallas_info`` metadata the
target factories attach to their value_and_grad closures.
"""

import math
from typing import Callable

import numpy as np
from scipy.special import gammaln

import jax.numpy as jnp
from jax import lax

LOG_2PI = math.log(2.0 * math.pi)


def _col_ids(d_pad):
    return lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)


def _mask_row(dim: int, d_pad: int, dtype=jnp.float32):
    """(1, d_pad) mask: 1 for real columns, 0 for padding."""
    return (_col_ids(d_pad) < dim).astype(dtype)


def make_padded_vag(value_and_grad_fn: Callable, d_pad: int) -> Callable:
    """Build q:(C, d_pad) -> (lp:(C, 1), grad:(C, d_pad)) for a tagged target.

    Raises TypeError when the closure carries no pallas_info and KeyError for
    families without a padded specialization (callers fall back to XLA).
    """
    info = getattr(value_and_grad_fn, "pallas_info", None)
    if info is None:
        raise TypeError(
            "value_and_grad_fn has no pallas_info metadata; the Pallas "
            "backend needs a target built by mcmc_tpu.targets")
    family = info["family"]
    dim = info["dim"]
    params = info["params"]
    builder = _BUILDERS[family]   # KeyError -> no padded specialization
    return builder(dim, d_pad, params)


def _standard_normal(dim, d_pad, params):
    const = dim * LOG_2PI

    def vag(q):
        lp = -0.5 * (jnp.sum(q * q, axis=1, keepdims=True) + const)
        return lp, -q
    return vag


def _ill_conditioned(dim, d_pad, params):
    kappa = params["condition_number"]
    # linspace(1, kappa, dim)[i] = 1 + (kappa - 1) * i / (dim - 1)
    slope = (kappa - 1.0) / max(dim - 1, 1)
    const = float(np.sum(np.log(np.linspace(1.0, kappa, dim)))) + dim * LOG_2PI

    def vag(q):
        col = _col_ids(d_pad).astype(jnp.float32)
        eig = 1.0 + slope * col
        inv_eig = jnp.where(_col_ids(d_pad) < dim, 1.0 / eig, 0.0)
        siv = q * inv_eig
        lp = -0.5 * (jnp.sum(siv * q, axis=1, keepdims=True) + const)
        return lp, -siv
    return vag


def _correlated(dim, d_pad, params):
    a = params["a"]
    b = params["b"]
    const = params["log_det_cov"] + dim * LOG_2PI

    def vag(q):
        mask = _mask_row(dim, d_pad)
        s = jnp.sum(q, axis=1, keepdims=True)       # zeros in padding: exact
        siv = (a * q + b * s) * mask                # mask: b*s leaks into padding
        lp = -0.5 * (jnp.sum(siv * q, axis=1, keepdims=True) + const)
        return lp, -siv
    return vag


def _neals_funnel(dim, d_pad, params):
    d_rest = dim - 1
    log_2pi9 = math.log(2.0 * math.pi * 9.0)

    def vag(q):
        mask = _mask_row(dim, d_pad)
        col0 = _col_ids(d_pad) == 0
        x0 = q[:, 0:1]                               # (C, 1)
        inv_var = jnp.exp(-x0)
        rest = jnp.where(col0, 0.0, q)               # zero the neck column
        sum_sq = jnp.sum(rest * rest, axis=1, keepdims=True)
        lp = (-0.5 * (x0 * x0 / 9.0 + log_2pi9)
              - 0.5 * (sum_sq * inv_var + d_rest * x0 + d_rest * LOG_2PI))
        g0 = -x0 / 9.0 + 0.5 * inv_var * sum_sq - 0.5 * d_rest
        grad = jnp.where(col0, g0, -q * inv_var) * mask
        return lp, grad
    return vag


def _student_t(dim, d_pad, params):
    df = params["df"]
    log_norm = float(gammaln((df + 1.0) / 2.0) - gammaln(df / 2.0)) \
        - 0.5 * math.log(df * math.pi)
    const = dim * log_norm

    def vag(q):
        lp = const - ((df + 1.0) / 2.0) * jnp.sum(
            jnp.log1p(q * q / df), axis=1, keepdims=True)
        grad = -(df + 1.0) * q / (df + q * q)
        return lp, grad
    return vag


def _log_gamma(dim, d_pad, params):
    shape, rate = params["shape"], params["rate"]
    eps = 1e-10
    log_norm = float(gammaln(shape)) + shape * math.log(rate)

    def vag(q):
        mask = _mask_row(dim, d_pad)
        pos = q > 0
        invalid = jnp.where(pos | (mask == 0), 0.0, 1.0)
        valid = jnp.sum(invalid, axis=1, keepdims=True) == 0
        qc = jnp.maximum(q, eps)
        terms = ((shape - 1.0) * jnp.log(qc) - rate * q - log_norm) * mask
        lp = jnp.where(valid, jnp.sum(terms, axis=1, keepdims=True), -math.inf)
        g = ((shape - 1.0) * jnp.where(q > eps, 1.0 / qc, 0.0) - rate) * mask
        grad = jnp.where(valid, g, 0.0)
        return lp, grad
    return vag


def _rosenbrock(dim, d_pad, params):
    a = 1.0 / (params["scale"] ** 2)

    def vag(q):
        pair_mask = (_col_ids(d_pad) < dim - 1).astype(jnp.float32)
        q_next = jnp.concatenate([q[:, 1:], jnp.zeros_like(q[:, :1])], axis=1)
        resid = (q_next - q * q) * pair_mask
        term1 = (1.0 - q) ** 2 * pair_mask
        U = jnp.sum(term1 + a * resid * resid, axis=1, keepdims=True)
        dU_fwd = (-2.0 * (1.0 - q) - 4.0 * a * q * resid) * pair_mask
        bwd = 2.0 * a * resid                          # contribution to x_{i+1}
        dU_bwd = jnp.concatenate([jnp.zeros_like(q[:, :1]), bwd[:, :-1]], axis=1)
        return -U, -(dU_fwd + dU_bwd)
    return vag


def _gaussian_mixture(dim, d_pad, params):
    half_sep = params["separation"] / 2.0
    d_rest = dim - 1

    def vag(q):
        mask = _mask_row(dim, d_pad)
        col0 = _col_ids(d_pad) == 0
        x0 = q[:, 0:1]
        m1 = -0.5 * (x0 + half_sep) ** 2
        m2 = -0.5 * (x0 - half_sep) ** 2
        mx = jnp.maximum(m1, m2)
        e1 = jnp.exp(m1 - mx)
        e2 = jnp.exp(m2 - mx)
        lse = e1 + e2
        log_p_x0 = math.log(0.5) + mx + jnp.log(lse) - 0.5 * LOG_2PI
        rest = jnp.where(col0, 0.0, q)
        lp = log_p_x0 - 0.5 * (jnp.sum(rest * rest, axis=1, keepdims=True)
                               + d_rest * LOG_2PI)
        g0 = -((x0 + half_sep) * e1 + (x0 - half_sep) * e2) / lse
        grad = jnp.where(col0, g0, -q) * mask
        return lp, grad
    return vag


_BUILDERS = {
    "standard_normal": _standard_normal,
    "ill_conditioned_gaussian": _ill_conditioned,
    "correlated_gaussian": _correlated,
    "neals_funnel": _neals_funnel,
    "student_t": _student_t,
    "log_gamma": _log_gamma,
    "rosenbrock": _rosenbrock,
    "gaussian_mixture": _gaussian_mixture,
}

PALLAS_FAMILIES = tuple(_BUILDERS)
