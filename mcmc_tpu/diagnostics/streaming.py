"""Chain-chunked (streaming) diagnostics for histories too large to process
in one program.

At the framework's own operating point — (S, 65536, D) histories, several GB —
a monolithic rank-normalized ESS program needs pooled sorts, FFT buffers and
rank gathers over the whole history at once, which overflows device memory and
has crashed the remote TPU worker (see `_DIM_CHUNK` note in
diagnostics/__init__.py). The exact statistics, however, decompose over
chains:

- rank normalization pools ALL draws, so it is done ONCE per dim block on
  device (the two-operand-sort scheme shared with the monolithic
  `_rank_normalize` — see its docstring);
- the Vehtari/Geyer ESS and split R-hat need only per-chain moments (chain
  means, unbiased chain variances, chain-averaged autocovariance), which are
  plain sums over chains.

So the streaming path rank-normalizes each dim block once, then accumulates
per-chain-chunk moments over slices of the precomputed z-scores, then combines
with the SAME `_ess_combine` / R-hat formulas as the monolithic path —
chunked == monolithic exactly (up to float summation order), which
`tests/test_streaming_diagnostics.py` asserts.

Nothing ever leaves the device: inputs can be (and should be) committed device
arrays; only the final (dim,) statistics are returned.
"""

import jax
import jax.numpy as jnp
from jax import lax

from mcmc_tpu.diagnostics.rhat_ess import (
    _autocovariance_fft, _ess_combine, _rank_normalize, _split_chains,
)

DEFAULT_CHAIN_CHUNK = 8192
DEFAULT_DIM_CHUNK = 8


@jax.jit
def _rank_z_block(block):
    """Pooled rank-normal z-scores for a whole (S, C, dd) dim block.

    Identical semantics (and implementation — the two-operand-sort scheme,
    measured 3.2x faster than argsort+gather at (192, 65536, 4) on v5e) to
    the monolithic `_rank_normalize`; jitted separately so each dim block
    compiles once at its own static shape.
    """
    return _rank_normalize(block)


@jax.jit
def _chunk_moments(z_chunk):
    """Per-chain-chunk accumulands from precomputed z-scores (S, c, dd).

    Returns sums over the chunk's 2c split chains of:
      (chain_var, acov (n, dd), z-mean, z-mean^2, z chain var) and the count.
    """
    x = _split_chains(z_chunk)                            # (n, 2c, dd)
    n = x.shape[0]
    acov = _autocovariance_fft(x)                         # (n, 2c, dd)
    chain_var = acov[0] * n / (n - 1.0)                   # (2c, dd)
    zmean = jnp.mean(x, axis=0)                           # (2c, dd)
    zvar = jnp.var(x, axis=0, ddof=1)                     # (2c, dd)
    return (jnp.sum(chain_var, axis=0),
            jnp.sum(acov, axis=1),
            jnp.sum(zmean, axis=0),
            jnp.sum(zmean * zmean, axis=0),
            jnp.sum(zvar, axis=0),
            x.shape[1])


def _accumulate_block(block, chain_chunk):
    """Rank-normalize one dim block, then accumulate moments per chain chunk."""
    S, C, dd = block.shape
    z = _rank_z_block(block)
    sums = None
    m_total = 0
    for c0 in range(0, C, chain_chunk):
        cv, ac, zm, zm2, zv, m = _chunk_moments(z[:, c0:c0 + chain_chunk])
        m_total += int(m)
        if sums is None:
            sums = [cv, ac, zm, zm2, zv]
        else:
            sums = [a + b for a, b in zip(sums, (cv, ac, zm, zm2, zv))]
    cv, ac, zm, zm2, zv = sums
    n = (S // 2)
    M = m_total
    mean_var = cv / M
    mean_acov = ac / M
    var_means = (zm2 - zm * zm / M) / (M - 1)
    return {
        "n": n, "M": M,
        "mean_var": mean_var, "mean_acov": mean_acov, "var_means": var_means,
        "W": zv / M,
    }


def ess_bulk_chunked(samples, chain_chunk: int = DEFAULT_CHAIN_CHUNK,
                     dim_chunk: int = DEFAULT_DIM_CHUNK):
    """Bulk ESS of (S, C, D) samples, chunked over chains and dims.

    Exactly equal (up to summation order) to
    `mcmc_tpu.diagnostics.ess_bulk(samples)`, but never builds pooled-rank /
    FFT buffers for more than `chain_chunk` chains x `dim_chunk` dims at once.
    """
    samples = jnp.asarray(samples)
    S, C, D = samples.shape
    samples = samples[: 2 * (S // 2)]     # match _split_chains truncation
    out = []
    for d0 in range(0, D, dim_chunk):
        block = samples[:, :, d0:d0 + dim_chunk]
        mo = _accumulate_block(block, chain_chunk)
        out.append(_ess_combine(mo["mean_var"], mo["mean_acov"],
                                mo["var_means"], mo["n"], mo["M"]))
    return jnp.concatenate(out)


def split_rhat_chunked(samples, chain_chunk: int = DEFAULT_CHAIN_CHUNK,
                       dim_chunk: int = DEFAULT_DIM_CHUNK):
    """Rank-normalized split R-hat (max of bulk and folded), chunked.

    Matches `mcmc_tpu.diagnostics.split_rhat(samples)` up to summation order.
    """
    samples = jnp.asarray(samples)
    S, C, D = samples.shape
    samples = samples[: 2 * (S // 2)]     # match _split_chains truncation
    S = samples.shape[0]
    out = []
    for d0 in range(0, D, dim_chunk):
        block = samples[:, :, d0:d0 + dim_chunk]
        rhats = []
        for folded in (False, True):
            b = block
            if folded:
                med = jnp.median(block.reshape(S * C, -1), axis=0)
                b = jnp.abs(block - med)
            mo = _accumulate_block(b, chain_chunk)
            n, M = mo["n"], mo["M"]
            W = mo["W"]
            B = n * mo["var_means"]
            var_plus = (n - 1) / n * W + B / n
            rhats.append(jnp.sqrt(var_plus / W))
        out.append(jnp.maximum(*rhats))
    return jnp.concatenate(out)
