"""Sliced Wasserstein-2 distance as a single fused TPU computation.

The reference computes this on host in Python-loop batches of projections
(reference benchmarks/metrics.py:12-145). Here the projection step is one
matmul (n, dim) @ (dim, P) — MXU work — followed by ``jax.lax.sort`` along the
sample axis, all inside one jit. Batched projections are kept as an option for
very large sample sets, but the default is a single fused call.

Protocol parity (reference metrics.py / run_benchmarks.py:817-820):
500 random unit projections, quantile matching when sample counts differ,
W2 = sqrt(mean((q1 - q2)^2)) per projection, mean over projections;
``compute_sliced_w2`` flattens chains, draws 50k reference samples, subsamples
the MCMC side if larger.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import random


@partial(jax.jit, static_argnames=("n_quantiles",))
def _sliced_w2_batch(samples1, samples2, directions, n_quantiles: int):
    """W2 per projection for one batch of unit directions: (P,)."""
    proj1 = samples1 @ directions.T          # (n1, P)
    proj2 = samples2 @ directions.T          # (n2, P)
    s1 = jnp.sort(proj1, axis=0)
    s2 = jnp.sort(proj2, axis=0)
    n1, n2 = s1.shape[0], s2.shape[0]
    if n1 != n2:
        q = jnp.linspace(0.0, 1.0, n_quantiles)
        s1 = jnp.quantile(s1, q, axis=0)
        s2 = jnp.quantile(s2, q, axis=0)
    return jnp.sqrt(jnp.mean((s1 - s2) ** 2, axis=0))


def sliced_wasserstein_distance(
    samples1: jnp.ndarray,
    samples2: jnp.ndarray,
    n_projections: int = 500,
    key: Optional[jnp.ndarray] = None,
    projection_batch_size: int = 500,
) -> float:
    """Sliced W2 between two sample sets (n_i, dim).

    Protocol matches the reference (metrics.py:12-84), including the fixed
    default key and per-batch ``fold_in`` direction keys, but runs fused on
    device. ``projection_batch_size`` defaults to all-at-once; reduce it for
    very large sample sets.
    """
    if key is None:
        key = random.PRNGKey(30)

    samples1 = jnp.asarray(samples1)
    samples2 = jnp.asarray(samples2)
    n1, dim = samples1.shape
    n2 = samples2.shape[0]
    n_quantiles = min(n1, n2)

    w2_all = []
    n_batches = (n_projections + projection_batch_size - 1) // projection_batch_size
    for batch_idx in range(n_batches):
        size = min(projection_batch_size, n_projections - batch_idx * projection_batch_size)
        batch_key = random.fold_in(key, batch_idx)
        directions = random.normal(batch_key, (size, dim))
        directions = directions / jnp.linalg.norm(directions, axis=1, keepdims=True)
        w2_all.append(_sliced_w2_batch(samples1, samples2, directions, n_quantiles))

    return float(jnp.mean(jnp.concatenate(w2_all)))


def compute_sliced_w2(
    samples: jnp.ndarray,
    target_name: str,
    dim: int,
    n_reference: int = 50000,
    n_projections: int = 500,
    projection_batch_size: int = 500,
    key: Optional[jnp.ndarray] = None,
    **target_kwargs,
) -> Optional[float]:
    """Sliced W2 between MCMC samples and exact ground truth, or None.

    Parity: reference metrics.py:87-145. samples may be (num_samples, n_chains,
    dim) or (n, dim).
    """
    from mcmc_tpu.targets import get_reference_sampler

    if key is None:
        key = random.PRNGKey(123)

    ref_sampler = get_reference_sampler(target_name, dim, **target_kwargs)
    if ref_sampler is None:
        return None

    flat = samples.reshape(-1, dim) if samples.ndim == 3 else samples
    n_samples = flat.shape[0]

    key, subkey = random.split(key)
    reference_samples = ref_sampler(subkey, n_reference)

    if n_samples > n_reference:
        key, subkey = random.split(key)
        idx = random.choice(subkey, n_samples, (n_reference,), replace=False)
        flat = flat[idx]

    key, subkey = random.split(key)
    return sliced_wasserstein_distance(
        flat, reference_samples,
        n_projections=n_projections,
        projection_batch_size=projection_batch_size,
        key=subkey,
    )
