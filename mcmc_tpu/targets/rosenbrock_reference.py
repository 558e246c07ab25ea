"""Ground-truth samples for the Rosenbrock density via a cached long NUTS run.

The Rosenbrock density has no exact sampler; the reference ships pre-generated
long-run NUTS samples as ``benchmarks/reference_samples/rosenbrock_{20,50}d.npy``
(reference targets.py:646-684) plus a ``generate_rosenbrock_reference.py`` script
(both missing from its snapshot). Here generation is built in: samples are
produced on demand by a long NUTS run with warmup and cached to disk.
"""

import os
import warnings

import numpy as np
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "reference_samples")


def _cache_path(dim: int) -> str:
    return os.path.join(_CACHE_DIR, f"rosenbrock_{dim}d.npy")


def load_rosenbrock_reference(dim: int, scale: float = 0.1):
    """Load cached Rosenbrock ground-truth samples, or None if not generated.

    Mirrors the reference's behavior of only supporting 20D/50D pre-generated
    files (targets.py:647-649) but accepts any dim for which a cache exists.
    """
    path = _cache_path(dim)
    if not os.path.exists(path):
        if dim in (20, 50):
            warnings.warn(
                f"Rosenbrock reference samples not found at {path}. Run "
                f"'python generate_rosenbrock_reference.py --dim {dim}' to generate them.",
                UserWarning,
            )
        return None
    return jnp.asarray(np.load(path))


def generate_rosenbrock_reference(dim: int, scale: float = 0.1,
                                  n_samples: int = 50000, n_chains: int = 32,
                                  num_warmup: int = 2000, seed: int = 7,
                                  thin: int = 4) -> np.ndarray:
    """Generate and cache ground-truth Rosenbrock samples with a long NUTS run.

    Runs ``n_chains`` NUTS chains with adaptive warmup, thins by ``thin``, and
    keeps ``n_samples`` draws. Diagnostics (R-hat) are printed so the quality of
    the ground truth is visible.
    """
    import jax.random as random
    from mcmc_tpu.targets import rosenbrock
    from mcmc_tpu.samplers.nuts import nuts_run
    from mcmc_tpu.tuning.adaptation import run_adaptive_warmup
    from mcmc_tpu.diagnostics import split_rhat

    target = rosenbrock(dim=dim, scale=scale)
    key = random.PRNGKey(seed)
    key, init_key, warm_key, sample_key = random.split(key, 4)
    init_pos = target.init_sampler(init_key, n_chains)

    step_size, inv_mass, position, _ = run_adaptive_warmup(
        "nuts", target.log_prob_fn, None, init_pos, warm_key,
        num_warmup=num_warmup, target_accept=0.8, max_tree_depth=12,
        value_and_grad_fn=target.value_and_grad_fn,
    )

    per_chain = (n_samples * thin + n_chains - 1) // n_chains
    res = nuts_run(
        sample_key, target.log_prob_fn, position,
        step_size=step_size, num_samples=per_chain, burn_in=0,
        inv_mass_matrix=inv_mass, max_tree_depth=12,
        value_and_grad_fn=target.value_and_grad_fn,
    )
    samples = res.samples
    rhat = split_rhat(samples)
    print(f"Rosenbrock {dim}D reference: R-hat max = {float(jnp.max(rhat)):.4f}")

    thinned = samples[::thin]                                  # (per_chain/thin, chains, dim)
    flat = np.asarray(thinned.reshape(-1, dim))[:n_samples]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    np.save(_cache_path(dim), flat)
    return flat
