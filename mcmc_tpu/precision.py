"""Mixed-precision policy for TPU-native MCMC.

The reference keeps positions/gradients in the position dtype and log-probs /
Hamiltonians in float64 (reference: samplers/HMC.py:74, samplers/GRAHMC.py:141,
samplers/NUTS.py:78). On TPU, float64 is software-emulated and slow, so the policy
here is dtype-parametric:

- ``energy_dtype()`` returns float64 when ``jax_enable_x64`` is on (CPU validation
  runs, exact reference parity) and float32 otherwise (TPU fast path, validated by
  the statistical quality gates instead of bit-parity).
- Positions and gradients stay in the position dtype (float32 default).

The Metropolis test ``log u < min(0, H0 - H1)`` is a *difference* of energies, so
float32 accumulation is statistically adequate for the benchmark targets as long as
the non-finite-Hamiltonian reject guard is kept (it is, in every sampler).
"""

import jax
import jax.numpy as jnp

# Forced-rejection energy for non-finite Hamiltonians (reference: HMC.py:199,
# GRAHMC.py:328). Large enough that log_alpha is astronomically negative, small
# enough not to overflow float32.
ENERGY_OVERFLOW = 1e10


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def energy_dtype():
    """Dtype for log-probs and Hamiltonians. float64 iff x64 is enabled."""
    return jnp.float64 if x64_enabled() else jnp.float32


def default_position_dtype():
    """Dtype for positions/momenta/gradients. Follows JAX default float."""
    return jnp.float64 if x64_enabled() else jnp.float32


def guard_energy(h):
    """Replace non-finite Hamiltonians with a huge finite value => forced reject."""
    return jnp.where(jnp.isfinite(h), h, jnp.asarray(ENERGY_OVERFLOW, dtype=h.dtype))
