"""RAHMC-paper benchmark targets (multimodal, repelling-attracting showcases).

The reference imports these from ``benchmarks/rahmc_paper_targets.py``, a module
missing from its snapshot; only the factory names and parameters survive at
reference targets.py:506-524. The densities here are reconstructed from those
signatures and the RAHMC paper's theme (multimodal funnels, L1-ball shells):

- ``multimodal_funnel_2d(mu, sigma, c)``: bimodal neck prior
  ``v ~ 0.5 N(+mu, sigma^2) + 0.5 N(-mu, sigma^2)`` with a funnel conditional
  ``x | v ~ N(0, c e^v)``. Tractable moments and an exact sampler.
- ``concentric_l1_balls(dim, radii, sigma)``: mixture of Gaussian shells in the
  L1 norm, ``p(x) ∝ sum_k exp(-(|x|_1 - r_k)^2 / (2 sigma^2))``.
- ``nested_l1_balls(dim, r_outer, r_inner, mu_norm, sigma, n_inner)``: one outer
  L1 shell plus ``n_inner`` small L1 shells centred on +/- axis points at L1
  distance ``mu_norm`` from the origin.

All carry batched analytic value-and-grad (checked vs jax.grad in tests).
"""

import jax.numpy as jnp
import jax.random as random
from jax.nn import softmax, logsumexp

from mcmc_tpu.targets import TargetDistribution, _tag


def multimodal_funnel_2d(mu: float = 3.0, sigma: float = 1.0, c: float = 1.0) -> TargetDistribution:
    """2D bimodal funnel: v ~ 0.5 N(+mu,s^2) + 0.5 N(-mu,s^2); x|v ~ N(0, c e^v)."""
    sig2 = sigma * sigma

    def value_and_grad_fn(xy):
        v = xy[..., 0]
        x = xy[..., 1]
        # log of the bimodal neck prior via logsumexp
        a1 = -0.5 * (v - mu) ** 2 / sig2
        a2 = -0.5 * (v + mu) ** 2 / sig2
        terms = jnp.stack([a1, a2], axis=-1)
        log_prior = jnp.log(0.5) + logsumexp(terms, axis=-1) - 0.5 * jnp.log(2.0 * jnp.pi * sig2)
        # funnel conditional
        inv_var = jnp.exp(-v) / c
        log_cond = -0.5 * (x ** 2 * inv_var + v + jnp.log(2.0 * jnp.pi * c))
        lp = log_prior + log_cond
        # gradients
        w = softmax(terms, axis=-1)
        d_prior_dv = -(w[..., 0] * (v - mu) + w[..., 1] * (v + mu)) / sig2
        d_cond_dv = 0.5 * x ** 2 * inv_var - 0.5
        gv = d_prior_dv + d_cond_dv
        gx = -x * inv_var
        return lp, jnp.stack([gv, gx], axis=-1)

    def log_prob_fn(xy):
        return value_and_grad_fn(xy)[0]

    def init_sampler(key, n_chains):
        k1, k2, k3 = random.split(key, 3)
        comp = random.bernoulli(k1, 0.5, (n_chains,))
        v = random.normal(k2, (n_chains,)) * sigma + jnp.where(comp, mu, -mu)
        x = random.normal(k3, (n_chains,)) * jnp.sqrt(c)
        return jnp.stack([v, x], axis=-1)

    _tag(value_and_grad_fn, "multimodal_funnel_2d", 2,
         mu=mu, sigma=sigma, c=c)
    var_v = mu ** 2 + sig2
    # Var[x] = c * E[e^v] = c * exp(sig2/2) * cosh(mu)  (mixture of lognormal moments)
    var_x = c * jnp.exp(sig2 / 2.0) * jnp.cosh(mu)

    return TargetDistribution(
        log_prob_fn=log_prob_fn,
        dim=2,
        true_mean=jnp.zeros(2),
        true_cov=jnp.diag(jnp.array([var_v, var_x])),
        name=f"MultimodalFunnel2D_mu{mu}",
        description="2D bimodal funnel - tests mode switching under varying curvature",
        init_sampler=init_sampler,
        value_and_grad_fn=value_and_grad_fn,
        family="multimodal_funnel_2d",
        params={"mu": mu, "sigma": sigma, "c": c},
    )


def multimodal_funnel_2d_sampler(mu: float = 3.0, sigma: float = 1.0, c: float = 1.0):
    """Exact i.i.d. sampler for multimodal_funnel_2d: (key, n) -> (n, 2)."""
    def sampler(key, n):
        k1, k2, k3 = random.split(key, 3)
        comp = random.bernoulli(k1, 0.5, (n,))
        v = random.normal(k2, (n,)) * sigma + jnp.where(comp, mu, -mu)
        x = random.normal(k3, (n,)) * jnp.sqrt(c * jnp.exp(v))
        return jnp.stack([v, x], axis=-1)
    return sampler


def concentric_l1_balls(dim: int = 2, radii=(4.0, 8.0, 16.0), sigma: float = 0.5) -> TargetDistribution:
    """Mixture of Gaussian shells in the L1 norm: p ∝ sum_k exp(-(|x|_1-r_k)^2/2s^2)."""
    radii_arr = jnp.asarray(radii)
    sig2 = sigma * sigma

    def value_and_grad_fn(x):
        u = jnp.sum(jnp.abs(x), axis=-1)                       # (...,)
        terms = -0.5 * (u[..., None] - radii_arr) ** 2 / sig2  # (..., K)
        lp = logsumexp(terms, axis=-1)
        w = softmax(terms, axis=-1)
        du = jnp.sum(w * (-(u[..., None] - radii_arr) / sig2), axis=-1)  # d lp / d u
        grad = du[..., None] * jnp.sign(x)
        return lp, grad

    def log_prob_fn(x):
        return value_and_grad_fn(x)[0]

    _tag(value_and_grad_fn, "concentric_l1_balls", dim,
         radii=tuple(float(r) for r in radii), sigma=sigma)

    def init_sampler(key, n_chains):
        # Start on random shells: direction on the L1 sphere of a random radius.
        k1, k2, k3 = random.split(key, 3)
        which = random.randint(k1, (n_chains,), 0, len(radii))
        r = radii_arr[which]
        d = random.normal(k2, (n_chains, dim))
        d = d / jnp.sum(jnp.abs(d), axis=-1, keepdims=True)
        return d * r[:, None] + random.normal(k3, (n_chains, dim)) * sigma

    return TargetDistribution(
        log_prob_fn=log_prob_fn,
        dim=dim,
        true_mean=jnp.zeros(dim),  # symmetric about the origin
        true_cov=None,
        name=f"ConcentricL1_{dim}D_r{'-'.join(str(float(r)) for r in radii)}",
        description=f"{dim}D concentric L1 shells - tests crossing low-density gaps",
        init_sampler=init_sampler,
        value_and_grad_fn=value_and_grad_fn,
        family="concentric_l1_balls",
        params={"radii": tuple(float(r) for r in radii), "sigma": sigma},
    )


def nested_l1_balls(dim: int = 2, r_outer: float = 20.0, r_inner: float = 2.0,
                    mu_norm: float = 2.0, sigma: float = 0.5, n_inner: int = 4) -> TargetDistribution:
    """Outer L1 shell at r_outer plus n_inner small L1 shells near the origin.

    Inner shell centres are +/- axis-aligned points at L1 distance ``mu_norm``:
    (+m,0,..), (-m,0,..), (0,+m,..), (0,-m,..), ... Symmetric placement for even
    n_inner keeps the true mean at the origin.
    """
    sig2 = sigma * sigma
    # Build centres: outer shell centred at origin + n_inner axis points.
    centers = [jnp.zeros(dim)]
    for j in range(n_inner):
        axis = (j // 2) % dim
        sign = 1.0 if j % 2 == 0 else -1.0
        centers.append(sign * mu_norm * jnp.eye(dim)[axis])
    centers_arr = jnp.stack(centers)                              # (K, dim), K = n_inner+1
    radii_arr = jnp.asarray([r_outer] + [r_inner] * n_inner)      # (K,)

    def value_and_grad_fn(x):
        diff = x[..., None, :] - centers_arr                      # (..., K, dim)
        u = jnp.sum(jnp.abs(diff), axis=-1)                       # (..., K)
        terms = -0.5 * (u - radii_arr) ** 2 / sig2
        lp = logsumexp(terms, axis=-1)
        w = softmax(terms, axis=-1)
        du = w * (-(u - radii_arr) / sig2)                        # (..., K)
        grad = jnp.sum(du[..., None] * jnp.sign(diff), axis=-2)   # (..., dim)
        return lp, grad

    def log_prob_fn(x):
        return value_and_grad_fn(x)[0]

    def init_sampler(key, n_chains):
        k1, k2, k3 = random.split(key, 3)
        which = random.randint(k1, (n_chains,), 0, centers_arr.shape[0])
        c = centers_arr[which]
        r = radii_arr[which]
        d = random.normal(k2, (n_chains, dim))
        d = d / jnp.sum(jnp.abs(d), axis=-1, keepdims=True)
        return c + d * r[:, None] + random.normal(k3, (n_chains, dim)) * sigma

    _tag(value_and_grad_fn, "nested_l1_balls", dim,
         r_outer=r_outer, r_inner=r_inner, mu_norm=mu_norm, sigma=sigma,
         n_inner=n_inner)
    symmetric = (n_inner % 2 == 0)
    return TargetDistribution(
        log_prob_fn=log_prob_fn,
        dim=dim,
        true_mean=jnp.zeros(dim) if symmetric else None,
        true_cov=None,
        name=f"NestedL1_{dim}D_ro{r_outer}_ri{r_inner}",
        description=f"{dim}D nested L1 shells - tests escaping nested modes",
        init_sampler=init_sampler,
        value_and_grad_fn=value_and_grad_fn,
        family="nested_l1_balls",
        params={"r_outer": r_outer, "r_inner": r_inner, "mu_norm": mu_norm,
                "sigma": sigma, "n_inner": n_inner},
    )
