"""Fused GRAHMC/HMC transition as a single Pallas TPU kernel.

One kernel call = one full MH transition for a tile of chains, entirely in
VMEM:

  momentum refresh (on-chip PRNG, Box-Muller)
  -> L conformal-leapfrog substeps with the analytic target gradient inlined
     (friction gamma(t) evaluated per substep; absent for HMC)
  -> energies with the non-finite guard
  -> Metropolis accept and state select

This is the SURVEY.md north-star fusion: the reference's per-substep
vmap(value_and_grad) scan becomes one on-chip loop with zero HBM round-trips
inside the trajectory. The chain axis is tiled across the grid; padded lane
columns hold zeros (see ops/padded_targets.py for the masking contract).

The kernel is float32 throughout (TPU fast path). Statistical correctness is
validated by the same quality gates as the XLA path; a deterministic variant
with injectable randomness (``inject_randoms=True``) exists for bitwise-level
trajectory comparison in tests.
"""

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax, random
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmc_tpu.ops.padded_targets import make_padded_vag, _mask_row

ENERGY_OVERFLOW = 1e10
DIVERGENCE_DELTA_H = 1000.0
LANE = 128
TWO_PI = 2.0 * math.pi


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _bits_to_uniform(bits):
    """random bits -> float32 uniform in (0, 1): 24-bit mantissa, never 0.

    prng_random_bits yields int32 on TPU; bitcast to uint32 so the shift is
    logical (an arithmetic shift of negative bits would sign-extend)."""
    bits = pltpu.bitcast(bits, jnp.uint32) >> 8
    # Mosaic cannot cast uint32->float32 directly; after the logical shift the
    # top bits are clear, so a bitcast back to int32 is value-preserving.
    return (pltpu.bitcast(bits, jnp.int32).astype(jnp.float32)
            * (2.0 ** -24) + (2.0 ** -25))


def _gaussian(shape):
    """Standard normal via Box-Muller from two on-chip uniform draws."""
    u1 = _bits_to_uniform(pltpu.prng_random_bits(shape))
    u2 = _bits_to_uniform(pltpu.prng_random_bits(shape))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(TWO_PI * u2)


def _make_kernel(padded_vag: Callable, num_steps: int,
                 friction_schedule: Optional[Callable],
                 inject_randoms: bool):
    """Kernel body factory. Ref order:
    seed(SMEM), scalars(SMEM), q, lp, grad, inv_mass, mask
    [, p0, u if inject_randoms] -> q_out, lp_out, grad_out, acc_out, dh_out."""

    def kernel(seed_ref, scal_ref, q_ref, lp_ref, grad_ref, invm_ref,
               mask_ref, *rest):
        if inject_randoms:
            p0_ref, u_ref, q_out, lp_out, grad_out, acc_out, dh_out = rest
        else:
            q_out, lp_out, grad_out, acc_out, dh_out = rest
            # distinct stream per grid tile
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 7919)

        eps = scal_ref[0]
        gamma_max = scal_ref[1]
        steepness = scal_ref[2]

        q0 = q_ref[:]
        lp0 = lp_ref[:]
        grad0 = grad_ref[:]
        invm = invm_ref[:]          # (1, d_pad); padding filled with 1.0
        mask = mask_ref[:]          # (1, d_pad)

        if inject_randoms:
            p0 = p0_ref[:] * mask
        else:
            p0 = _gaussian(q0.shape) / jnp.sqrt(invm) * mask

        kin0 = 0.5 * jnp.sum(p0 * p0 * invm, axis=1, keepdims=True)
        h0 = -lp0 + kin0

        half_eps = 0.5 * eps
        total_time = eps * num_steps

        def substep(i, carry):
            q, p, lp, grad = carry
            if friction_schedule is not None:
                gamma_t = friction_schedule(i.astype(jnp.float32) * eps,
                                            total_time, gamma_max, steepness)
                scale = jnp.exp(-gamma_t * half_eps)
                p = p * scale
            p = p + half_eps * grad
            q = q + eps * (p * invm)
            lp, grad = padded_vag(q)
            p = p + half_eps * grad
            if friction_schedule is not None:
                p = p * scale
            return (q, p, lp, grad)

        q1, p1, lp1, grad1 = lax.fori_loop(
            0, num_steps, substep, (q0, p0, lp0, grad0))

        p1 = -p1
        kin1 = 0.5 * jnp.sum(p1 * p1 * invm, axis=1, keepdims=True)
        h1 = -lp1 + kin1
        h1 = jnp.where(jnp.isfinite(h1), h1, ENERGY_OVERFLOW)

        log_alpha = h0 - h1
        dh = h1 - h0

        if inject_randoms:
            u = u_ref[:]
        else:
            u = _bits_to_uniform(pltpu.prng_random_bits(h0.shape))
        accept = jnp.log(u) < jnp.minimum(0.0, log_alpha)   # (C, 1)

        q_out[:] = jnp.where(accept, q1, q0)
        lp_out[:] = jnp.where(accept, lp1, lp0)
        grad_out[:] = jnp.where(accept, grad1, grad0)
        acc_out[:] = accept.astype(jnp.float32)
        dh_out[:] = dh

    return kernel


def _build_call(padded_vag, num_steps, friction_schedule, n_chains, d_pad,
                chain_tile, inject_randoms, interpret):
    kernel = _make_kernel(padded_vag, num_steps, friction_schedule,
                          inject_randoms)
    grid = (n_chains // chain_tile,)

    def row_spec(width):
        return pl.BlockSpec((chain_tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def bcast_spec(width):
        return pl.BlockSpec((1, width), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars (3,)
        row_spec(d_pad),                          # q
        row_spec(1),                              # lp
        row_spec(d_pad),                          # grad
        bcast_spec(d_pad),                        # inv_mass
        bcast_spec(d_pad),                        # mask
    ]
    if inject_randoms:
        in_specs += [row_spec(d_pad), row_spec(1)]   # p0, u

    out_shape = [
        jax.ShapeDtypeStruct((n_chains, d_pad), jnp.float32),  # q
        jax.ShapeDtypeStruct((n_chains, 1), jnp.float32),      # lp
        jax.ShapeDtypeStruct((n_chains, d_pad), jnp.float32),  # grad
        jax.ShapeDtypeStruct((n_chains, 1), jnp.float32),      # accept
        jax.ShapeDtypeStruct((n_chains, 1), jnp.float32),      # delta_h
    ]
    out_specs = [row_spec(d_pad), row_spec(1), row_spec(d_pad),
                 row_spec(1), row_spec(1)]

    if interpret and not inject_randoms:
        # The generic HLO interpreter lacks the TPU PRNG primitives; use the
        # TPU-semantics interpreter for kernels with on-chip RNG.
        interpret = pltpu.InterpretParams()
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


def make_fused_grahmc_step(
    log_prob_fn,
    value_and_grad_fn,
    num_steps: int,
    friction_schedule: Optional[Callable],
    chain_tile: int = 512,
    interpret: Optional[bool] = None,
):
    """Build a fused-step function with the grahmc_step calling convention:

        fused(key, state, step_size, gamma, steepness, inv_mass_matrix)
          -> (key, new_state, (accept, q_prop, lp_prop, delta_h))

    Requires a target with analytic pallas_info metadata
    (mcmc_tpu.targets factories). interpret=None auto-selects interpreter
    mode off-TPU so the same code runs in CPU tests.
    """
    if value_and_grad_fn is None:
        raise TypeError("the Pallas backend requires an analytic "
                        "value_and_grad_fn from mcmc_tpu.targets")
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    # The TPU interpreter stubs prng_random_bits with zeros, so off-TPU the
    # kernel runs with host-generated (threefry) randomness injected instead
    # of on-chip RNG. Same kernel body, same physics.
    onchip_rng = on_tpu and not interpret

    call_cache = {}

    def fused(key, state, step_size, gamma, steepness, inv_mass_matrix):
        n_chains, dim = state.position.shape
        d_pad = _round_up(dim, LANE)
        tile = min(chain_tile, n_chains)
        while n_chains % tile:
            tile //= 2
        tile = max(tile, 1)

        cache_key = (n_chains, dim, tile)
        if cache_key not in call_cache:
            padded_vag = make_padded_vag(value_and_grad_fn, d_pad)
            call_cache[cache_key] = _build_call(
                padded_vag, num_steps, friction_schedule, n_chains, d_pad,
                tile, inject_randoms=not onchip_rng, interpret=interpret)
        call = call_cache[cache_key]

        key, seed_key = random.split(key)
        seed = random.randint(seed_key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
        scalars = jnp.stack([
            jnp.asarray(step_size, jnp.float32),
            jnp.asarray(gamma, jnp.float32),
            jnp.asarray(steepness, jnp.float32),
        ])

        pad = d_pad - dim
        q = jnp.pad(state.position.astype(jnp.float32), ((0, 0), (0, pad)))
        grad = jnp.pad(state.grad_log_prob.astype(jnp.float32),
                       ((0, 0), (0, pad)))
        lp = state.log_prob.astype(jnp.float32)[:, None]
        invm = jnp.pad(jnp.asarray(inv_mass_matrix, jnp.float32),
                       (0, pad), constant_values=1.0)[None, :]
        mask = _mask_row(dim, d_pad)

        if onchip_rng:
            q1, lp1, grad1, acc, dh = call(seed, scalars, q, lp, grad, invm,
                                           mask)
        else:
            k_mom, k_u = random.split(seed_key)
            p0 = (random.normal(k_mom, (n_chains, d_pad), dtype=jnp.float32)
                  / jnp.sqrt(invm))
            u = random.uniform(k_u, (n_chains, 1), dtype=jnp.float32)
            q1, lp1, grad1, acc, dh = call(seed, scalars, q, lp, grad, invm,
                                           mask, p0, u)

        accept = acc[:, 0] > 0.5
        dh_flat = dh[:, 0]
        divergent = jnp.abs(dh_flat) > DIVERGENCE_DELTA_H

        pos_dtype = state.position.dtype
        e_dtype = state.log_prob.dtype
        new_state = state._replace(
            position=q1[:, :dim].astype(pos_dtype),
            log_prob=lp1[:, 0].astype(e_dtype),
            grad_log_prob=grad1[:, :dim].astype(pos_dtype),
            accept_count=state.accept_count + accept.astype(jnp.int32),
            divergence_count=state.divergence_count + divergent.astype(jnp.int32),
        )
        # Proposal extras mirror grahmc_step: on reject the proposal equals the
        # trajectory endpoint, which the fused kernel does not export
        # separately; the post-accept state is returned instead (sufficient
        # for ESJD, which weights jumps by the accept probability).
        return key, new_state, (accept, new_state.position,
                                new_state.log_prob,
                                dh_flat.astype(e_dtype))

    return fused


def make_debug_trajectory(value_and_grad_fn, num_steps: int,
                          friction_schedule: Optional[Callable],
                          n_chains: int, dim: int,
                          interpret: Optional[bool] = None):
    """Deterministic fused transition with injectable momentum/uniforms.

    Returns run(q, lp, grad, p0, u, step_size, gamma, steepness, inv_mass)
    -> (q', lp', grad', accept, delta_h) for bit-level comparison against the
    XLA trajectory in tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d_pad = _round_up(dim, LANE)
    tile = n_chains
    padded_vag = make_padded_vag(value_and_grad_fn, d_pad)
    call = _build_call(padded_vag, num_steps, friction_schedule, n_chains,
                       d_pad, tile, inject_randoms=True, interpret=interpret)

    def run(q, lp, grad, p0, u, step_size, gamma, steepness, inv_mass):
        pad = d_pad - dim
        scalars = jnp.stack([jnp.asarray(step_size, jnp.float32),
                             jnp.asarray(gamma, jnp.float32),
                             jnp.asarray(steepness, jnp.float32)])
        seed = jnp.zeros((1,), jnp.int32)
        qp = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, pad)))
        gp = jnp.pad(grad.astype(jnp.float32), ((0, 0), (0, pad)))
        pp = jnp.pad(p0.astype(jnp.float32), ((0, 0), (0, pad)))
        lpp = lp.astype(jnp.float32)[:, None]
        up = u.astype(jnp.float32)[:, None]
        invm = jnp.pad(jnp.asarray(inv_mass, jnp.float32), (0, pad),
                       constant_values=1.0)[None, :]
        mask = _mask_row(dim, d_pad)
        q1, lp1, grad1, acc, dh = call(seed, scalars, qp, lpp, gp, invm, mask,
                                       pp, up)
        return (q1[:, :dim], lp1[:, 0], grad1[:, :dim], acc[:, 0] > 0.5,
                dh[:, 0])

    return run
