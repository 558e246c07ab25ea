"""Fused multi-transition RWMH as a single Pallas TPU kernel.

The XLA-scan RWMH step (samplers/rwmh.py, parity with reference
samplers/RWMH.py:31-66) is a handful of elementwise ops plus one target
evaluation — at high chain counts its cost is dominated by per-step HBM
round-trips of the chain state and kernel-dispatch glue, not arithmetic.
This kernel runs T full Metropolis transitions per call with the chain state
(q, lp) resident in VMEM:

  on-chip proposal noise (Box-Muller PRNG)
  -> x' = x + scale * eps
  -> analytic target log-prob inlined (ops/padded_targets.py; the padded
     specializations return (lp, grad) and the unused gradient is dead-code
     eliminated by the Mosaic compiler, so RWMH pays for lp only)
  -> MH accept and state select, T times

Transposed block layout only — (d_pad8, chains_tile), chains on lanes — which
is the layout `choose_layout` picks for every dim below ~115; callers fall
back to the XLA scan otherwise. Per-transition position/log-prob history is
written so the host harness collects the same (S, C, D) history as the XLA
path.

RWMH has no Hamiltonian, so there is no divergence counting here, matching
the XLA path (and the reference, which tracks none for RWMH).
"""

from typing import Callable, Optional


import jax
import jax.numpy as jnp
from jax import lax, random
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmc_tpu.ops.fused_trajectory import (
    SUBLANE, _bits_to_uniform, _gaussian, _round_up, select_chain_tile,
    seed_words_from_key,
)
from mcmc_tpu.ops.memo import memoize_on_target
from mcmc_tpu.ops.padded_targets import _mask_row, make_padded_vag


def _make_rwmh_kernel(padded_vag: Callable, transitions: int,
                      inject_randoms: bool):
    """T RWMH transitions per kernel call, transposed layout.

    Ref order: seed(SMEM), scalars(SMEM: scale), q, lp, mask [, data...]
    [, noise_all (T,d_pad,C), u_all (T,C) if inject_randoms]
    -> q, lp (aliased), acc (T,C), hist_q (T,d_pad,C), hist_lp (T,C).
    """
    n_data_refs = len(getattr(padded_vag, "data_arrays", ()))

    def kernel(seed_ref, scal_ref, q_ref, lp_ref, mask_ref, *rest):
        data_vals = tuple(r[:] for r in rest[:n_data_refs])
        rest = rest[n_data_refs:]
        if data_vals:
            base_vag = padded_vag

            def vag(qq):
                return base_vag(qq, *data_vals)
        else:
            vag = padded_vag
        if inject_randoms:
            (noise_ref, u_ref, q_out, lp_out, acc_out,
             hist_q_out, hist_lp_out) = rest
        else:
            (q_out, lp_out, acc_out, hist_q_out, hist_lp_out) = rest
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 7919,
                            seed_ref[1])

        scale = scal_ref[0]
        mask = mask_ref[:]

        def transition(t, carry):
            q0, lp0 = carry
            if inject_randoms:
                noise = jnp.reshape(noise_ref[pl.ds(t, 1), :, :], q0.shape)
                u = u_ref[pl.ds(t, 1), :]
            else:
                noise = _gaussian(q0.shape)
                u = _bits_to_uniform(pltpu.prng_random_bits(lp0.shape))

            prop = q0 + scale * noise * mask   # padding rows stay exactly 0
            lp1, _unused_grad = vag(prop)      # grad DCE'd by Mosaic
            accept = jnp.log(u) < jnp.minimum(0.0, lp1 - lp0)

            q0 = jnp.where(accept, prop, q0)
            lp0 = jnp.where(accept, lp1, lp0)
            acc_out[pl.ds(t, 1), :] = accept.astype(jnp.float32)
            hist_q_out[pl.ds(t, 1), :, :] = q0[None]
            hist_lp_out[pl.ds(t, 1), :] = lp0
            return (q0, lp0)

        q, lp = lax.fori_loop(0, transitions, transition,
                              (q_ref[:], lp_ref[:]))
        q_out[:] = q
        lp_out[:] = lp

    return kernel


@memoize_on_target
def make_fused_rwmh_multistep(
    log_prob_fn,
    value_and_grad_fn,
    transitions: int,
    chain_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Build multi(key, state, scale) -> (key, new_state, (accept (T,C),
    hist_q (T,C,dim), hist_lp (T,C))) running T RWMH transitions per call.

    `value_and_grad_fn` must carry `pallas_info` (mcmc_tpu.targets) — it is
    used only to build the padded analytic log-prob; RWMH never touches the
    gradient.
    """
    if value_and_grad_fn is None:
        raise TypeError("the Pallas RWMH backend requires a tagged "
                        "value_and_grad_fn from mcmc_tpu.targets")
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    onchip_rng = on_tpu and not interpret
    call_cache = {}
    vag_cache = {}

    def multi(key, state, scale):
        n_chains, dim = state.position.shape
        d_pad = _round_up(dim, SUBLANE)
        if dim not in vag_cache:
            vag_cache[dim] = make_padded_vag(value_and_grad_fn, d_pad,
                                             dim_axis=0)
        padded_vag = vag_cache[dim]
        has_data = bool(getattr(padded_vag, "data_arrays", ()))
        tile = select_chain_tile(n_chains, d_pad, transitions, chain_tile,
                                 has_data)

        cache_key = (n_chains, dim, tile)
        if cache_key not in call_cache:
            kernel = _make_rwmh_kernel(padded_vag, transitions,
                                       inject_randoms=not onchip_rng)
            grid = (n_chains // tile,)
            full = pl.BlockSpec((d_pad, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
            row = pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
            trow = pl.BlockSpec((transitions, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
            thist = pl.BlockSpec((transitions, d_pad, tile),
                                 lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)
            bcast = pl.BlockSpec((d_pad, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        full, row, bcast]
            for arr in getattr(padded_vag, "data_arrays", ()):
                in_specs.append(pl.BlockSpec(
                    arr.shape,
                    lambda i, _rank=len(arr.shape): (0,) * _rank,
                    memory_space=pltpu.VMEM))
            if not onchip_rng:
                in_specs += [thist, trow]
            out_shape = [
                jax.ShapeDtypeStruct((d_pad, n_chains), jnp.float32),
                jax.ShapeDtypeStruct((1, n_chains), jnp.float32),
                jax.ShapeDtypeStruct((transitions, n_chains), jnp.float32),
                jax.ShapeDtypeStruct((transitions, d_pad, n_chains),
                                     jnp.float32),
                jax.ShapeDtypeStruct((transitions, n_chains), jnp.float32),
            ]
            out_specs = [full, row, trow, thist, trow]
            call_cache[cache_key] = pl.pallas_call(
                kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
                out_shape=out_shape,
                input_output_aliases={2: 0, 3: 1},
                interpret=interpret)
        call = call_cache[cache_key]
        data_arrays = tuple(getattr(padded_vag, "data_arrays", ()))

        key, seed_key = random.split(key)
        seed = seed_words_from_key(seed_key)
        scalars = jnp.asarray(scale, jnp.float32)[None]
        pad = d_pad - dim
        q = jnp.pad(state.position.astype(jnp.float32),
                    ((0, 0), (0, pad))).T
        lp = state.log_prob.astype(jnp.float32)[None, :]
        mask = _mask_row(dim, d_pad, dim_axis=0)

        args = (seed, scalars, q, lp, mask) + data_arrays
        if not onchip_rng:
            k_noise, k_u = random.split(seed_key)
            noise = random.normal(k_noise, (transitions, d_pad, n_chains),
                                  jnp.float32)
            u = random.uniform(k_u, (transitions, n_chains), jnp.float32)
            args = args + (noise, u)
        q1, lp1, acc, hist_q, hist_lp = call(*args)

        pos_dtype = state.position.dtype
        e_dtype = state.log_prob.dtype
        accept = acc > 0.5                               # (T, C)
        new_state = state._replace(
            position=q1.T[:, :dim].astype(pos_dtype),
            log_prob=lp1[0].astype(e_dtype),
            accept_count=state.accept_count
            + jnp.sum(accept, axis=0).astype(jnp.int32),
        )
        extras = (accept,
                  jnp.transpose(hist_q, (0, 2, 1))[:, :, :dim].astype(
                      pos_dtype),
                  hist_lp.astype(e_dtype))
        return key, new_state, extras

    return multi
