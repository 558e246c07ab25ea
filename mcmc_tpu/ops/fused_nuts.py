"""Fused persistent-NUTS window as a single Pallas TPU kernel.

The persistent (asynchronous) NUTS state machine
(`mcmc_tpu/samplers/nuts_persistent.py`) advances every chain by exactly one
masked leapfrog per global iteration. As pure XLA, each iteration streams the
whole carry — thirteen (C, D) arrays plus the per-chain scalar rows — through
HBM, which bounds it at ~220M useful grads/s (BASELINE.md round 2): the
machine is memory-bound, not compute-bound.

This kernel holds the ENTIRE state machine for a tile of chains in VMEM and
runs `n_iters` iterations (one snapshot window) per kernel call, so HBM sees
the state once per window instead of once per leapfrog — a ~`n_iters`-fold
traffic reduction. Randomness (momentum refresh, direction bits, proposal-swap
and slice uniforms) is generated on-chip per iteration (Box-Muller over
`pltpu.prng_random_bits`), seeded from the window's PRNG key exactly like the
fused GRAHMC kernel (`ops/fused_trajectory.py`).

Layout: transposed blocks (d_pad8, chain_tile) — chains on the 128-wide lane
axis, dim padded only to the 8-sublane granule (the right choice for the
small-dim targets this framework samples; see ops/padded_targets.py).

Semantics are iteration-for-iteration identical to
`nuts_persistent._make_window_step` (which itself preserves the reference
transition semantics, /root/reference/samplers/NUTS.py:201-396): fresh-start
init, one masked leapfrog, subtree-boundary endpoint-validity proposal swap,
U-turn/depth/divergence termination. Verified by an injected-randomness parity
test against the XLA step (tests/test_nuts_persistent.py).

All counters (n_valid, depth, steps_left, transitions, ...) are carried as
float32 rows: every value they take is a small integer (< 2^15 << 2^24), so
f32 arithmetic on them is exact, and it avoids int-vector ops in Mosaic.
Subtree sizes are tracked incrementally (doubling a row) rather than via
exp2(depth), which need not be exact in f32.
"""

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax, random
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcmc_tpu.ops.fused_trajectory import (_bits_to_uniform, _gaussian,
                                           _metric_ops, _resolve_dense_metric,
                                           seed_words_from_key, unwhiten_op)
from mcmc_tpu.ops.memo import memoize_on_target
from mcmc_tpu.ops.padded_targets import make_padded_vag, _mask_row

SUBLANE = 8
ROWS = 24  # 20 live rows (R_LP..R_K_RES) padded to whole sublane granules

# row indices in the packed (ROWS, C) per-chain scalar block
R_LP, R_LP_PROP, R_H0, R_LOG_U, R_SUM_ALPHA, R_N_VALID, R_N_STEPS, R_DEPTH, \
    R_STEPS_LEFT, R_DIRECTION, R_DIVERGED, R_NEEDS_START, R_TRANSITIONS, \
    R_DIVERGENCES, R_ALPHA_ACC, R_DEPTH_ACC, R_SUBTREE, R_EXEC, \
    R_LP_RES, R_K_RES = range(20)
N_LIVE_ROWS = 20
N_FULL = 14  # position-like (d_pad, C) state arrays

_FULL_FIELDS = ("q", "grad", "q_l", "p_l", "g_l", "q_r", "p_r", "g_r",
                "q_prop", "g_prop", "q_c", "p_c", "g_c", "q_res")


class TState(NamedTuple):
    """Persistent-NUTS machine state in kernel layout.

    14 transposed/padded (d_pad, C) float32 position-like arrays + one
    (ROWS, C) float32 block of per-chain scalar rows (indices R_*).
    """
    q: jnp.ndarray
    grad: jnp.ndarray
    q_l: jnp.ndarray
    p_l: jnp.ndarray
    g_l: jnp.ndarray
    q_r: jnp.ndarray
    p_r: jnp.ndarray
    g_r: jnp.ndarray
    q_prop: jnp.ndarray
    g_prop: jnp.ndarray
    q_c: jnp.ndarray
    p_c: jnp.ndarray
    g_c: jnp.ndarray
    q_res: jnp.ndarray
    rows: jnp.ndarray


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def pack_state(position, log_prob, grad, d_pad):
    """Fresh kernel-layout state from (C, D) f32 position/grad + (C,) lp."""
    C, D = position.shape
    pad = d_pad - D

    def t(x):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad))).T

    q = t(position)
    g = t(grad)
    z = jnp.zeros_like(q)
    rows = jnp.zeros((ROWS, C), jnp.float32)
    rows = rows.at[R_LP].set(log_prob.astype(jnp.float32))
    rows = rows.at[R_LP_PROP].set(log_prob.astype(jnp.float32))
    rows = rows.at[R_DIRECTION].set(1.0)
    rows = rows.at[R_NEEDS_START].set(1.0)
    rows = rows.at[R_SUBTREE].set(1.0)
    rows = rows.at[R_LP_RES].set(log_prob.astype(jnp.float32))
    return TState(q=q, grad=g, q_l=q, p_l=z, g_l=g, q_r=q, p_r=z, g_r=g,
                  q_prop=q, g_prop=g, q_c=q, p_c=z, g_c=g, q_res=q,
                  rows=rows)


def _make_kernel(padded_vag: Callable, n_iters: int, max_tree_depth: int,
                 inject_randoms: bool, n_data_refs: int,
                 steps_per_iter: int = 1, dense: bool = False):
    """Kernel body. Ref order:
    seed(SMEM int32[2]), scalars(SMEM f32[2]: step_size, delta_max),
    N_FULL (=14, _FULL_FIELDS) full arrays, rows, inv_mass, mask
    [, unwhiten if dense] [, data...]
    [, p0_all, dir_all, dir2_all, swap_all, slice_all, res_all
       if inject_randoms]
    -> N_FULL full arrays out, rows out (all aliased to their inputs).

    With dense=True, inv_mass is the whole (d_pad, d_pad) block-diagonal
    M^{-1}, velocity/kinetic are in-VMEM MXU matmuls, and the momentum
    refresh unwhitens the normal rows with the L^{-T} factor (one matmul;
    same form as the XLA machine's dense unwhiten, so injected-randomness
    parity holds). The U-turn test is the raw-momentum dq.p — metric-free —
    so the termination logic is untouched.

    steps_per_iter (W): leapfrog slots executed per machine iteration. The
    expensive bookkeeping (fresh-start seeding, boundary stores, proposal
    swap, U-turn/termination) runs once per ITERATION, amortized over up to
    W leapfrogs. Slot 0 is always live (every chain has steps_left >= 1
    after the start section); slots 1..W-1 are masked off for chains whose
    subtree completed earlier in the unroll, so per-chain trajectories are
    IDENTICAL to the W=1 machine — W only changes how many leapfrogs happen
    between bookkeeping passes, never where subtree boundaries fall.
    Since ~97%% of leapfrogs occur inside subtrees of size >= 2 (mean tree
    depth ~4 on tuned runs), slot waste is small for W in {2,4}.
    """

    def kernel(seed_ref, scal_ref, *refs):
        full_in = refs[:N_FULL]
        rows_ref = refs[N_FULL]
        invm_ref, mask_ref = refs[N_FULL + 1], refs[N_FULL + 2]
        rest = refs[N_FULL + 3:]
        if dense:
            unwhiten_ref, rest = rest[0], rest[1:]
        data_vals = tuple(r[:] for r in rest[:n_data_refs])
        rest = rest[n_data_refs:]
        if data_vals:
            base_vag = padded_vag

            def vag(qq):
                return base_vag(qq, *data_vals)
        else:
            vag = padded_vag
        if inject_randoms:
            (p0_ref, dir_ref, dir2_ref, swap_ref, slice_ref,
             res_ref) = rest[:6]
            rest = rest[6:]
        else:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 7919,
                            seed_ref[1])
        full_out = rest[:N_FULL]
        rows_out = rest[N_FULL]

        eps0 = scal_ref[0]
        delta_max = scal_ref[1]
        invm = invm_ref[:]   # diag: (d_pad, 1), padding 1.0; dense: (d, d)
        mask = mask_ref[:]          # (d_pad, 1)
        vel, kin = _metric_ops(invm, dense, ax=0)
        if dense:
            unwhiten = unwhiten_ref[:]
        else:
            inv_sqrt_m = 1.0 / jnp.sqrt(invm)

        full0 = tuple(r[:] for r in full_in)
        rows0 = rows_ref[:]
        row_carry0 = tuple(rows0[i:i + 1, :] for i in range(N_LIVE_ROWS))

        def body(i, carry):
            (q, grad, q_l, p_l, g_l, q_r, p_r, g_r, q_prop, g_prop,
             q_c, p_c, g_c, q_res) = carry[:N_FULL]
            (lp, lp_prop, h0, log_u, sum_alpha, n_valid, n_steps, depth,
             steps_left, direction, diverged, needs_start, transitions,
             divergences, alpha_acc, depth_acc, subtree, exec_acc,
             lp_res, k_res) = carry[N_FULL:]

            row_shape = lp.shape
            if inject_randoms:
                p0_row = jnp.reshape(p0_ref[pl.ds(i, 1), :, :], q.shape)
                dir_bit = dir_ref[pl.ds(i, 1), :] > 0.5
                dir2_bit = dir2_ref[pl.ds(i, 1), :] > 0.5
                swap_u = swap_ref[pl.ds(i, 1), :]
                slice_u = slice_ref[pl.ds(i, 1), :]
                res_u = res_ref[pl.ds(i, 1), :]
            else:
                p0_row = _gaussian(q.shape)
                dir_bit = _bits_to_uniform(
                    pltpu.prng_random_bits(row_shape)) < 0.5
                dir2_bit = _bits_to_uniform(
                    pltpu.prng_random_bits(row_shape)) < 0.5
                swap_u = _bits_to_uniform(pltpu.prng_random_bits(row_shape))
                slice_u = _bits_to_uniform(pltpu.prng_random_bits(row_shape))
                res_u = _bits_to_uniform(pltpu.prng_random_bits(row_shape))

            # --- 1. fresh-transition init (chains flagged needs_start) ----
            st = needs_start > 0.5
            if dense:
                p0 = unwhiten_op(unwhiten, 0)(p0_row) * mask
            else:
                p0 = p0_row * inv_sqrt_m * mask
            h0_new = -lp + kin(p0)
            log_u_new = jnp.log(slice_u) - h0_new
            dir_new = jnp.where(dir_bit, 1.0, -1.0)

            q_l = jnp.where(st, q, q_l)
            p_l = jnp.where(st, p0, p_l)
            g_l = jnp.where(st, grad, g_l)
            q_r = jnp.where(st, q, q_r)
            p_r = jnp.where(st, p0, p_r)
            g_r = jnp.where(st, grad, g_r)
            q_prop = jnp.where(st, q, q_prop)
            lp_prop = jnp.where(st, lp, lp_prop)
            g_prop = jnp.where(st, grad, g_prop)
            q_c = jnp.where(st, q, q_c)
            p_c = jnp.where(st, p0, p_c)
            g_c = jnp.where(st, grad, g_c)
            h0 = jnp.where(st, h0_new, h0)
            log_u = jnp.where(st, log_u_new, log_u)
            n_valid = jnp.where(st, 1.0, n_valid)
            sum_alpha = jnp.where(st, 0.0, sum_alpha)
            n_steps = jnp.where(st, 0.0, n_steps)
            depth = jnp.where(st, 0.0, depth)
            steps_left = jnp.where(st, 1.0, steps_left)
            subtree = jnp.where(st, 1.0, subtree)
            direction = jnp.where(st, dir_new, direction)
            diverged = jnp.where(st, 0.0, diverged)

            # --- 2. W leapfrog slots for every chain -----------------------
            # slot 0 is always live; later slots freeze chains whose subtree
            # completed earlier in the unroll (steps_left == 0).
            eps = direction * eps0                      # (1, C)
            lp_c = lp
            h_c = h0
            for k in range(steps_per_iter):
                p = p_c + 0.5 * eps * g_c
                qn = q_c + eps * vel(p)
                lp_n, grad_n = vag(qn)
                p = p + 0.5 * eps * grad_n
                h = -lp_n + kin(p)
                alpha = jnp.exp(jnp.minimum(0.0, h0 - h))
                if k == 0:
                    q_c, p_c, g_c = qn, p, grad_n
                    lp_c, h_c = lp_n, h
                    sum_alpha = sum_alpha + alpha
                    n_steps = n_steps + 1.0
                    exec_acc = exec_acc + 1.0
                    steps_left = steps_left - 1.0
                else:
                    m = steps_left > 0.0
                    q_c = jnp.where(m, qn, q_c)
                    p_c = jnp.where(m, p, p_c)
                    g_c = jnp.where(m, grad_n, g_c)
                    lp_c = jnp.where(m, lp_n, lp_c)
                    h_c = jnp.where(m, h, h_c)
                    mf = m.astype(jnp.float32)
                    sum_alpha = sum_alpha + jnp.where(m, alpha, 0.0)
                    n_steps = n_steps + mf
                    exec_acc = exec_acc + mf
                    steps_left = steps_left - mf

            # --- 3. subtree-boundary bookkeeping ----------------------------
            bd = steps_left <= 0.0
            in_slice = log_u <= -h_c
            div_new = (h_c - h0) > delta_max
            valid = bd & in_slice & ~div_new
            go_right = direction > 0.0

            q_l = jnp.where(bd & ~go_right, q_c, q_l)
            p_l = jnp.where(bd & ~go_right, p_c, p_l)
            g_l = jnp.where(bd & ~go_right, g_c, g_l)
            q_r = jnp.where(bd & go_right, q_c, q_r)
            p_r = jnp.where(bd & go_right, p_c, p_r)
            g_r = jnp.where(bd & go_right, g_c, g_r)

            # endpoint-validity proposal swap (reference NUTS.py:319-336)
            n_new = jnp.where(valid, subtree, 0.0)
            total = n_valid + jnp.where(bd, n_new, 0.0)
            swap_prob = jnp.where(valid & (total > 0.0),
                                  n_new / jnp.maximum(total, 1.0), 0.0)
            take = bd & (swap_u < swap_prob)
            q_prop = jnp.where(take, q_c, q_prop)
            lp_prop = jnp.where(take, lp_c, lp_prop)
            g_prop = jnp.where(take, g_c, g_prop)
            n_valid = total
            diverged = jnp.maximum(diverged, (bd & div_new).astype(jnp.float32))

            # termination (evaluated after the doubling, reference while cond)
            dq = q_r - q_l
            u_turn = ((jnp.sum(dq * p_l, axis=0, keepdims=True) < 0.0)
                      | (jnp.sum(dq * p_r, axis=0, keepdims=True) < 0.0))
            div_b = diverged > 0.5
            term = bd & ((depth + 1.0 >= float(max_tree_depth)) | u_turn
                         | div_b)
            cont = bd & ~term

            mean_alpha = sum_alpha / jnp.maximum(n_steps, 1.0)
            mean_alpha = jnp.where(jnp.isfinite(mean_alpha), mean_alpha, 0.65)
            q = jnp.where(term, q_prop, q)
            lp = jnp.where(term, lp_prop, lp)
            grad = jnp.where(term, g_prop, grad)
            tf = term.astype(jnp.float32)
            transitions = transitions + tf
            divergences = divergences + tf * diverged
            alpha_acc = alpha_acc + tf * mean_alpha
            depth_acc = depth_acc + tf * (depth + 1.0)
            needs_start = tf
            # snapshot reservoir: k-th completion of the window replaces the
            # reservoir w.p. 1/k — a uniform draw over the window's completed
            # transitions (k_res counts are small integers, exact in f32)
            k_res = k_res + tf
            take_res = term & (res_u * k_res < 1.0)
            q_res = jnp.where(take_res, q_prop, q_res)
            lp_res = jnp.where(take_res, lp_prop, lp_res)

            # trajectory continues: next doubling from the chosen end
            new_dir = jnp.where(dir2_bit, 1.0, -1.0)
            new_subtree = subtree * 2.0
            nxt_right = cont & (new_dir > 0.0)
            nxt_left = cont & (new_dir <= 0.0)
            depth = jnp.where(cont, depth + 1.0, depth)
            subtree = jnp.where(cont, new_subtree, subtree)
            steps_left = jnp.where(cont, new_subtree, steps_left)
            direction = jnp.where(cont, new_dir, direction)
            q_c = jnp.where(nxt_right, q_r, jnp.where(nxt_left, q_l, q_c))
            p_c = jnp.where(nxt_right, p_r, jnp.where(nxt_left, p_l, p_c))
            g_c = jnp.where(nxt_right, g_r, jnp.where(nxt_left, g_l, g_c))

            return (q, grad, q_l, p_l, g_l, q_r, p_r, g_r, q_prop, g_prop,
                    q_c, p_c, g_c, q_res, lp, lp_prop, h0, log_u, sum_alpha,
                    n_valid, n_steps, depth, steps_left, direction, diverged,
                    needs_start, transitions, divergences, alpha_acc,
                    depth_acc, subtree, exec_acc, lp_res, k_res)

        out = lax.fori_loop(0, n_iters, body, full0 + row_carry0)
        for ref, val in zip(full_out, out[:N_FULL]):
            ref[:] = val
        pad_rows = jnp.zeros((ROWS - N_LIVE_ROWS,) + out[N_FULL].shape[1:],
                             jnp.float32)
        rows_out[:] = jnp.concatenate(list(out[N_FULL:]) + [pad_rows], axis=0)

    return kernel


def _build_call(padded_vag, n_iters, max_tree_depth, n_chains, d_pad,
                chain_tile, inject_randoms, interpret, steps_per_iter=1,
                dense=False):
    n_data_refs = len(getattr(padded_vag, "data_arrays", ()))
    kernel = _make_kernel(padded_vag, n_iters, max_tree_depth,
                          inject_randoms, n_data_refs, steps_per_iter,
                          dense=dense)
    grid = (n_chains // chain_tile,)

    full = pl.BlockSpec((d_pad, chain_tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((ROWS, chain_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    bcast = pl.BlockSpec((d_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    matrix_spec = pl.BlockSpec((d_pad, d_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)

    in_specs = ([full] * N_FULL
                + [rows_spec, matrix_spec if dense else bcast, bcast])
    if dense:
        in_specs.append(matrix_spec)              # unwhiten (L^{-T})
    for arr in getattr(padded_vag, "data_arrays", ()):
        in_specs.append(pl.BlockSpec(
            arr.shape, lambda i, _rank=len(arr.shape): (0,) * _rank,
            memory_space=pltpu.VMEM))
    if inject_randoms:
        in_specs += [
            pl.BlockSpec((n_iters, d_pad, chain_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((n_iters, chain_tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM)] * 5

    out_shape = ([jax.ShapeDtypeStruct((d_pad, n_chains), jnp.float32)]
                 * N_FULL
                 + [jax.ShapeDtypeStruct((ROWS, n_chains), jnp.float32)])
    out_specs = [full] * N_FULL + [rows_spec]
    # state arrays update in place: input k (after the 2 SMEM prefix args,
    # which do not count) aliases output k
    aliases = {k: k for k in range(N_FULL + 1)}

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={k + 2: v for k, v in aliases.items()},
        interpret=interpret,
    )


@memoize_on_target
def make_fused_nuts_window(
    value_and_grad_fn,
    n_iters: int,
    max_tree_depth: int,
    n_chains: int,
    dim: int,
    delta_max: float = 1000.0,
    chain_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    steps_per_iter: int = 1,
    dense: bool = False,
):
    """Build window(key, tstate, step_size, inv_mass_matrix) -> tstate:
    `n_iters` persistent-NUTS machine iterations (each executing up to
    `steps_per_iter` leapfrog slots) for every chain, fused in VMEM.

    Requires a target with analytic pallas_info metadata (mcmc_tpu.targets).
    Off-TPU the kernel runs in interpreter mode with host-generated
    (threefry) randomness injected — same kernel body, same physics — since
    the interpreter stubs the on-chip PRNG.

    dense=True builds the kernel for a (dim, dim) inv_mass_matrix
    (VMEM-resident M^{-1} + L^{-T} matmuls); the window then expects a
    dense metric at every call.
    """
    if value_and_grad_fn is None:
        raise TypeError("the fused NUTS window requires an analytic "
                        "value_and_grad_fn from mcmc_tpu.targets")
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    onchip_rng = on_tpu and not interpret

    d_pad = _round_up(dim, SUBLANE)
    padded_vag = make_padded_vag(value_and_grad_fn, d_pad, dim_axis=0)
    data_arrays = tuple(getattr(padded_vag, "data_arrays", ()))
    tile = chain_tile or 256   # measured optimum on v5e (229M leapfrogs/s
    # at 4096 chains x 50D funnel; 512 -> 223M; >=1024 exceeds scoped VMEM)
    tile = min(tile, n_chains)
    while n_chains % tile:
        tile //= 2
    tile = max(tile, 1)
    call = _build_call(padded_vag, n_iters, max_tree_depth, n_chains, d_pad,
                       tile, inject_randoms=not onchip_rng,
                       interpret=interpret, steps_per_iter=steps_per_iter,
                       dense=dense)
    mask = _mask_row(dim, d_pad, dim_axis=0)

    def window(key, ts: TState, step_size, inv_mass_matrix):
        scalars = jnp.stack([jnp.asarray(step_size, jnp.float32),
                             jnp.asarray(delta_max, jnp.float32)])
        seed = seed_words_from_key(key)
        if dense:
            invm, unwhiten = _resolve_dense_metric(inv_mass_matrix, dim,
                                                   d_pad, dim_axis=0)
            metric_args = (invm, mask, unwhiten)
        else:
            invm = jnp.pad(jnp.asarray(inv_mass_matrix, jnp.float32),
                           (0, d_pad - dim), constant_values=1.0)[:, None]
            metric_args = (invm, mask)
        args = tuple(getattr(ts, f) for f in _FULL_FIELDS) + (
            ts.rows,) + metric_args + data_arrays
        if not onchip_rng:
            kp, kd, kd2, ks, ku, kr = random.split(key, 6)
            p0 = random.normal(kp, (n_iters, d_pad, n_chains), jnp.float32)
            dirs = random.bernoulli(kd, 0.5, (n_iters, n_chains)
                                    ).astype(jnp.float32)
            dirs2 = random.bernoulli(kd2, 0.5, (n_iters, n_chains)
                                     ).astype(jnp.float32)
            swaps = random.uniform(ks, (n_iters, n_chains), jnp.float32)
            slices = random.uniform(ku, (n_iters, n_chains), jnp.float32,
                                    minval=jnp.finfo(jnp.float32).tiny)
            ress = random.uniform(kr, (n_iters, n_chains), jnp.float32)
            args = args + (p0, dirs, dirs2, swaps, slices, ress)
        outs = call(seed, scalars, *args)
        return TState(*outs)

    return window
