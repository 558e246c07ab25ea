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

# multinomial proposal scheme only: 5 extra scalar rows (25 live, padded to
# 32) and 2 extra full arrays (subtree reservoir) + 2 checkpoint stacks
R_LP_SUB, R_LW_TREE, R_LW_SUB, R_DIV_SUB, R_TURN_SUB = range(20, 25)
N_LIVE_ROWS_MULTI = 25
ROWS_MULTI = 32

_FULL_FIELDS = ("q", "grad", "q_l", "p_l", "g_l", "q_r", "p_r", "g_r",
                "q_prop", "g_prop", "q_c", "p_c", "g_c", "q_res")
_FULL_FIELDS_MULTI = _FULL_FIELDS + ("q_sub", "g_sub")


class TState(NamedTuple):
    """Persistent-NUTS machine state in kernel layout.

    14 transposed/padded (d_pad, C) float32 position-like arrays + one
    (ROWS, C) float32 block of per-chain scalar rows (indices R_*).
    Under the multinomial proposal scheme the rows block is (ROWS_MULTI, C)
    and four extra arrays carry the subtree reservoir (q_sub, g_sub) and
    the iterative sub-U-turn checkpoint stacks ((S * d_pad, C), slot s at
    rows [s*d_pad, (s+1)*d_pad)).
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
    q_sub: Optional[jnp.ndarray] = None
    g_sub: Optional[jnp.ndarray] = None
    q_stk: Optional[jnp.ndarray] = None
    p_stk: Optional[jnp.ndarray] = None


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def pack_state(position, log_prob, grad, d_pad, multinomial: bool = False,
               max_tree_depth: int = 10):
    """Fresh kernel-layout state from (C, D) f32 position/grad + (C,) lp."""
    C, D = position.shape
    pad = d_pad - D

    def t(x):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad))).T

    q = t(position)
    g = t(grad)
    z = jnp.zeros_like(q)
    rows = jnp.zeros((ROWS_MULTI if multinomial else ROWS, C), jnp.float32)
    rows = rows.at[R_LP].set(log_prob.astype(jnp.float32))
    rows = rows.at[R_LP_PROP].set(log_prob.astype(jnp.float32))
    rows = rows.at[R_DIRECTION].set(1.0)
    rows = rows.at[R_NEEDS_START].set(1.0)
    rows = rows.at[R_SUBTREE].set(1.0)
    rows = rows.at[R_LP_RES].set(log_prob.astype(jnp.float32))
    extra = {}
    if multinomial:
        # needs_start=1 everywhere, so the first iteration's fresh-start
        # section overwrites every multinomial field before it is read
        rows = rows.at[R_LP_SUB].set(log_prob.astype(jnp.float32))
        stk = jnp.zeros((max_tree_depth * d_pad, C), jnp.float32)
        extra = dict(q_sub=q, g_sub=g, q_stk=stk, p_stk=stk)
    return TState(q=q, grad=g, q_l=q, p_l=z, g_l=g, q_r=q, p_r=z, g_r=g,
                  q_prop=q, g_prop=g, q_c=q, p_c=z, g_c=g, q_res=q,
                  rows=rows, **extra)


def _make_kernel(padded_vag: Callable, n_iters: int, max_tree_depth: int,
                 inject_randoms: bool, n_data_refs: int,
                 steps_per_iter: int = 1, dense: bool = False,
                 multinomial: bool = False):
    """Kernel body. Ref order:
    seed(SMEM int32[2]), scalars(SMEM f32[2]: step_size, delta_max),
    n_full (14 endpoint / 16 multinomial, _FULL_FIELDS[_MULTI]) full arrays
    [, q_stk, p_stk checkpoint stacks if multinomial], rows, inv_mass, mask
    [, unwhiten if dense] [, data...]
    [, p0_all, dir_all, dir2_all, swap_all, slice_all, res_all
       if inject_randoms]
    -> the same state arrays out (all aliased to their inputs).

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

    multinomial=True implements the Stan proposal scheme of the XLA machine
    (nuts_persistent._make_window_step's proposal_scheme='multinomial'):
    per-LEAF weighted reservoir (one uniform per SLOT — the injected slice
    stream becomes (n_iters * W, C), indexed i*W+k), biased subtree merges
    min(1, W_sub/W_tree), per-leaf divergence checks, and the iterative
    sub-U-turn checkpoint stacks (S = max_tree_depth slots of (d_pad, C)
    carried in VMEM). All counters stay f32; the leaf-index bit fields
    (parity, popcount, trailing-ones) are computed by floor/halve loops,
    exact for indices < 2^max_tree_depth << 2^24.
    """
    n_full = len(_FULL_FIELDS_MULTI) if multinomial else N_FULL
    n_live = N_LIVE_ROWS_MULTI if multinomial else N_LIVE_ROWS
    n_slots = max_tree_depth
    # a Python float, NOT jnp.float32(...): the latter is a jax Array the
    # kernel would close over ("captures constants" trace error)
    neg_inf = float("-inf")

    def _lse(a, b):
        # -inf-safe logsumexp: both -inf stays -inf (the naive
        # max + log1p(exp(min - max)) yields nan there); one -inf operand
        # reduces to the finite one via exp(-inf) = 0
        mx = jnp.maximum(a, b)
        mn = jnp.minimum(a, b)
        return jnp.where(mx == neg_inf, neg_inf,
                         mx + jnp.log1p(jnp.exp(mn - mx)))

    def kernel(seed_ref, scal_ref, *refs):
        full_in = refs[:n_full]
        q_d_pad = full_in[0].shape[0]
        rest = refs[n_full:]
        if multinomial:
            qstk_in, pstk_in = rest[0], rest[1]
            rest = rest[2:]
        rows_ref = rest[0]
        invm_ref, mask_ref = rest[1], rest[2]
        rest = rest[3:]
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
        full_out = rest[:n_full]
        rest = rest[n_full:]
        if multinomial:
            qstk_out, pstk_out = rest[0], rest[1]
            rest = rest[2:]
        rows_out = rest[0]

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
        stack_carry0 = ()
        if multinomial:
            stack_carry0 = tuple(
                qstk_in[pl.ds(s * q_d_pad, q_d_pad), :]
                for s in range(n_slots)) + tuple(
                pstk_in[pl.ds(s * q_d_pad, q_d_pad), :]
                for s in range(n_slots))
        rows0 = rows_ref[:]
        row_carry0 = tuple(rows0[i:i + 1, :] for i in range(n_live))

        def body(i, carry):
            (q, grad, q_l, p_l, g_l, q_r, p_r, g_r, q_prop, g_prop,
             q_c, p_c, g_c, q_res) = carry[:N_FULL]
            idx = N_FULL
            if multinomial:
                q_sub, g_sub = carry[idx], carry[idx + 1]
                idx += 2
                q_stks = list(carry[idx:idx + n_slots])
                p_stks = list(carry[idx + n_slots:idx + 2 * n_slots])
                idx += 2 * n_slots
            (lp, lp_prop, h0, log_u, sum_alpha, n_valid, n_steps, depth,
             steps_left, direction, diverged, needs_start, transitions,
             divergences, alpha_acc, depth_acc, subtree, exec_acc,
             lp_res, k_res) = carry[idx:idx + N_LIVE_ROWS]
            if multinomial:
                (lp_sub, lw_tree, lw_sub, div_sub,
                 turn_sub) = carry[idx + N_LIVE_ROWS:]

            row_shape = lp.shape
            if inject_randoms:
                p0_row = jnp.reshape(p0_ref[pl.ds(i, 1), :, :], q.shape)
                dir_bit = dir_ref[pl.ds(i, 1), :] > 0.5
                dir2_bit = dir2_ref[pl.ds(i, 1), :] > 0.5
                swap_u = swap_ref[pl.ds(i, 1), :]
                # multinomial consumes one slice uniform per SLOT (leaf);
                # the endpoint scheme one per iteration
                if multinomial:
                    slice_u = slice_ref[pl.ds(i * steps_per_iter, 1), :]
                else:
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
            if multinomial:
                # root tree: the initial state is its own proposal with
                # weight e^0 = 1; the subtree reservoir starts empty
                q_sub = jnp.where(st, q, q_sub)
                g_sub = jnp.where(st, grad, g_sub)
                lp_sub = jnp.where(st, lp, lp_sub)
                lw_tree = jnp.where(st, 0.0, lw_tree)
                lw_sub = jnp.where(st, neg_inf, lw_sub)
                div_sub = jnp.where(st, 0.0, div_sub)
                turn_sub = jnp.where(st, 0.0, turn_sub)

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
                    live = None                          # slot 0 always live
                    q_c, p_c, g_c = qn, p, grad_n
                    lp_c, h_c = lp_n, h
                    sum_alpha = sum_alpha + alpha
                    n_steps = n_steps + 1.0
                    exec_acc = exec_acc + 1.0
                    steps_left = steps_left - 1.0
                else:
                    live = m = steps_left > 0.0
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

                if multinomial:
                    # per-leaf weighted reservoir + sub-U-turn checkpoint
                    # stacks — mirrors nuts_persistent._make_window_step's
                    # multinomial section on the slot's leaf (qn, p, h)
                    def lv(cond):
                        return cond if live is None else (live & cond)

                    if k == 0:
                        su = slice_u
                    elif inject_randoms:
                        su = slice_ref[pl.ds(i * steps_per_iter + k, 1), :]
                    else:
                        su = _bits_to_uniform(
                            pltpu.prng_random_bits(row_shape))
                    fin_h = jnp.isfinite(h)
                    lw_leaf = jnp.where(fin_h, h0 - h, neg_inf)
                    div_leaf = (~fin_h) | ((h - h0) > delta_max)
                    lse = _lse(lw_sub, lw_leaf)
                    # lw_leaf - lse is nan when both are -inf: the < is
                    # then False, as required (no take of a dead leaf)
                    take_leaf = lv(su < jnp.exp(lw_leaf - lse))
                    q_sub = jnp.where(take_leaf, qn, q_sub)
                    g_sub = jnp.where(take_leaf, grad_n, g_sub)
                    lp_sub = jnp.where(take_leaf, lp_n, lp_sub)
                    lw_sub = lse if live is None else jnp.where(
                        live, lse, lw_sub)
                    div_sub = jnp.where(lv(div_leaf), 1.0, div_sub)

                    # leaf index within the current subtree, then its bit
                    # fields via exact f32 floor/halve loops (i < 2^S <<
                    # 2^24): parity, slot = popcount(i >> 1), t_ones =
                    # trailing ones of i (see the XLA machine's notes)
                    i_leaf = subtree - steps_left - 1.0
                    bit0 = i_leaf - 2.0 * jnp.floor(i_leaf * 0.5)
                    even = bit0 < 0.5
                    slot_f = jnp.zeros_like(i_leaf)
                    vv = jnp.floor(i_leaf * 0.5)
                    t_ones = jnp.zeros_like(i_leaf)
                    run = bit0
                    vv2 = vv
                    for _ in range(n_slots):
                        slot_f = slot_f + (vv - 2.0 * jnp.floor(vv * 0.5))
                        vv = jnp.floor(vv * 0.5)
                        t_ones = t_ones + run
                        run = run * (vv2 - 2.0 * jnp.floor(vv2 * 0.5))
                        vv2 = jnp.floor(vv2 * 0.5)

                    # even leaves STORE at stack slot popcount(i>>1); odd
                    # leaves CHECK slots [slot - t_ones + 1 .. slot] — the
                    # full recursive check set, oriented by the subtree's
                    # integration direction (spatial right-minus-left)
                    lo = slot_f - t_ones + 1.0
                    store_b = lv(even)
                    chk_b = lv(~even)
                    for si in range(n_slots):
                        sf = float(si)
                        store = store_b & (slot_f == sf)
                        q_stks[si] = jnp.where(store, qn, q_stks[si])
                        p_stks[si] = jnp.where(store, p, p_stks[si])
                        chk = chk_b & (lo <= sf) & (sf <= slot_f)
                        dq_s = (qn - q_stks[si]) * direction
                        turning = chk & (
                            (jnp.sum(dq_s * p_stks[si], axis=0,
                                     keepdims=True) < 0.0)
                            | (jnp.sum(dq_s * p, axis=0,
                                       keepdims=True) < 0.0))
                        turn_sub = jnp.where(turning, 1.0, turn_sub)

            # --- 3. subtree-boundary bookkeeping ----------------------------
            bd = steps_left <= 0.0
            go_right = direction > 0.0

            q_l = jnp.where(bd & ~go_right, q_c, q_l)
            p_l = jnp.where(bd & ~go_right, p_c, p_l)
            g_l = jnp.where(bd & ~go_right, g_c, g_l)
            q_r = jnp.where(bd & go_right, q_c, q_r)
            p_r = jnp.where(bd & go_right, p_c, p_r)
            g_r = jnp.where(bd & go_right, g_c, g_r)

            if multinomial:
                # biased progressive subtree merge (Stan): the finished
                # subtree replaces the trajectory proposal w.p.
                # min(1, W_sub/W_tree); a subtree with a divergent leaf or
                # an internal U-turn is discarded whole (no weight merge)
                turn_b = turn_sub > 0.5
                sub_ok = (bd & (div_sub < 0.5) & ~turn_b
                          & jnp.isfinite(lw_sub))
                ratio = jnp.exp(jnp.minimum(0.0, lw_sub - lw_tree))
                take = sub_ok & (swap_u < ratio)
                q_prop = jnp.where(take, q_sub, q_prop)
                lp_prop = jnp.where(take, lp_sub, lp_prop)
                g_prop = jnp.where(take, g_sub, g_prop)
                lw_tree = jnp.where(sub_ok, _lse(lw_tree, lw_sub), lw_tree)
                diverged = jnp.maximum(
                    diverged, jnp.where(bd & (div_sub > 0.5), 1.0, 0.0))
            else:
                in_slice = log_u <= -h_c
                div_new = (h_c - h0) > delta_max
                valid = bd & in_slice & ~div_new
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
                diverged = jnp.maximum(diverged,
                                       (bd & div_new).astype(jnp.float32))

            # termination (evaluated after the doubling, reference while cond)
            dq = q_r - q_l
            u_turn = ((jnp.sum(dq * p_l, axis=0, keepdims=True) < 0.0)
                      | (jnp.sum(dq * p_r, axis=0, keepdims=True) < 0.0))
            div_b = diverged > 0.5
            term_cond = ((depth + 1.0 >= float(max_tree_depth)) | u_turn
                         | div_b)
            if multinomial:
                term_cond = term_cond | turn_b   # invalid subtree: stop here
            term = bd & term_cond
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

            extra = ()
            if multinomial:
                # fresh subtree: empty weight reservoir (its first leaf
                # always replaces q_sub — stale contents never observable)
                lw_sub = jnp.where(cont, neg_inf, lw_sub)
                div_sub = jnp.where(cont, 0.0, div_sub)
                turn_sub = jnp.where(cont, 0.0, turn_sub)
                extra = ((q_sub, g_sub) + tuple(q_stks) + tuple(p_stks),
                         (lp_sub, lw_tree, lw_sub, div_sub, turn_sub))

            return (q, grad, q_l, p_l, g_l, q_r, p_r, g_r, q_prop, g_prop,
                    q_c, p_c, g_c, q_res) \
                + (extra[0] if multinomial else ()) \
                + (lp, lp_prop, h0, log_u, sum_alpha,
                   n_valid, n_steps, depth, steps_left, direction, diverged,
                   needs_start, transitions, divergences, alpha_acc,
                   depth_acc, subtree, exec_acc, lp_res, k_res) \
                + (extra[1] if multinomial else ())

        # carry order == body's unpack order: n_full full arrays (incl.
        # q_sub/g_sub when multinomial), 2S stack blocks, n_live rows
        out = lax.fori_loop(0, n_iters, body,
                            full0 + stack_carry0 + row_carry0)
        for ref, val in zip(full_out, out[:n_full]):
            ref[:] = val
        idx = n_full
        if multinomial:
            qstk_out[:] = jnp.concatenate(out[idx:idx + n_slots], axis=0)
            pstk_out[:] = jnp.concatenate(
                out[idx + n_slots:idx + 2 * n_slots], axis=0)
            idx += 2 * n_slots
        rows_total = ROWS_MULTI if multinomial else ROWS
        pad_rows = jnp.zeros((rows_total - n_live,) + out[idx].shape[1:],
                             jnp.float32)
        rows_out[:] = jnp.concatenate(list(out[idx:idx + n_live])
                                      + [pad_rows], axis=0)

    return kernel


def _build_call(padded_vag, n_iters, max_tree_depth, n_chains, d_pad,
                chain_tile, inject_randoms, interpret, steps_per_iter=1,
                dense=False, multinomial=False):
    n_data_refs = len(getattr(padded_vag, "data_arrays", ()))
    kernel = _make_kernel(padded_vag, n_iters, max_tree_depth,
                          inject_randoms, n_data_refs, steps_per_iter,
                          dense=dense, multinomial=multinomial)
    grid = (n_chains // chain_tile,)
    n_full = len(_FULL_FIELDS_MULTI) if multinomial else N_FULL
    rows_total = ROWS_MULTI if multinomial else ROWS
    stk_d = max_tree_depth * d_pad

    full = pl.BlockSpec((d_pad, chain_tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    stack_spec = pl.BlockSpec((stk_d, chain_tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((rows_total, chain_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    bcast = pl.BlockSpec((d_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    matrix_spec = pl.BlockSpec((d_pad, d_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)

    in_specs = ([full] * n_full
                + ([stack_spec, stack_spec] if multinomial else [])
                + [rows_spec, matrix_spec if dense else bcast, bcast])
    if dense:
        in_specs.append(matrix_spec)              # unwhiten (L^{-T})
    for arr in getattr(padded_vag, "data_arrays", ()):
        in_specs.append(pl.BlockSpec(
            arr.shape, lambda i, _rank=len(arr.shape): (0,) * _rank,
            memory_space=pltpu.VMEM))
    # multinomial consumes one slice uniform per slot: (n_iters * W, C)
    n_slice = n_iters * steps_per_iter if multinomial else n_iters
    if inject_randoms:
        in_specs += [
            pl.BlockSpec((n_iters, d_pad, chain_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((n_iters, chain_tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM)] * 3 \
          + [pl.BlockSpec((n_slice, chain_tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM)] \
          + [pl.BlockSpec((n_iters, chain_tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM)]

    out_shape = ([jax.ShapeDtypeStruct((d_pad, n_chains), jnp.float32)]
                 * n_full
                 + ([jax.ShapeDtypeStruct((stk_d, n_chains), jnp.float32)]
                    * 2 if multinomial else [])
                 + [jax.ShapeDtypeStruct((rows_total, n_chains),
                                         jnp.float32)])
    out_specs = ([full] * n_full
                 + ([stack_spec, stack_spec] if multinomial else [])
                 + [rows_spec])
    # state arrays update in place: input k (after the 2 SMEM prefix args,
    # which do not count) aliases output k
    n_state = n_full + (2 if multinomial else 0) + 1
    aliases = {k: k for k in range(n_state)}

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
    proposal_scheme: str = "endpoint",
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

    proposal_scheme='multinomial' builds the Stan-scheme machine (per-leaf
    weighted reservoir, biased subtree merges, iterative sub-U-turn
    checkpoint stacks — see _make_kernel); the TState must then be packed
    with pack_state(multinomial=True, max_tree_depth=...), which adds the
    reservoir arrays and two (max_tree_depth * d_pad, C) stacks.
    """
    if value_and_grad_fn is None:
        raise TypeError("the fused NUTS window requires an analytic "
                        "value_and_grad_fn from mcmc_tpu.targets")
    if proposal_scheme not in ("endpoint", "multinomial"):
        raise ValueError(f"unknown proposal_scheme: {proposal_scheme!r}")
    multinomial = proposal_scheme == "multinomial"
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    onchip_rng = on_tpu and not interpret

    d_pad = _round_up(dim, SUBLANE)
    padded_vag = make_padded_vag(value_and_grad_fn, d_pad, dim_axis=0)
    data_arrays = tuple(getattr(padded_vag, "data_arrays", ()))
    tile = chain_tile or 256   # measured optimum on v5e (229M leapfrogs/s
    # at 4096 chains x 50D funnel; 512 -> 223M; >=1024 exceeds scoped VMEM)
    if chain_tile is None and multinomial:
        # the 2S checkpoint-stack blocks dominate VMEM at larger dims:
        # keep the live state under ~4 MiB per tile
        n_arrays = len(_FULL_FIELDS_MULTI) + 2 * max_tree_depth
        while tile > 32 and n_arrays * d_pad * tile * 4 > (4 << 20):
            tile //= 2
    tile = min(tile, n_chains)
    while n_chains % tile:
        tile //= 2
    tile = max(tile, 1)
    call = _build_call(padded_vag, n_iters, max_tree_depth, n_chains, d_pad,
                       tile, inject_randoms=not onchip_rng,
                       interpret=interpret, steps_per_iter=steps_per_iter,
                       dense=dense, multinomial=multinomial)
    full_fields = _FULL_FIELDS_MULTI if multinomial else _FULL_FIELDS
    n_full = len(full_fields)
    n_slice = n_iters * steps_per_iter if multinomial else n_iters

    def window(key, ts: TState, step_size, inv_mass_matrix):
        # built per call, NOT at factory time: the memoized factory may be
        # first invoked inside a shard_map trace, and a constant created
        # there carries that trace's Manual mesh in its aval — reusing it
        # under a different mesh (e.g. the dryrun's cross-mesh parity
        # check) is a hard error. A per-call iota row is free.
        mask = _mask_row(dim, d_pad, dim_axis=0)
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
        args = tuple(getattr(ts, f) for f in full_fields)
        if multinomial:
            args += (ts.q_stk, ts.p_stk)
        args += (ts.rows,) + metric_args + data_arrays
        if not onchip_rng:
            kp, kd, kd2, ks, ku, kr = random.split(key, 6)
            p0 = random.normal(kp, (n_iters, d_pad, n_chains), jnp.float32)
            dirs = random.bernoulli(kd, 0.5, (n_iters, n_chains)
                                    ).astype(jnp.float32)
            dirs2 = random.bernoulli(kd2, 0.5, (n_iters, n_chains)
                                     ).astype(jnp.float32)
            swaps = random.uniform(ks, (n_iters, n_chains), jnp.float32)
            slices = random.uniform(ku, (n_slice, n_chains), jnp.float32,
                                    minval=jnp.finfo(jnp.float32).tiny)
            ress = random.uniform(kr, (n_iters, n_chains), jnp.float32)
            args = args + (p0, dirs, dirs2, swaps, slices, ress)
        outs = call(seed, scalars, *args)
        if multinomial:
            return TState(*outs[:N_FULL], rows=outs[n_full + 2],
                          q_sub=outs[N_FULL], g_sub=outs[N_FULL + 1],
                          q_stk=outs[n_full], p_stk=outs[n_full + 1])
        return TState(*outs)

    return window
