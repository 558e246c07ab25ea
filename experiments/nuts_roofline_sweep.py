"""Persistent-NUTS W-slot roofline sweep (round 5, VERDICT r4 #7).

Measures the fused VMEM window kernel (ops/fused_nuts.py) across the
steps-per-bookkeeping-pass parameter W at the bench configuration
(65,536 chains, 50D funnel, tuned step), then fits the two-parameter cost
model

    time / machine-iteration = t_book + W * t_slot

to quantify where the gap to the fused GRAHMC kernel's raw leapfrog rate
goes: per-slot NUTS overhead (energy tracking, per-leaf bookkeeping,
masked restarts) vs the per-window bookkeeping pass (U-turn checks,
proposal swaps, stack ops) vs masked slots (1 - occupancy).

Writes JSON to stdout; the distilled numbers land in BASELINE.md's
"Roofline: persistent NUTS" subsection.

Run on an otherwise-idle TPU: concurrent device work corrupts the timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import jax.random as random


def main(n_chains=65536, dim=50, step_size=0.268, w_values=(1, 2, 4, 6, 8),
         num_samples=32, steps_per_sample=48):
    from mcmc_tpu.targets import neals_funnel
    from mcmc_tpu.samplers import nuts_run_persistent, grahmc_run
    from mcmc_tpu.samplers.grahmc import tanh_schedule

    target = neals_funnel(dim)
    key = random.PRNGKey(0)
    init = target.init_sampler(key, n_chains).astype(jnp.float32)

    rows = []
    for w in w_values:
        # warm the compile, then take the median of 3 timed reps — each
        # forcing completion via a SCALAR HOST TRANSFER (block_until_ready
        # alone returns before remote execution finishes on this tunnel
        # rig; same convention as bench.py::_timed_reps)
        def run(k):
            r = nuts_run_persistent(
                k, target.log_prob_fn, init, step_size=step_size,
                num_samples=num_samples, steps_per_sample=steps_per_sample,
                burn_in_steps=0, max_tree_depth=10,
                value_and_grad_fn=target.value_and_grad_fn,
                collect_chains=64, steps_per_iter=w)
            float(jnp.sum(r.samples))
            return r
        run(random.PRNGKey(1))
        dts = []
        for rep in range(4):
            t0 = time.time()
            r = run(random.fold_in(random.PRNGKey(2), rep))
            dts.append(time.time() - t0)
        dt = sorted(dts[1:])[1]
        useful = int(r.info["n_leapfrogs"])
        slots = int(r.info["n_leapfrog_slots"])
        chip_iters = num_samples * steps_per_sample / w
        rows.append({
            "W": w,
            "time_s": round(dt, 3),
            "useful_grads_per_s_M": round(useful / dt / 1e6, 1),
            "slot_rate_per_s_M": round(slots / dt / 1e6, 1),
            "occupancy": round(useful / slots, 4),
            "ns_per_chip_iter": round(dt / chip_iters * 1e9, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    # least-squares fit: chip time/machine-iteration = t_book + W * t_slot
    W = np.array([r["W"] for r in rows], np.float64)
    t_iter = np.array([r["time_s"] / (num_samples * steps_per_sample
                                      / r["W"])
                       for r in rows], np.float64)
    A = np.stack([np.ones_like(W), W], axis=1)
    (t_book, t_slot), *_ = np.linalg.lstsq(A, t_iter, rcond=None)
    fit = {"t_slot_ns_chip": round(t_slot * 1e9, 1),
           "t_book_ns_chip": round(t_book * 1e9, 1),
           "book_in_slots": round(t_book / t_slot, 2)}
    print(json.dumps({"fit_chip_aggregate": fit}), flush=True)

    # GRAHMC fused kernel leapfrog rate, same chains/target, for the
    # apples-to-apples substep comparison (L=16, tanh)
    def g_run(k):
        return grahmc_run(k, target.log_prob_fn, init, step_size=step_size,
                          num_steps=16, gamma=1.0, steepness=0.5,
                          num_samples=num_samples * 4, burn_in=0,
                          friction_schedule=tanh_schedule,
                          value_and_grad_fn=target.value_and_grad_fn,
                          backend="pallas", collect_chains=64)
    g = g_run(random.PRNGKey(3))
    float(jnp.sum(g.samples))
    gts = []
    for rep in range(4):
        t0 = time.time()
        g = g_run(random.fold_in(random.PRNGKey(4), rep))
        float(jnp.sum(g.samples))
        gts.append(time.time() - t0)
    dt = sorted(gts[1:])[1]
    g_leap = num_samples * 4 * 16 * n_chains / dt
    print(json.dumps({"grahmc_leapfrogs_per_s_M": round(g_leap / 1e6, 1),
                      "grahmc_ns_per_leapfrog_chip": round(1e9 / g_leap
                                                           * 1, 4)}),
          flush=True)


if __name__ == "__main__":
    main()
