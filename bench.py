"""Benchmark: GRAHMC chain-throughput on 50D Neal's funnel.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: GRAHMC chain-steps/sec (chains x MH transitions / sec, each transition
= 16 conformal-leapfrog substeps with funnel gradient) at 65,536 chains on the
TPU chip — BASELINE.json's "GRAHMC sampler steps/sec at 10^5 chains" config
(multimodal-scale chain count, 50D funnel).

Baseline: the same quantity measured by RUNNING THE REFERENCE implementation
(pure-JAX host loops, /root/reference) on CPU at its practical chain count
(256 chains), since the reference publishes no numbers (BASELINE.md). The
baseline is measured once in a CPU subprocess and cached to
.bench_baseline.json; delete that file to re-measure.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")

DIM = 50
NUM_STEPS = 16          # leapfrog substeps per transition
TPU_CHAINS = 65536
CPU_CHAINS = 256        # reference CPU practical scale
TIMED_SAMPLES = 100

_BASELINE_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, "/root/reference")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # reference CLIs enable x64
import jax.numpy as jnp
from jax import random

# Funnel log-prob in the reference's formulation (targets.py:166-185); defined
# here because the reference's targets module has a broken unconditional import.
DIM = %(dim)d
def log_prob_fn(x):
    x0 = x[0]
    x_rest = x[1:]
    D_rest = DIM - 1
    log_p_x0 = -0.5 * (x0**2 / 9.0 + jnp.log(2.0 * jnp.pi * 9.0))
    log_p_rest = -0.5 * (jnp.sum(x_rest**2) / jnp.exp(x0) + D_rest * x0
                         + D_rest * jnp.log(2.0 * jnp.pi))
    return log_p_x0 + log_p_rest

from samplers.GRAHMC import rahmc_run, constant_schedule

key = random.PRNGKey(0)
init = random.normal(key, (%(chains)d, DIM)) * 0.5
kw = dict(step_size=0.05, num_steps=%(num_steps)d, gamma=1.0, steepness=1.0,
          burn_in=0, friction_schedule=constant_schedule)
# compile warm-up at the same static shape as the timed run
out = rahmc_run(random.PRNGKey(1), log_prob_fn, init, num_samples=%(samples)d, **kw)
jax.block_until_ready(out[0])
# timed: best of 5 repetitions (exec-only; compile already warmed)
dts = []
for rep in range(5):
    t0 = time.time()
    out = rahmc_run(random.PRNGKey(2 + rep), log_prob_fn, init, num_samples=%(samples)d, **kw)
    jax.block_until_ready(out[0])
    dts.append(time.time() - t0)
dt = min(dts)
print(json.dumps({"chain_steps_per_sec": %(chains)d * %(samples)d / dt,
                  "seconds": dt, "chains": %(chains)d, "samples": %(samples)d}))
"""


def measure_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    script = _BASELINE_SCRIPT % {"dim": DIM, "chains": CPU_CHAINS,
                                 "num_steps": NUM_STEPS, "samples": TIMED_SAMPLES}
    print("[bench] measuring reference CPU baseline...", file=sys.stderr)
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=1800)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError("baseline measurement failed")
    result = json.loads(out.stdout.strip().splitlines()[-1])
    with open(BASELINE_CACHE, "w") as f:
        json.dump(result, f)
    return result


def measure_tpu():
    sys.path.insert(0, REPO)
    import jax
    # Persistent compilation cache: compiles through the remote tunnel are
    # slow; cache them across bench invocations.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import random

    from mcmc_tpu.targets import neals_funnel
    from mcmc_tpu.samplers import grahmc_run, constant_schedule

    target = neals_funnel(DIM)
    key = random.PRNGKey(0)
    init = (random.normal(key, (TPU_CHAINS, DIM)) * 0.5).astype(jnp.float32)
    kw = dict(step_size=0.05, num_steps=NUM_STEPS, gamma=1.0, steepness=1.0,
              burn_in=0, friction_schedule=constant_schedule,
              value_and_grad_fn=target.value_and_grad_fn, collect_chains=64,
              backend="pallas")   # fused on-chip trajectory kernel

    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    # compile warm-up with the SAME static shape as the timed run
    # (num_samples is a static arg; a different value would recompile
    # inside the timed region)
    res = grahmc_run(random.PRNGKey(1), target.log_prob_fn, init,
                     num_samples=TIMED_SAMPLES, **kw)
    jax.block_until_ready(res.samples)
    # timed: median of 5 repetitions, first dropped. Completion is forced by
    # a scalar host transfer — block_until_ready alone is unreliable through
    # the remote-TPU tunnel (returns before execution finishes).
    dts = []
    for rep in range(6):
        t0 = time.time()
        res = grahmc_run(random.PRNGKey(2 + rep), target.log_prob_fn, init,
                         num_samples=TIMED_SAMPLES, **kw)
        float(jnp.sum(res.samples) + jnp.sum(res.final_state.position))
        dts.append(time.time() - t0)
    dt = sorted(dts[1:])[len(dts[1:]) // 2]
    accept = float(res.accept_rate.mean())
    print(f"[bench] TPU: {dt:.2f}s for {TIMED_SAMPLES} samples x {TPU_CHAINS} "
          f"chains (accept={accept:.3f})", file=sys.stderr)

    # Secondary counters (stderr only; the JSON metric stays chain-steps/s):
    # bulk-ESS/sec estimated from the collected chain prefix, scaled to all
    # chains (chains are i.i.d. given the warmed state).
    try:
        from mcmc_tpu.diagnostics import ess_bulk
        ess_prefix = float(jnp.min(ess_bulk(res.samples)))
        n_collect = res.samples.shape[1]
        ess_rate = ess_prefix * (TPU_CHAINS / n_collect) / dt
        print(f"[bench] est. min bulk-ESS/sec/chip: {ess_rate:,.0f} "
              f"(prefix of {n_collect} chains, {TIMED_SAMPLES} draws)",
              file=sys.stderr)
    except Exception as e:  # counters must never fail the bench
        print(f"[bench] ESS counter skipped: {e}", file=sys.stderr)
    return TPU_CHAINS * TIMED_SAMPLES / dt


def main():
    baseline = measure_baseline()
    print(f"[bench] reference CPU baseline: "
          f"{baseline['chain_steps_per_sec']:.1f} chain-steps/s "
          f"({baseline['chains']} chains)", file=sys.stderr)
    tpu_rate = measure_tpu()
    print(json.dumps({
        "metric": "grahmc_chain_steps_per_sec_50d_funnel",
        "value": round(tpu_rate, 1),
        "unit": "chain_steps/s",
        "vs_baseline": round(tpu_rate / baseline["chain_steps_per_sec"], 2),
    }))


if __name__ == "__main__":
    main()
