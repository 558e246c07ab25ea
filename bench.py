"""Benchmark: GRAHMC + NUTS throughput and measured ESS on 50D Neal's funnel.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

Primary metric: GRAHMC chain-steps/sec (chains x MH transitions / sec, each
transition = 16 conformal-leapfrog substeps with funnel gradient) at 65,536
chains on the TPU chip — BASELINE.json's "GRAHMC sampler steps/sec at 10^5
chains" config — measured AT A TUNED OPERATING POINT: the step size is
dual-averaging tuned on-device to accept ~0.65 (reference target,
run_benchmarks.py:549) and the SAME step is used for the reference-CPU
baseline, so both sides do statistically meaningful work (VERDICT r1 weak #3:
the round-1 bench ran at 7% acceptance).

extras (also printed to stderr):
  - measured min bulk-ESS/sec/chip over ALL 65,536 chains' collected history
    via the chain-chunked streaming estimator (no 64-chain extrapolation),
  - a NUTS row: persistent (asynchronous) NUTS useful-gradient evals/sec and
    measured ESS/sec at 65,536 chains vs the reference CPU NUTS at the same
    tuned step (useful grads = sum over chains of 2^(depth+1)-1 per
    transition; every persistent-NUTS leapfrog is useful by construction),
  - an RWMH row: the fused multi-transition kernel at 65,536 chains vs the
    reference CPU rwMH_run at the Roberts-Rosenthal 2.38/sqrt(d) scale.

Baselines are measured by RUNNING THE REFERENCE implementation
(/root/reference, pure-JAX host loops) on CPU at its practical chain counts,
since the reference publishes no numbers (BASELINE.md). Results are cached in
.bench_baseline.json (versioned; delete to re-measure).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
CACHE_VERSION = 4  # v4: CPU NUTS rate uses matched per-rep pairs (median)

DIM = 50
NUM_STEPS = 16          # leapfrog substeps per GRAHMC transition
TPU_CHAINS = 65536
CPU_CHAINS = 256        # reference CPU practical scale (GRAHMC)
TIMED_SAMPLES = 768         # headline timing: ~0.6s timed region (a 0.16s
                            # region at 192 was dominated by tunnel jitter)
ESS_SAMPLES = 192           # full-history ESS run: 192 x 65536 x 50 f32
                            # = 2.5 GB history (768 would be 10 GB)

NUTS_TPU_CHAINS = 65536     # persistent NUTS scales: 233/481/670M useful
NUTS_CPU_CHAINS = 64        # grads/s at 4k/16k/65k chains (BASELINE.md)
NUTS_STEPS_PER_SAMPLE = 64
NUTS_TIMED_SAMPLES = 192    # also the NUTS ESS history size (~1s timed)

RWMH_DIM = 10               # reference README quick-start target
RWMH_TPU_CHAINS = 65536
RWMH_CPU_CHAINS = 4096      # RWMH is cheap; reference CPU handles more chains
RWMH_TIMED_SAMPLES = 16384  # ~0.5s timed region at the measured ~2B/s
RWMH_SCALE = 2.38 / RWMH_DIM ** 0.5  # Roberts-Rosenthal optimal scaling

_GRAHMC_BASELINE_SCRIPT = r"""
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
kw = dict(step_size=%(step)0.8f, num_steps=%(num_steps)d, gamma=1.0,
          steepness=1.0, burn_in=0, friction_schedule=constant_schedule)
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
accept = float(out[2].mean())
# Measured min bulk-ESS/sec through the SAME streaming estimator as the TPU
# side (VERDICT r2 missing #1: the north-star ESS/sec ratio must be measured
# on both arms, not inferred from chain-steps). ESS comes from the LAST rep's
# history and is divided by that same rep's wall time (matched pair).
sys.path.insert(0, %(repo)r)
from mcmc_tpu.diagnostics import ess_bulk_chunked
ess_min = float(ess_bulk_chunked(out[0], chain_chunk=%(chains)d,
                                 dim_chunk=8).min())
print(json.dumps({"chain_steps_per_sec": %(chains)d * %(samples)d / dt,
                  "seconds": dt, "chains": %(chains)d, "samples": %(samples)d,
                  "ess_bulk_min": ess_min, "ess_per_sec": ess_min / dts[-1],
                  "accept": accept}))
"""

_NUTS_BASELINE_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, "/root/reference")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax import random

DIM = %(dim)d
def log_prob_fn(x):
    x0 = x[0]
    x_rest = x[1:]
    D_rest = DIM - 1
    log_p_x0 = -0.5 * (x0**2 / 9.0 + jnp.log(2.0 * jnp.pi * 9.0))
    log_p_rest = -0.5 * (jnp.sum(x_rest**2) / jnp.exp(x0) + D_rest * x0
                         + D_rest * jnp.log(2.0 * jnp.pi))
    return log_p_x0 + log_p_rest

from samplers.NUTS import nuts_run

key = random.PRNGKey(0)
init = random.normal(key, (%(chains)d, DIM)) * 0.5
out = nuts_run(random.PRNGKey(1), log_prob_fn, init, step_size=%(step)0.8f,
               num_samples=%(samples)d, burn_in=0)
jax.block_until_ready(out[0])
# Matched per-rep pairs (tree depths vary per key, so each rep's gradient
# count is divided by its OWN wall time; the reported rate is the median of
# per-rep rates — same convention as the TPU arm).
reps, outs = [], None
for rep in range(3):
    t0 = time.time()
    outs = nuts_run(random.PRNGKey(2 + rep), log_prob_fn, init,
                    step_size=%(step)0.8f, num_samples=%(samples)d, burn_in=0)
    jax.block_until_ready(outs[0])
    dt_rep = time.time() - t0
    depths_rep = np.asarray(outs[4])
    reps.append((float((2.0 ** (depths_rep + 1) - 1).sum()),
                 float(depths_rep.size), dt_rep))
rates = sorted(g / d for g, _t, d in reps)
trans_rates = sorted(t / d for _g, t, d in reps)
depths = np.asarray(outs[4])
# Measured min bulk-ESS/sec via the same streaming estimator as the TPU arm
# (matched pair: last rep's history over last rep's wall time).
sys.path.insert(0, %(repo)r)
from mcmc_tpu.diagnostics import ess_bulk_chunked
ess_min = float(ess_bulk_chunked(outs[0], chain_chunk=%(chains)d,
                                 dim_chunk=8).min())
print(json.dumps({"useful_grads_per_sec": rates[len(rates) // 2],
                  "transitions_per_sec": trans_rates[len(trans_rates) // 2],
                  "seconds": reps[-1][2], "chains": %(chains)d,
                  "samples": %(samples)d,
                  "ess_bulk_min": ess_min,
                  "ess_per_sec": ess_min / reps[-1][2],
                  "mean_depth": float(depths.mean())}))
"""


_RWMH_BASELINE_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, "/root/reference")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import random

DIM = %(dim)d
def log_prob_fn(x):
    # standard normal in the reference's single-point formulation
    # (targets.py log-probs take (n_dim,); rwMH_step vmaps over chains)
    return -0.5 * (jnp.sum(x**2) + DIM * jnp.log(2.0 * jnp.pi))

from samplers.RWMH import rwMH_run

key = random.PRNGKey(0)
init = random.normal(key, (%(chains)d, DIM)) * 0.3
out = rwMH_run(random.PRNGKey(1), log_prob_fn, init,
               num_samples=%(samples)d, scale=%(scale)0.8f, burn_in=0)
jax.block_until_ready(out[0])
dts = []
for rep in range(5):
    t0 = time.time()
    out = rwMH_run(random.PRNGKey(2 + rep), log_prob_fn, init,
                   num_samples=%(samples)d, scale=%(scale)0.8f, burn_in=0)
    jax.block_until_ready(out[0])
    dts.append(time.time() - t0)
dt = min(dts)
print(json.dumps({"chain_steps_per_sec": %(chains)d * %(samples)d / dt,
                  "seconds": dt, "chains": %(chains)d,
                  "samples": %(samples)d,
                  "accept": float(out[2].mean())}))
"""


def _run_subprocess(script, what):
    print(f"[bench] measuring reference CPU baseline ({what})...",
          file=sys.stderr)
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"baseline measurement failed ({what})")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _load_cache():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        if cache.get("version") == CACHE_VERSION:
            return cache
        if cache.get("version") == 3:
            # v3 -> v4 changed only the NUTS-baseline pairing; keep the
            # validated idle-machine GRAHMC/RWMH baselines and tuned steps.
            cache.pop("nuts_cpu", None)
            cache["version"] = CACHE_VERSION
            return cache
    return {"version": CACHE_VERSION}


def _save_cache(cache):
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f)


def _tune_step(target, n_chains, kind, jnp, random):
    """Dual-averaging tune the step size to accept ~0.65 on-device.

    GRAHMC tunes through the fused kernel; NUTS through the persistent path.
    Returns the tuned step (float).
    """
    from mcmc_tpu.tuning import da_init, da_update, da_step_size, \
        da_final_step_size
    from mcmc_tpu.samplers.base import init_chain_state

    init = (random.normal(random.PRNGKey(11), (n_chains, DIM)) * 0.5
            ).astype(jnp.float32)
    da = da_init(0.1)
    key = random.PRNGKey(12)

    if kind == "grahmc":
        from mcmc_tpu.ops.fused_trajectory import make_fused_grahmc_step
        from mcmc_tpu.samplers.grahmc import constant_schedule
        fused = make_fused_grahmc_step(target.log_prob_fn,
                                       target.value_and_grad_fn,
                                       NUM_STEPS, constant_schedule)
        state = init_chain_state(init, target.log_prob_fn,
                                 target.value_and_grad_fn)
        inv_mass = jnp.ones(DIM, jnp.float32)
        import jax

        @jax.jit
        def batch(key, state, eps):
            def body(c, _):
                k, s = c
                k, s, (acc, *_r) = fused(k, s, eps, 1.0, 1.0, inv_mass)
                return (k, s), jnp.mean(acc)
            (key, state), accs = jax.lax.scan(body, (key, state), length=10)
            return key, state, jnp.mean(accs)

        for it in range(40):
            key, state, acc = batch(key, state, da_step_size(da))
            da = da_update(da, acc, 0.65)
    else:
        from mcmc_tpu.samplers import nuts_run_persistent
        pos = init
        for it in range(15):
            eps = float(da_step_size(da))
            key, k = random.split(key)
            res = nuts_run_persistent(
                k, target.log_prob_fn, pos, step_size=eps, num_samples=1,
                steps_per_sample=96, burn_in_steps=0,
                value_and_grad_fn=target.value_and_grad_fn, collect_chains=8)
            pos = res.final_state.position
            acc = jnp.nanmean(res.info["mean_accept_probs"])
            da = da_update(da, acc, 0.65)
    step = float(da_final_step_size(da))
    print(f"[bench] tuned {kind} step_size={step:.4f}", file=sys.stderr)
    return step


def _timed_reps(run_rep, n_reps=6):
    """Median wall time of the last n_reps-1 calls of run_rep(rep) — the
    first rep is dropped (still slower through the tunnel even after a
    same-shape warm call). run_rep must force completion itself via a
    scalar host transfer: block_until_ready alone returns before remote
    execution finishes on this rig. Encodes the measurement conventions
    (MEMORY: tpu-tunnel-measurement) once for every plain timed row."""
    import time as _time
    dts = []
    for rep in range(n_reps):
        t0 = _time.time()
        run_rep(rep)
        dts.append(_time.time() - t0)
    tail = sorted(dts[1:])
    return tail[len(tail) // 2]


def _measured_ess_per_sec(samples, dt, jnp, label):
    """Min bulk-ESS over ALL collected chains (streaming), per sampling sec."""
    from mcmc_tpu.diagnostics import ess_bulk_chunked
    t0 = time.time()
    ess = ess_bulk_chunked(samples, chain_chunk=8192, dim_chunk=4)
    ess_min = float(jnp.min(ess))
    ess_median = float(jnp.median(ess))
    print(f"[bench] {label}: measured bulk-ESS over all "
          f"{samples.shape[1]:,} chains x {samples.shape[0]} draws: "
          f"min={ess_min:,.0f} median={ess_median:,.0f} "
          f"(diag took {time.time() - t0:.0f}s)", file=sys.stderr)
    return ess_min / dt


def measure_tpu():
    sys.path.insert(0, REPO)
    import jax
    # NO persistent compilation cache here, deliberately: executable
    # (de)serialization in this jax/jaxlib build segfaults
    # nondeterministically on cache writes (killed 2/2 test-suite runs
    # 2026-08-20; see tests/conftest.py), a SIGSEGV cannot be caught by
    # the per-row try/excepts, and the cache measurably does NOT serve
    # the expensive chunked-ESS programs across processes on the
    # remote-axon backend anyway (BASELINE.md "Diagnostics cold-compile
    # through the tunnel") — so it was write-exposure every run for no
    # serving benefit. In-process jit caching already dedupes compiles
    # within the bench.
    import jax.numpy as jnp
    from jax import random

    from mcmc_tpu.targets import neals_funnel
    from mcmc_tpu.samplers import grahmc_run, nuts_run_persistent
    from mcmc_tpu.samplers.grahmc import constant_schedule

    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    target = neals_funnel(DIM)
    cache = _load_cache()

    # ---- tuned operating points (cached) --------------------------------
    if "grahmc_step" not in cache:
        cache["grahmc_step"] = _tune_step(target, TPU_CHAINS, "grahmc",
                                          jnp, random)
        _save_cache(cache)
    if "nuts_step" not in cache:
        cache["nuts_step"] = _tune_step(target, NUTS_TPU_CHAINS, "nuts",
                                        jnp, random)
        _save_cache(cache)
    g_step = cache["grahmc_step"]
    n_step = cache["nuts_step"]

    # ---- GRAHMC: timed fused-kernel run ---------------------------------
    key = random.PRNGKey(0)
    init = (random.normal(key, (TPU_CHAINS, DIM)) * 0.5).astype(jnp.float32)
    kw = dict(step_size=g_step, num_steps=NUM_STEPS, gamma=1.0, steepness=1.0,
              burn_in=0, friction_schedule=constant_schedule,
              value_and_grad_fn=target.value_and_grad_fn, collect_chains=64,
              backend="pallas")   # fused on-chip trajectory kernel

    # compile warm-up with the SAME static shape as the timed run
    res = grahmc_run(random.PRNGKey(1), target.log_prob_fn, init,
                     num_samples=TIMED_SAMPLES, **kw)
    jax.block_until_ready(res.samples)
    # timed: median of 5 repetitions, first dropped (_timed_reps)
    g_box = {}

    def _g_rep(rep):
        g_box["res"] = grahmc_run(random.PRNGKey(2 + rep),
                                  target.log_prob_fn, init,
                                  num_samples=TIMED_SAMPLES, **kw)
        float(jnp.sum(g_box["res"].final_state.position))

    dt = _timed_reps(_g_rep)
    res = g_box["res"]
    accept = float(res.accept_rate.mean())
    grahmc_rate = TPU_CHAINS * TIMED_SAMPLES / dt
    print(f"[bench] GRAHMC TPU: {dt:.2f}s for {TIMED_SAMPLES} x {TPU_CHAINS} "
          f"chains (accept={accept:.3f}, step={g_step:.4f})", file=sys.stderr)

    extras = {"grahmc_accept": round(accept, 3),
              "grahmc_step_size": round(g_step, 5)}
    # Separate timed run WITH full-history collection: ESS/sec must be
    # measured over ALL chains against the wall time of the run that
    # produced that history (collection costs real HBM writes, so it is not
    # folded into the headline chain-steps/s either).
    try:
        kw_full = dict(kw, collect_chains=None)
        res_full = grahmc_run(random.PRNGKey(9), target.log_prob_fn, init,
                              num_samples=ESS_SAMPLES, **kw_full)
        jax.block_until_ready(res_full.samples)
        t0 = time.time()
        res_full = grahmc_run(random.PRNGKey(10), target.log_prob_fn, init,
                              num_samples=ESS_SAMPLES, **kw_full)
        float(jnp.sum(res_full.final_state.position))
        dt_full = time.time() - t0
        extras["grahmc_ess_per_sec"] = round(
            _measured_ess_per_sec(res_full.samples, dt_full, jnp, "GRAHMC"), 1)
    except Exception as e:  # counters must never fail the bench
        print(f"[bench] GRAHMC ESS counter skipped: {e}", file=sys.stderr)

    # ---- NUTS: persistent path, timed, full-history ESS ------------------
    try:
        n_init = (random.normal(random.PRNGKey(3),
                                (NUTS_TPU_CHAINS, DIM)) * 0.5
                  ).astype(jnp.float32)
        nkw = dict(step_size=n_step, num_samples=NUTS_TIMED_SAMPLES,
                   steps_per_sample=NUTS_STEPS_PER_SAMPLE, burn_in_steps=0,
                   value_and_grad_fn=target.value_and_grad_fn)
        nres = nuts_run_persistent(random.PRNGKey(4), target.log_prob_fn,
                                   n_init, **nkw)
        jax.block_until_ready(nres.samples)
        # Per-rep matched pairs: the executed-leapfrog count varies with the
        # PRNG key (slot masking), so each rep's count is divided by its OWN
        # wall time and the median of per-rep rates is reported (ADVICE r2:
        # never divide one rep's numerator by another rep's denominator).
        reps = []
        for rep in range(4):
            t0 = time.time()
            nres = nuts_run_persistent(random.PRNGKey(5 + rep),
                                       target.log_prob_fn, n_init, **nkw)
            float(jnp.sum(nres.final_state.position))
            dt_rep = time.time() - t0
            reps.append((int(nres.info["n_leapfrogs"]), dt_rep))
        rates = sorted(g / d for g, d in reps[1:])   # first rep dropped
        n_rate = rates[len(rates) // 2]
        ndt_last = reps[-1][1]
        extras["nuts_useful_grads_per_sec"] = round(n_rate, 1)
        extras["nuts_accept"] = round(float(jnp.nanmean(
            nres.info["mean_accept_probs"])), 3)
        extras["nuts_step_size"] = round(n_step, 5)
        print(f"[bench] NUTS TPU (persistent): {ndt_last:.2f}s last rep, "
              f"{n_rate / 1e6:,.1f}M useful grads/s (median of per-rep "
              f"rates) at {NUTS_TPU_CHAINS} chains (accept="
              f"{extras['nuts_accept']:.3f})", file=sys.stderr)
        # ESS from the last rep's history over that same rep's wall time.
        extras["nuts_ess_per_sec"] = round(
            _measured_ess_per_sec(nres.samples, ndt_last, jnp, "NUTS"), 1)
    except Exception as e:
        print(f"[bench] NUTS row skipped: {e}", file=sys.stderr)

    # ---- NUTS multinomial proposal at bench scale (VERDICT r3 #4) --------
    # Same config/keys as the endpoint row: measures what the Stan-exact
    # multinomial scheme costs at 65,536 chains so the TPU 'auto' default
    # is chosen from data, not guessed. (The endpoint scheme carries the
    # reference's ~3-4% marginal underdispersion — BASELINE.md bias audit.)
    try:
        mkw = dict(step_size=n_step, num_samples=NUTS_TIMED_SAMPLES,
                   steps_per_sample=NUTS_STEPS_PER_SAMPLE, burn_in_steps=0,
                   value_and_grad_fn=target.value_and_grad_fn,
                   proposal_scheme="multinomial")
        m_init = (random.normal(random.PRNGKey(3),
                                (NUTS_TPU_CHAINS, DIM)) * 0.5
                  ).astype(jnp.float32)
        mres = nuts_run_persistent(random.PRNGKey(4), target.log_prob_fn,
                                   m_init, **mkw)
        jax.block_until_ready(mres.samples)
        mreps = []
        for rep in range(4):
            t0 = time.time()
            mres = nuts_run_persistent(random.PRNGKey(5 + rep),
                                       target.log_prob_fn, m_init, **mkw)
            float(jnp.sum(mres.final_state.position))
            dt_rep = time.time() - t0
            mreps.append((int(mres.info["n_leapfrogs"]), dt_rep))
        mrates = sorted(g / d for g, d in mreps[1:])
        m_rate = mrates[len(mrates) // 2]
        mdt_last = mreps[-1][1]
        extras["nuts_multinomial_useful_grads_per_sec"] = round(m_rate, 1)
        extras["nuts_multinomial_ess_per_sec"] = round(
            _measured_ess_per_sec(mres.samples, mdt_last, jnp,
                                  "NUTS-multinomial"), 1)
        if extras.get("nuts_ess_per_sec"):
            extras["nuts_multinomial_vs_endpoint_ess"] = round(
                extras["nuts_multinomial_ess_per_sec"]
                / extras["nuts_ess_per_sec"], 3)
        print(f"[bench] NUTS multinomial: {m_rate / 1e6:,.1f}M useful "
              f"grads/s, ESS/s ratio vs endpoint = "
              f"{extras.get('nuts_multinomial_vs_endpoint_ess', 'n/a')}",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] NUTS multinomial row skipped: {e}", file=sys.stderr)

    # ---- RWMH: fused multi-transition kernel, timed ----------------------
    try:
        from mcmc_tpu.targets import standard_normal
        from mcmc_tpu.samplers import rwmh_run
        rt = standard_normal(RWMH_DIM)
        r_init = (random.normal(random.PRNGKey(6),
                                (RWMH_TPU_CHAINS, RWMH_DIM)) * 0.3
                  ).astype(jnp.float32)
        rkw = dict(num_samples=RWMH_TIMED_SAMPLES, scale=RWMH_SCALE,
                   burn_in=0, collect_chains=64,
                   value_and_grad_fn=rt.value_and_grad_fn, backend="pallas")
        rres = rwmh_run(random.PRNGKey(7), rt.log_prob_fn, r_init, **rkw)
        jax.block_until_ready(rres.samples)
        r_box = {}

        def _r_rep(rep):
            r_box["res"] = rwmh_run(random.PRNGKey(8 + rep), rt.log_prob_fn,
                                    r_init, **rkw)
            float(jnp.sum(r_box["res"].final_state.position))

        rdt = _timed_reps(_r_rep)
        rres = r_box["res"]
        extras["rwmh_chain_steps_per_sec"] = round(
            RWMH_TPU_CHAINS * RWMH_TIMED_SAMPLES / rdt, 1)
        extras["rwmh_accept"] = round(float(rres.accept_rate.mean()), 3)
        print(f"[bench] RWMH TPU (fused): {rdt:.3f}s, "
              f"{extras['rwmh_chain_steps_per_sec'] / 1e6:,.1f}M "
              f"chain-steps/s at {RWMH_TPU_CHAINS} chains (accept="
              f"{extras['rwmh_accept']:.3f})", file=sys.stderr)
    except Exception as e:
        print(f"[bench] RWMH row skipped: {e}", file=sys.stderr)

    # ---- ChEES: cold warmup wall-clock + jittered sampling ---------------
    # The warmup number is the compile-shape-discipline metric: the whole
    # 2500-step adaptation compiles a SINGLE fixed-shape batch program
    # (tuning/chees.py; the grid warmup compiles two — its accumulate flag
    # is static); before the uniform-batch change the same warmup measured
    # 463.8s cold on this rig (BASELINE.md "ChEES vs the reference's L
    # grid search").
    try:
        from mcmc_tpu.targets import get_target as _get_target
        from mcmc_tpu.tuning.chees import run_chees_warmup, chees_run
        ct = _get_target("neals_funnel_noncentered", dim=20)
        c_chains = 2048
        c_init = (random.normal(random.PRNGKey(40), (c_chains, 20)) * 0.5
                  ).astype(jnp.float32)
        t0 = time.time()
        c_step, c_mass, c_pos, c_info = run_chees_warmup(
            "hmc", ct.log_prob_fn, None, c_init, random.PRNGKey(41),
            num_warmup=2500, value_and_grad_fn=ct.value_and_grad_fn)
        float(jnp.sum(c_pos))
        extras["chees_warmup_seconds"] = round(time.time() - t0, 1)
        extras["chees_T"] = round(c_info["trajectory_length"], 4)
        extras["chees_L"] = int(c_info["num_steps"])
        # jittered sampling throughput at the tuned point (quantized fused
        # kernels on TPU). Compile warmed at the SAME draw count as the
        # timed reps: the cached _chees_run_core is keyed on the jitter
        # stream's SHAPE (the offset-dependent values are a traced
        # operand), so the warm call serves every rep.
        ckw = dict(inv_mass_matrix=c_mass, collect_chains=64,
                   value_and_grad_fn=ct.value_and_grad_fn)
        cres = chees_run(random.PRNGKey(42), ct.log_prob_fn, c_pos, c_step,
                         c_info["trajectory_length"], 8192, **ckw)
        jax.block_until_ready(cres.samples)
        c_box = {}

        def _c_rep(rep):
            c_box["res"] = chees_run(
                random.PRNGKey(43 + rep), ct.log_prob_fn, c_pos, c_step,
                c_info["trajectory_length"], 8192,
                halton_offset=16384 + 8192 * rep, **ckw)
            float(jnp.sum(c_box["res"].final_state.position))

        cdt = _timed_reps(_c_rep, n_reps=4)
        cres = c_box["res"]
        extras["chees_transitions_per_sec"] = round(c_chains * 8192 / cdt, 1)
        extras["chees_accept"] = round(float(cres.accept_rate.mean()), 3)
        print(f"[bench] ChEES: warmup {extras['chees_warmup_seconds']}s "
              f"cold (T={extras['chees_T']}, L={extras['chees_L']}); "
              f"jittered sampling "
              f"{extras['chees_transitions_per_sec'] / 1e6:,.1f}M "
              f"transitions/s (accept={extras['chees_accept']:.3f})",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] ChEES row skipped: {e}", file=sys.stderr)

    # ---- Tempered GRAHMC: replica-exchange ladder throughput ------------
    # 6-rung ladder on the reference's bimodal mixture through the fused
    # trajectory kernel (ONE compiled kernel serves all K rungs — the
    # per-rung (eps_k, beta_k) are traced scalars, samplers/tempered.py).
    # Rate counts REPLICA transitions: the honest all-rungs cost the
    # runner charges to n_gradients.
    try:
        from mcmc_tpu.targets import get_target as _get_target_mix
        from mcmc_tpu.samplers.tempered import tempered_run
        from mcmc_tpu.samplers.grahmc import tanh_schedule
        mt = _get_target_mix("gaussian_mixture", dim=10)
        t_K, t_chains, t_L, t_draws = 6, 8192, 16, 256
        t_init = mt.init_sampler(random.PRNGKey(50), t_chains)
        # gamma=0.1 tanh friction: cold accept ~0.59 with adjacent-pair
        # swap acceptance ~0.3-0.4 (near the 0.234 optimum) at this eps/L
        # (heavier friction collapses transition acceptance on the mixture).
        tkw = dict(step_size=0.5, num_steps=t_L, num_samples=t_draws,
                   n_temps=t_K, beta_min=0.02, collect_chains=64,
                   gamma=0.1, steepness=5.0, friction_schedule=tanh_schedule,
                   value_and_grad_fn=mt.value_and_grad_fn, backend="auto")
        # warm BOTH jit signatures (cold start tiles init; continuation
        # takes the (K*C, D) replica operand) so no rep pays a compile
        tres = tempered_run(random.PRNGKey(51), mt.log_prob_fn, t_init,
                            **tkw)
        jax.block_until_ready(tres.samples)
        t_box = {"rep_pos": tres.info["replica_final_positions"]}
        tres = tempered_run(random.PRNGKey(51), mt.log_prob_fn, t_init,
                            init_replica_position=t_box["rep_pos"], **tkw)
        jax.block_until_ready(tres.samples)

        def _t_rep(rep):
            t_box["res"] = tempered_run(
                random.PRNGKey(52 + rep), mt.log_prob_fn, t_init,
                init_replica_position=t_box["rep_pos"], **tkw)
            t_box["rep_pos"] = t_box["res"].info["replica_final_positions"]
            float(jnp.sum(t_box["res"].final_state.position))

        tdt = _timed_reps(_t_rep, n_reps=4)
        tres = t_box["res"]
        extras["tempered_replica_transitions_per_sec"] = round(
            t_K * t_chains * t_draws / tdt, 1)
        extras["tempered_swap_accept"] = [
            round(float(x), 3)
            for x in jnp.asarray(tres.info["swap_accept_rate"])]
        extras["tempered_cold_accept"] = round(
            float(tres.accept_rate.mean()), 3)
        print(f"[bench] tempered GRAHMC: "
              f"{extras['tempered_replica_transitions_per_sec'] / 1e6:,.1f}M"
              f" replica-transitions/s (K={t_K}, L={t_L}, "
              f"{t_chains} chains; cold accept="
              f"{extras['tempered_cold_accept']:.3f}, swaps="
              f"{extras['tempered_swap_accept']})", file=sys.stderr)
    except Exception as e:
        print(f"[bench] tempered row skipped: {e}", file=sys.stderr)

    # ---- Annealed SMC: evidence estimation on the bimodal mixture -------
    # Adaptive-schedule SMC (samplers/smc.py) from a generic wide base to
    # the 10D mixture: log_Z must read 0 (normalized target) and both
    # modes must carry mass — capability the reference lacks outright.
    # Rate counts particle-leapfrogs = P * stages * move_steps * L, with
    # each rep's realized stage count matched to ITS wall time (stage
    # counts are key-dependent under the adaptive schedule).
    try:
        import numpy as np
        from mcmc_tpu.samplers.smc import resolve_move_backend, smc_run
        from mcmc_tpu.targets import get_target as _get_target_smc
        smt = _get_target_smc("gaussian_mixture", dim=10)
        s_P, s_L, s_moves = 32768, 8, 2
        skw = dict(n_particles=s_P, dim=10, step_size=0.4, num_steps=s_L,
                   move_steps=s_moves, base_scale=6.0,
                   value_and_grad_fn=smt.value_and_grad_fn,
                   final_resample=True)
        # round 4: auto resolves to the fused bridge kernel on TPU
        extras["smc_move_backend"] = resolve_move_backend(
            "auto", smt.value_and_grad_fn, False, None)
        sres = smc_run(random.PRNGKey(60), smt.log_prob_fn, **skw)  # warm
        jax.block_until_ready(sres.particles)
        s_rates, s_last = [], sres
        for rep in range(4):
            t0 = time.time()
            s_last = smc_run(random.PRNGKey(61 + rep), smt.log_prob_fn,
                             **skw)
            jax.block_until_ready(s_last.particles)
            dt = time.time() - t0
            stages = int(s_last.info["n_stages"])
            s_rates.append(s_P * stages * s_moves * s_L / dt)
        extras["smc_particle_leapfrogs_per_sec"] = round(
            float(np.median(s_rates)), 1)
        extras["smc_log_z"] = round(float(s_last.log_Z), 5)
        extras["smc_stages"] = int(s_last.info["n_stages"])
        x0 = np.asarray(s_last.particles[:, 0])
        extras["smc_mode_fraction"] = round(float((x0 > 0).mean()), 3)
        print(f"[bench] SMC evidence: "
              f"{extras['smc_particle_leapfrogs_per_sec'] / 1e6:,.1f}M "
              f"particle-leapfrogs/s ({s_P} particles, "
              f"{extras['smc_stages']} stages); log_Z="
              f"{extras['smc_log_z']:+.4f} (true 0), mode fraction "
              f"{extras['smc_mode_fraction']}", file=sys.stderr)

        # Move-phase decomposition (round 4): the evidence row's total
        # rate is dominated by per-stage population machinery (reweight/
        # resample/refresh + dispatch), NOT the moves — measure a
        # move-dominated config plus the MARGINAL move rate from a
        # matched-ladder pair differing only in move_steps. A fixed
        # ladder pins the stage structure so the subtraction is exact.
        s_betas = np.linspace(0.08, 1.0, 13)
        mv_P, mv_L = 65536, 16
        times = {}
        for mv_m in (2, 8):
            mkw = dict(n_particles=mv_P, dim=10, step_size=0.4,
                       num_steps=mv_L, move_steps=mv_m, base_scale=6.0,
                       betas=s_betas,
                       value_and_grad_fn=smt.value_and_grad_fn)
            rr = smc_run(random.PRNGKey(70), smt.log_prob_fn, **mkw)
            float(jnp.sum(rr.particles))            # warm + force
            dts = []
            for rep in range(3):
                t0 = time.time()
                rr = smc_run(random.PRNGKey(71 + rep), smt.log_prob_fn,
                             **mkw)
                float(jnp.sum(rr.particles))
                dts.append(time.time() - t0)
            times[mv_m] = min(dts)
        lf8 = mv_P * 13 * 8 * mv_L
        extras["smc_move_dominated_leapfrogs_per_sec"] = round(
            lf8 / times[8], 1)
        # raw matched-ladder pair rather than a derived "marginal rate":
        # stage work pipelines asynchronously with the moves on this rig,
        # so wall times are NOT additive and a subtraction-based marginal
        # can exceed the kernel's physical rate (measured) — the honest
        # decomposition is the two totals side by side
        extras["smc_move_pair_ms"] = {
            "moves2": round(times[2] * 1e3, 1),
            "moves8": round(times[8] * 1e3, 1)}
        print(f"[bench] SMC move decomposition (P={mv_P}, L={mv_L}, fixed "
              f"13-rung ladder): total@8moves "
              f"{extras['smc_move_dominated_leapfrogs_per_sec'] / 1e6:,.0f}M"
              f" lf/s (run pair: {times[2] * 1e3:.0f}ms at 2 moves vs "
              f"{times[8] * 1e3:.0f}ms at 8 moves — 4x the move work for "
              f"{times[8] / times[2]:.2f}x the time)", file=sys.stderr)
    except Exception as e:
        print(f"[bench] SMC row skipped: {e}", file=sys.stderr)

    return grahmc_rate, extras, cache


def _probe_tpu(timeout_s: int = 180) -> bool:
    """True iff the TPU backend initializes within timeout_s, probed in a
    SUBPROCESS: when the remote axon tunnel is down, jax.devices() in-process
    hangs for minutes and then poisons the backend cache — measured during a
    multi-hour tunnel outage on this rig (MEMORY: tpu-tunnel-measurement)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except Exception:
        return False


def main():
    if not _probe_tpu():
        # Emit a parseable failure record instead of hanging/crashing at
        # round end: zeros are unambiguous (every real run is >>0), the
        # error field says why.
        print("[bench] TPU backend unavailable (tunnel down?) — emitting "
              "failure record", file=sys.stderr)
        print(json.dumps({
            "metric": "grahmc_chain_steps_per_sec_50d_funnel_tuned",
            "value": 0, "unit": "chain_steps/s", "vs_baseline": 0,
            "extras": {"error": "tpu backend unavailable"}}))
        return
    grahmc_rate, extras, cache = measure_tpu()

    if "grahmc_cpu" not in cache:
        cache["grahmc_cpu"] = _run_subprocess(
            _GRAHMC_BASELINE_SCRIPT % {
                "dim": DIM, "chains": CPU_CHAINS, "num_steps": NUM_STEPS,
                "samples": 100, "step": cache["grahmc_step"],
                "repo": REPO}, "GRAHMC")
        _save_cache(cache)
    if "nuts_cpu" not in cache:
        cache["nuts_cpu"] = _run_subprocess(
            _NUTS_BASELINE_SCRIPT % {
                "dim": DIM, "chains": NUTS_CPU_CHAINS, "samples": 64,
                "step": cache["nuts_step"], "repo": REPO}, "NUTS")
        _save_cache(cache)
    if "rwmh_cpu" not in cache:
        cache["rwmh_cpu"] = _run_subprocess(
            _RWMH_BASELINE_SCRIPT % {
                "dim": RWMH_DIM, "chains": RWMH_CPU_CHAINS, "samples": 200,
                "scale": RWMH_SCALE}, "RWMH")
        _save_cache(cache)

    # The CPU arm runs on THIS host — record its core count next to every
    # ratio (VERDICT r3 weak #4): chains are embarrassingly parallel, so an
    # N-core server CPU could close up to ~N x of the headline margin; the
    # per-core-equivalent ratio below is the conservative bound.
    extras["cpu_baseline_host_vcpus"] = os.cpu_count()

    base = cache["grahmc_cpu"]
    print(f"[bench] reference CPU GRAHMC baseline: "
          f"{base['chain_steps_per_sec']:.1f} chain-steps/s, "
          f"{base.get('ess_per_sec', -1):.1f} min-bulk-ESS/s "
          f"({base['chains']} chains, accept={base.get('accept', -1):.3f})",
          file=sys.stderr)
    # The north-star ratio, measured end-to-end on BOTH arms with the same
    # streaming bulk-ESS estimator (VERDICT r2 missing #1).
    if "grahmc_ess_per_sec" in extras and base.get("ess_per_sec"):
        extras["grahmc_ess_per_sec_vs_baseline"] = round(
            extras["grahmc_ess_per_sec"] / base["ess_per_sec"], 2)
        extras["grahmc_ess_ratio_per_cpu_core"] = round(
            extras["grahmc_ess_per_sec_vs_baseline"]
            / extras["cpu_baseline_host_vcpus"], 2)
        print(f"[bench] GRAHMC measured min-bulk-ESS/sec ratio (TPU/CPU): "
              f"{extras['grahmc_ess_per_sec_vs_baseline']:.1f}x vs this "
              f"{extras['cpu_baseline_host_vcpus']}-vCPU host "
              f"({extras['grahmc_ess_ratio_per_cpu_core']:.1f}x "
              f"per-CPU-core equivalent)", file=sys.stderr)
    nbase = cache["nuts_cpu"]
    print(f"[bench] reference CPU NUTS baseline: "
          f"{nbase['useful_grads_per_sec']:,.0f} useful grads/s, "
          f"{nbase.get('ess_per_sec', -1):.1f} min-bulk-ESS/s "
          f"({nbase['chains']} chains)", file=sys.stderr)
    if "nuts_useful_grads_per_sec" in extras:
        extras["nuts_vs_baseline"] = round(
            extras["nuts_useful_grads_per_sec"]
            / nbase["useful_grads_per_sec"], 2)
    if "nuts_ess_per_sec" in extras and nbase.get("ess_per_sec"):
        extras["nuts_ess_per_sec_vs_baseline"] = round(
            extras["nuts_ess_per_sec"] / nbase["ess_per_sec"], 2)
        print(f"[bench] NUTS measured min-bulk-ESS/sec ratio (TPU/CPU): "
              f"{extras['nuts_ess_per_sec_vs_baseline']:.1f}x",
              file=sys.stderr)
    rbase = cache["rwmh_cpu"]
    print(f"[bench] reference CPU RWMH baseline: "
          f"{rbase['chain_steps_per_sec']:,.0f} chain-steps/s "
          f"({rbase['chains']} chains, accept={rbase.get('accept', -1):.3f})",
          file=sys.stderr)
    if "rwmh_chain_steps_per_sec" in extras:
        extras["rwmh_vs_baseline"] = round(
            extras["rwmh_chain_steps_per_sec"]
            / rbase["chain_steps_per_sec"], 2)

    print(json.dumps({
        "metric": "grahmc_chain_steps_per_sec_50d_funnel_tuned",
        "value": round(grahmc_rate, 1),
        "unit": "chain_steps/s",
        "vs_baseline": round(grahmc_rate / base["chain_steps_per_sec"], 2),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
