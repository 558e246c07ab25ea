"""Multi-chip chain-parallel sampling on a TPU pod slice (e.g. v5p-8).

Chains are the only parallel axis in MCMC (SURVEY.md §2), so scaling out is
pure data parallelism over a 1-D `jax.sharding.Mesh`: every device advances
its chain shard independently — zero collectives in the sampling loop — and
only the final diagnostics reductions cross the ICI.

Three ways to go multi-chip, shown below:

1. CLI: `python run_benchmarks.py ... --mesh auto` (GSPMD for the XLA
   samplers, explicit shard_map for the fused Pallas kernels).
2. GSPMD: pass mesh-sharded positions to any XLA-path sampler; the
   partitioner splits the whole program with no code changes
   (`mcmc_tpu.parallel.shard_chains`).
3. shard_map: the fused Pallas kernels are opaque to GSPMD, so
   `mcmc_tpu.parallel.fused_sharded` wraps them per device
   (`grahmc_run_sharded`, `nuts_persistent_run_sharded`).

The ChEES trajectory tuner composes with all of this: `--trajectory-tuner
chees --mesh N` runs its warmup windows and jittered sampling shard_mapped
(the criterion's cross-chain moments psum over the chain axis) — see
examples/chees_tuning.py for the single-device walkthrough.

Run on real hardware (any pod slice; the chain count must be divisible by the device count):

    python examples/multichip_sampling.py

Without multiple accelerators it demonstrates on an 8-device virtual CPU
mesh (same code path the test suite and the driver dryrun validate).

Multi-host pods: call `mcmc_tpu.parallel.distributed.initialize()` first
(one process per host; the chain mesh spans all hosts, with contiguous
shards kept inside each ICI slice — see parallel/distributed.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU demonstration fallback: 8 virtual devices. XLA parses XLA_FLAGS once at
# first backend creation, so this must be set BEFORE importing jax (it only
# affects the CPU platform — harmless on real TPU runs). To demo without
# accelerators: JAX_PLATFORMS=cpu python examples/multichip_sampling.py
# (on this repo's test rig the platform override additionally needs
# jax.config — see tests/conftest.py).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # some environments force-register a TPU plugin via sitecustomize; make
    # an explicit cpu request stick (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.random as random

from mcmc_tpu import get_target
from mcmc_tpu.diagnostics import compute_diagnostics
from mcmc_tpu.parallel import make_mesh, shard_chains
from mcmc_tpu.parallel.fused_sharded import (
    grahmc_run_sharded, nuts_persistent_run_sharded,
)
from mcmc_tpu.samplers import nuts_run


def main():
    n_dev = len(jax.devices())
    if n_dev == 1:
        print("note: single device — the mesh code below is identical at "
              "any slice size; run JAX_PLATFORMS=cpu for an 8-device demo")
    mesh = make_mesh(n_dev)
    chains_per_device = 512 if jax.default_backend() == "tpu" else 8
    n_chains = chains_per_device * n_dev
    dim = 20
    target = get_target("neals_funnel", dim=dim)
    init = target.init_sampler(random.PRNGKey(0), n_chains)
    print(f"{n_dev} devices x {chains_per_device} chains, {dim}D funnel")

    # --- fused GRAHMC kernel, one shard per device -----------------------
    res = grahmc_run_sharded(
        random.PRNGKey(1), target, init, mesh,
        step_size=0.05, num_steps=16, gamma=1.0, steepness=0.5,
        num_samples=256, burn_in=128, collect_chains_per_device=4)
    d = compute_diagnostics(res.samples)
    print(f"GRAHMC sharded: accept={float(res.accept_rate.mean()):.3f} "
          f"rhat_max={d['rhat_max']:.3f} "
          f"divergences={int(res.info['total_divergences'])}")

    # --- fused persistent-NUTS windows, one machine per device -----------
    nres = nuts_persistent_run_sharded(
        random.PRNGKey(2), target, init, mesh,
        step_size=0.1, num_samples=32, steps_per_sample=32,
        burn_in_steps=64, collect_chains_per_device=4)
    print(f"NUTS sharded: accept={float(nres.accept_rate.mean()):.3f} "
          f"useful leapfrogs={int(nres.info['n_leapfrogs']):,} "
          f"mean depth={float(nres.info['mean_tree_depth'].mean()):.2f}")

    # --- GSPMD: shard the inputs, run the unmodified XLA sampler ---------
    sharded_init = shard_chains(init, mesh)
    xres = nuts_run(random.PRNGKey(3), target.log_prob_fn, sharded_init,
                    step_size=0.1, num_samples=64, burn_in=32,
                    value_and_grad_fn=target.value_and_grad_fn)
    print(f"NUTS GSPMD: accept={float(xres.accept_rate.mean()):.3f} "
          f"(positions stayed sharded: "
          f"{xres.final_state.position.sharding})")


if __name__ == "__main__":
    main()
