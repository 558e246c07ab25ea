"""Multi-chip fused GRAHMC sampling: shard_map over the chain mesh axis.

GSPMD partitions the XLA samplers automatically (chains are communication-
free), but a pallas_call is opaque to the partitioner — the fused kernel must
be explicitly shard_mapped: each device runs the kernel on its local chain
shard with a per-device RNG stream (fold_in on the mesh axis index). The only
collectives are the final psums for the divergence totals; the sampling loop
itself stays collective-free, so this scales over ICI exactly like the XLA
path (v5p-8 target: SURVEY.md §7 step 7).

Validated on the 8-device virtual CPU mesh in tests; on TPU each shard uses
the kernel's on-chip PRNG.
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax, random
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map                      # jax >= 0.6
except ImportError:                                # pragma: no cover
    from jax.experimental.shard_map import shard_map

from mcmc_tpu.parallel import CHAIN_AXIS, shard_chains
from mcmc_tpu.samplers.base import RunResult, init_chain_state, reset_counters
from mcmc_tpu.samplers.grahmc import constant_schedule


def grahmc_run_sharded(
    key,
    target,
    init_position,
    mesh,
    step_size,
    num_steps: int,
    gamma,
    steepness,
    num_samples: int,
    burn_in: int = 0,
    inv_mass_matrix=None,
    friction_schedule: Optional[Callable] = None,
    collect_chains_per_device: int = 8,
    chain_tile: Optional[int] = None,
) -> RunResult:
    """Run fused-kernel GRAHMC with chains sharded over `mesh`'s chain axis.

    init_position: (n_chains, dim) with n_chains divisible by the mesh size.
    Collects a `collect_chains_per_device` history prefix per device
    (concatenated across devices in the output).
    """
    from mcmc_tpu.ops.fused_trajectory import make_fused_grahmc_step

    if friction_schedule is None:
        friction_schedule = constant_schedule

    n_chains, dim = init_position.shape
    n_dev = mesh.devices.size
    if n_chains % n_dev:
        raise ValueError(f"n_chains {n_chains} not divisible by mesh size {n_dev}")
    if inv_mass_matrix is None:
        inv_mass_matrix = jnp.ones(dim, jnp.float32)
    inv_mass_matrix = jnp.asarray(inv_mass_matrix, jnp.float32)

    fused = make_fused_grahmc_step(
        target.log_prob_fn, target.value_and_grad_fn, num_steps,
        friction_schedule, chain_tile=chain_tile)

    init_position = shard_chains(jnp.asarray(init_position, jnp.float32), mesh)
    scalars = (jnp.asarray(step_size, jnp.float32),
               jnp.asarray(gamma, jnp.float32),
               jnp.asarray(steepness, jnp.float32))

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(CHAIN_AXIS, None), P(), P(), P(), P()),
        out_specs=(P(None, CHAIN_AXIS, None),   # samples prefix
                   P(None, CHAIN_AXIS),          # log_probs prefix
                   P(CHAIN_AXIS),                # accept counts
                   P(CHAIN_AXIS),                # divergence counts
                   P(CHAIN_AXIS, None),          # final positions
                   P(CHAIN_AXIS),                # final log-probs
                   P(CHAIN_AXIS, None),          # final grads
                   P()),                         # global divergence total
        check_vma=False)  # pallas_call out_shapes carry no vma annotations
    def run_shard(key, local_pos, eps, gam, steep, inv_mass):
        key = random.fold_in(key, lax.axis_index(CHAIN_AXIS))
        state = init_chain_state(local_pos, target.log_prob_fn,
                                 target.value_and_grad_fn)

        def step(carry, _):
            k, s = carry
            k, s, _ = fused(k, s, eps, gam, steep, inv_mass)
            return (k, s), None

        if burn_in > 0:
            (key, state), _ = lax.scan(step, (key, state), length=burn_in)
            state = reset_counters(state)

        def sample(carry, _):
            k, s = carry
            k, s, _ = fused(k, s, eps, gam, steep, inv_mass)
            return (k, s), (s.position[:collect_chains_per_device],
                            s.log_prob[:collect_chains_per_device])

        (key, state), (samples, lps) = lax.scan(sample, (key, state),
                                                length=num_samples)
        total_div = lax.psum(jnp.sum(state.divergence_count), CHAIN_AXIS)
        return (samples, lps, state.accept_count, state.divergence_count,
                state.position, state.log_prob, state.grad_log_prob, total_div)

    (samples, lps, acc_counts, div_counts, final_pos, final_lp, final_grad,
     total_div) = run_shard(key, init_position, *scalars, inv_mass_matrix)

    accept_rate = acc_counts.astype(jnp.float32) / num_samples
    info = {
        "divergence_count": div_counts,
        "total_divergences": total_div,
        "divergence_rate": total_div.astype(jnp.float32) / (num_samples * n_chains),
        "final_positions": final_pos,
        "n_devices": n_dev,
    }
    from mcmc_tpu.samplers.base import ChainState
    final_state = ChainState(
        position=final_pos, log_prob=final_lp, grad_log_prob=final_grad,
        accept_count=acc_counts, divergence_count=div_counts)
    return RunResult(samples, lps, accept_rate, final_state, info)
