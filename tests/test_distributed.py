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
