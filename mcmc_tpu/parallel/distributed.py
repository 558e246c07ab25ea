"""Multi-host initialization and hybrid DCN x ICI chain meshes.

The reference is strictly single-process/single-device (SURVEY.md §5:
"Distributed communication backend: none"); this module is the TPU-native
scale-out tier above it. Chains are communication-free during sampling, so a
multi-host run is pure data parallelism over the chain axis:

- intra-slice (ICI): chains shard over the fast interconnect,
- inter-slice / multi-host (DCN): more chain shards; the only cross-host
  traffic is the diagnostics reductions at the end (psum/all_gather of
  moment accumulators — bytes, not histories).

`initialize()` wraps `jax.distributed.initialize` (no-op when single
process); `make_chain_mesh()` builds a 1-D global chain mesh over all
devices of all hosts using `create_hybrid_device_mesh` when more than one
slice is present, so chain shards land slice-major and the diagnostics
collectives ride ICI within a slice before crossing DCN once.
"""

import os
from typing import Optional

import jax
from jax.sharding import Mesh

from mcmc_tpu.parallel import CHAIN_AXIS

# Environment evidence that this process is part of a multi-host job. When
# any of these are set, a failed argument-free initialize() must NOT fall
# back to single-process: each host would silently run an independent
# duplicate job (process_count() is still 1 after a FAILED initialize, so
# it cannot distinguish 'single machine' from 'coordinator unreachable').
# Only explicit coordinator addresses qualify — TPU_WORKER_HOSTNAMES is
# also set by single-host TPU plugins (this rig's tunnel sets it), so it is
# not evidence of a multi-host job.
_DIST_ENV_HINTS = (
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Initialize the multi-host runtime; returns the local process index.

    With no arguments, uses the TPU environment's auto-detection (GKE/GCE
    metadata); explicitly a no-op in single-process settings so call sites
    can run unchanged on one host.
    """
    if num_processes is not None and num_processes <= 1:
        return 0
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError) as e:
        # Only two cases may proceed: the runtime is already initialized, or
        # this is an argument-free call on a machine with NO environment
        # evidence of a multi-host job (no coordinator address configured
        # anywhere). Both checks are structural — neither depends on JAX's
        # exception wording except the secondary already-initialized match.
        # Explicit-argument failures, and no-args failures under a
        # configured coordinator environment (e.g. a transient DCN error on
        # a GKE pod), always re-raise: swallowing them would leave every
        # host silently running an independent single-process job.
        already = "already" in str(e).lower()
        no_args = (coordinator_address is None and num_processes is None
                   and process_id is None)
        dist_env = any(os.environ.get(v) for v in _DIST_ENV_HINTS)
        if not (already or (no_args and not dist_env)):
            raise
    return jax.process_index()


def make_chain_mesh(axis_name: str = CHAIN_AXIS) -> Mesh:
    """Global 1-D chain mesh over every device of every process.

    Uses a hybrid (DCN x ICI) device ordering when multiple slices are
    detected so that contiguous chain shards stay within a slice; flattens to
    one named axis because chains are the only parallel dimension in MCMC
    (SURVEY.md §2 parallelism inventory).
    """
    devices = jax.devices()
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices > 1:
        from jax.experimental.mesh_utils import create_hybrid_device_mesh
        per_slice = len(devices) // n_slices
        dev_array = create_hybrid_device_mesh(
            mesh_shape=(per_slice,), dcn_mesh_shape=(n_slices,))
        return Mesh(dev_array.reshape(-1), (axis_name,))
    return Mesh(devices, (axis_name,))
