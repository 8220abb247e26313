"""Multi-host (DCN) execution: jax.distributed + a global `sites` mesh.

The reference's only cross-process story is PLL's compiled-out
fine-grain MPI mode (/root/reference/pll/genericParallelization.c:105-282
— MPI_Init/Bcast/Barrier and a per-worker contiguous site range whose
partial log-likelihoods the master reduces).  The TPU-native equivalent
is the SAME SPMD likelihood program run over a multi-host mesh: within a
slice the lnL psum rides ICI, across hosts it rides DCN; tree topology
and model parameters are replicated, and the host-side search driver is
identical because every host executes the same Python (SURVEY §2c P6).

Usage on an N-host pod slice (same command on every host):

    from iqtree_tpu import parallel
    parallel.init_multihost(coordinator="host0:8476",
                            num_processes=N, process_id=rank)
    mesh = parallel.make_mesh()          # global device list
    parallel.set_mesh(mesh)
    ... run_search / CLI as usual ...

or via the CLI: `iqtree-tpu ... -nt 0` with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set in the environment (the standard
jax.distributed auto-bootstrap variables also work on Cloud TPU pods,
where init_multihost() with no arguments autodetects everything).

Host-side randomized search state stays consistent across processes
because every host seeds the same NumPy RNG and executes the same
deterministic driver; `broadcast_host_data` exists for the cases where
a host-side decision must be authoritative (e.g. wall-clock stopping,
which can diverge between hosts).
"""

from __future__ import annotations

import os
from typing import Optional


def init_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed for a multi-host run.

    With no arguments, relies on jax.distributed's platform
    autodetection (Cloud TPU pods) or the JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment variables.  Returns
    True if a multi-process runtime was initialized, False for
    single-process (no coordinator configured anywhere).
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator is None and num_processes is None:
        # Cloud TPU pod autodetection still works with no arguments;
        # plain single-host runs should not pay the coordinator timeout
        if os.environ.get("TPU_WORKER_HOSTNAMES") is None:
            return False
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            # hostnames set by the platform but no resolvable
            # coordinator (single-worker tunnels): stay single-process
            return False
        return jax.process_count() > 1

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def is_multihost() -> bool:
    import jax

    try:
        return jax.process_count() > 1
    except RuntimeError:
        return False


def broadcast_host_data(data, is_source: Optional[bool] = None):
    """Broadcast a small host-side object from process 0 to every host
    (the analogue of PLL's topology Bcast,
    genericParallelization.c:138-171).  Handles arbitrary picklable
    payloads — Newick strings included, which raw broadcast_one_to_all
    rejects — via a two-phase (length, bytes) array broadcast.  No-op
    in single-process runs."""
    import pickle

    import jax

    if not is_multihost():
        return data
    import numpy as np
    from jax.experimental import multihost_utils

    if is_source is None:
        is_source = jax.process_index() == 0
    buf = pickle.dumps(data) if is_source else b""
    n = multihost_utils.broadcast_one_to_all(
        np.array([len(buf)], np.int32), is_source=is_source
    )
    arr = np.frombuffer(buf.ljust(int(n[0]), b"\0"), np.uint8)
    out = multihost_utils.broadcast_one_to_all(arr, is_source=is_source)
    return pickle.loads(out.tobytes())


def sync_global_flag(flag: bool) -> bool:
    """All-hosts agreement on a boolean (e.g. the stop rule's wall-clock
    condition, which can diverge between hosts): True iff ANY host says
    True.  No-op single-process."""
    import jax

    if not is_multihost():
        return flag
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    agg = multihost_utils.process_allgather(jnp.asarray([flag]))
    return bool(agg.any())
