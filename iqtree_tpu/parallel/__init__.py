"""Device-mesh parallelism: pattern-axis sharding over TPU chips.

The reference's entire shared-memory/MPI parallelism family — OpenMP
`#pragma omp parallel for` over site patterns in every kernel
(/root/reference/phylokernel.h:252,336,411), PLL's pthreads master/worker
and fine-grained MPI backends (/root/reference/pll/
genericParallelization.c:67-282) — reduces to one pattern: each worker
owns a contiguous range of site patterns, computes partial likelihoods,
and the per-site log-likelihoods are reduced at the root.

The TPU-native equivalent is ONE SPMD program: the pattern axis of every
site-indexed array is sharded over a 1-D `sites` mesh; XLA's GSPMD
partitioner handles every XLA op (the lnL reduction becomes a psum over
ICI), and the fused Pallas pruning kernel runs per-shard under
`shard_map` (engine/kernels/pruning.py consults `get_mesh()`).
Tree topology and model parameters are replicated — they are a few KB.

Usage:
    mesh = make_mesh(n_devices)          # or make_mesh() for all devices
    with use_mesh(mesh):
        site = shard_site_data(site, mesh)
        ... everything else unchanged ...
"""

from .mesh import (  # noqa: F401
    PATTERN_AXIS,
    get_mesh,
    make_mesh,
    set_mesh,
    use_mesh,
)
from .multihost import (  # noqa: F401
    broadcast_host_data,
    init_multihost,
    is_multihost,
    sync_global_flag,
)
from .sharding import (  # noqa: F401
    pad_patterns,
    pattern_sharding,
    replicate,
    replicated_sharding,
    shard_site_data,
)
