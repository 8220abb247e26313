"""iqtree_tpu — a TPU-native maximum-likelihood phylogenetics framework.

A from-scratch re-design of the capabilities of IQ-TREE (reference:
/root/reference, v1.4.3-beta) for TPU hardware: the likelihood engine is
JAX/XLA/Pallas (array-encoded trees, batched Felsenstein pruning, autodiff
branch gradients, pjit/shard_map over device meshes); the search driver,
tree bookkeeping and I/O are host-side Python/NumPy.

Layer map (mirrors SURVEY.md):
  io/        alignments (PHYLIP/FASTA/NEXUS/CLUSTAL), Newick, reports
  trees/     host tree structures, splits, consensus, BIONJ, random trees
  models/    substitution models + rate heterogeneity + model factory
  engine/    likelihood/pruning/parsimony/distance kernels (JAX + Pallas)
  search/    stochastic NNI search, candidate set, stop rule, UFBoot
  parallel/  mesh + sharding helpers
  utils/     checkpoint, optimizers, special functions, logging
"""

import os as _os

# Raise the Mosaic scoped-VMEM limit: the fused pruning kernel's working
# set at ~1000 taxa (double-buffered tips block + DMA staging, ~24MB)
# exceeds the conservative 16MB default although physical VMEM (v5e:
# 128MB) has ample room.  Harmless on CPU; must be set before libtpu
# loads, hence at package import.
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
if _VMEM_FLAG.split("=")[0] not in _os.environ.get("LIBTPU_INIT_ARGS", ""):
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG
    ).strip()


def _vmem_flag_applied() -> bool:
    """Did the raised scoped-VMEM limit take effect?  False when a TPU
    backend was already live before this package set LIBTPU_INIT_ARGS
    (library users importing jax-and-running first); the kernels' tile
    pickers then fall back to the conservative 16MB-default budget
    instead of silently OOMing (round-1 failure class)."""
    import sys as _s

    if _VMEM_FLAG not in _os.environ.get("LIBTPU_INIT_ARGS", ""):
        return False
    jaxm = _s.modules.get("jax")
    if jaxm is None:
        return True  # jax not loaded yet: libtpu will see the env var
    try:
        from jax._src import xla_bridge as _xb

        # backends dict populated => libtpu already initialized; whether
        # it saw the flag depends on who set it first.  _backends empty
        # => initialization still ahead of us.
        return not _xb._backends or _VMEM_INIT_FIRST
    except Exception:
        return True


# captured at import: was any backend live before we set the env var?
# (only checked when jax is already loaded — we must not import jax here)
import sys as _sys0

if "jax" in _sys0.modules:
    try:
        from jax._src import xla_bridge as _xb0

        _VMEM_INIT_FIRST = not _xb0._backends
    except Exception:
        _VMEM_INIT_FIRST = True
else:
    _VMEM_INIT_FIRST = True

# Mosaic's jaxpr lowering recurses per nested region; the fused reverse
# sweep (engine/kernels/pruning.py) exceeds CPython's default 1000-frame
# limit at ~1000-taxon schedules.
import sys as _sys

_sys.setrecursionlimit(max(_sys.getrecursionlimit(), 20000))

__version__ = "0.1.0"
