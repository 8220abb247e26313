"""Mesh construction and the active-mesh context.

A single 1-D mesh axis (`sites`) carries the framework's data
parallelism: site patterns are independent given the tree, so the only
cross-device communication in a likelihood evaluation is the final lnL
reduction (psum over ICI) — the same reduction pattern as the
reference's OpenMP loops and PLL-MPI backend (SURVEY.md §2c P2/P5/P6).

The active mesh is module-level context rather than a threaded-through
argument: the engine has dozens of entry points (likelihood, gradients,
NNI evaluation, UFBoot rescoring) that all shard the same single axis,
and the Pallas kernel wrappers need to know whether to shard_map
themselves.  `use_mesh` scopes it; `set_mesh` pins it for a whole run
(CLI / bench).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import numpy as np

PATTERN_AXIS = "sites"

_ACTIVE_MESH = None


def make_mesh(n_devices: Optional[int] = None, devices=None):
    """1-D device mesh over the `sites` axis.

    n_devices=None uses every visible device.  On a multi-host platform
    the caller is responsible for jax.distributed.initialize(); the mesh
    then spans the global device list and the same SPMD program scales
    over DCN (SURVEY.md §2c P6).
    """
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested {n_devices} devices, only {len(devices)} visible"
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(PATTERN_AXIS,))


def get_mesh():
    """The active mesh, or None (single-device execution)."""
    return _ACTIVE_MESH


def set_mesh(mesh) -> None:
    """Pin the active mesh for the rest of the process (CLI/bench)."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


@contextmanager
def use_mesh(mesh):
    """Scope the active mesh (tests, library callers)."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev
