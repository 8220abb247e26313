"""Sharded SiteData and replication helpers.

Pattern-axis sharding is the framework's data parallelism (SURVEY.md §2c
P2): every field of SiteData whose trailing axis is the pattern axis is
split over the `sites` mesh axis; tree/model arrays are replicated.
Padding patterns are inert (pattern_freq 0, const_state -1, asc_mask 0 —
see engine/derivatives.pad_site_patterns), so padded and unpadded runs
produce identical likelihoods.
"""

from __future__ import annotations

import jax
import numpy as np

from .mesh import PATTERN_AXIS


def pattern_sharding(mesh, ndim: int = 1):
    """NamedSharding splitting the LAST axis over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * (ndim - 1) + [PATTERN_AXIS]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def pad_patterns(site, multiple: int):
    """Pad the pattern axis to a multiple (inert padding patterns)."""
    import jax.numpy as jnp

    P = site.pattern_freq.shape[0]
    P_pad = -(-P // multiple) * multiple
    if P_pad == P:
        return site
    d = P_pad - P
    return site._replace(
        tip_codes=jnp.pad(site.tip_codes, ((0, 0), (0, d))),
        pattern_freq=jnp.pad(site.pattern_freq, (0, d)),
        const_state=jnp.pad(site.const_state, (0, d), constant_values=-1),
        asc_mask=jnp.pad(site.asc_mask, (0, d)),
    )


def shard_site_data(site, mesh, lane_multiple: int = 128):
    """Pad the pattern axis to a per-shard lane multiple and device_put
    every field with its sharding (pattern-indexed fields split, code
    masks replicated).

    lane_multiple=128 keeps each shard's pattern count aligned to the
    TPU lane width; the fused kernel additionally pads its own tile
    internally, so any multiple of the mesh size is *correct* — this is
    a performance choice.
    """
    n = mesh.size
    site = pad_patterns(site, n * lane_multiple)
    sh_codes = pattern_sharding(mesh, 2)
    sh_vec = pattern_sharding(mesh, 1)
    repl = replicated_sharding(mesh)
    return site._replace(
        tip_codes=jax.device_put(site.tip_codes, sh_codes),
        code_masks=jax.device_put(site.code_masks, repl),
        pattern_freq=jax.device_put(site.pattern_freq, sh_vec),
        const_state=jax.device_put(site.const_state, sh_vec),
        asc_mask=jax.device_put(site.asc_mask, sh_vec),
    )


def replicate(pytree, mesh):
    """device_put every leaf replicated over the mesh (tree/model)."""
    repl = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl)
        if isinstance(x, (jax.Array, np.ndarray))
        else x,
        pytree,
    )
