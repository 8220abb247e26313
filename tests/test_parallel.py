"""Pattern-axis sharding: the production multi-device path.

Verifies that the PRODUCTION code path (parallel.make_mesh + sharded
SiteData via the from_alignment choke point + fused Pallas kernel under
shard_map + custom-VJP gradients) produces results identical to
single-device execution on an 8-virtual-device CPU mesh — the TPU-native
replacement for the reference's OpenMP/PLL parallelism (SURVEY.md §2c
P2/P5/P6; /root/reference/pll/genericParallelization.c:105-282).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iqtree_tpu import parallel
from iqtree_tpu.engine.grad import loglik_fused_fn
from iqtree_tpu.engine.kernels.pruning import (
    device_slot_schedule,
    fused_compute_loglik,
)
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.trees.tree import PhyloTree


@pytest.fixture(scope="module")
def setup():
    aln = read_alignment("tests/data/example.phy")
    tree = PhyloTree.from_newick(
        open("tests/data/golden_tree_44.nwk").read(), aln.names
    )
    subst, rate = parse_model_string("GTR+G", aln)
    ma = ModelArrays.from_model(subst, rate, jnp.float32)
    site = SiteData.from_alignment(aln, jnp.float32)
    ta = TreeArrays.from_tree(tree, jnp.float32)
    steps, n_slots = device_slot_schedule(tree, ta)
    return aln, ta, ma, site, jnp.asarray(steps), n_slots


def test_meshes_require_enough_devices():
    with pytest.raises(ValueError):
        parallel.make_mesh(10_000)


def test_sharded_fused_lnl_matches_single_device(setup):
    aln, ta, ma, site, steps, n_slots = setup
    lnl1, slnl1 = jax.jit(
        lambda: fused_compute_loglik(ta, ma, site, steps, n_slots)
    )()
    mesh = parallel.make_mesh(8)
    with parallel.use_mesh(mesh):
        site_s = SiteData.from_alignment(aln, jnp.float32)  # auto-shards
        assert site_s.pattern_freq.shape[0] % 8 == 0
        ta_s = parallel.replicate(ta, mesh)
        lnl8, slnl8 = jax.jit(
            lambda: fused_compute_loglik(ta_s, ma, site_s, steps, n_slots)
        )()
    P0 = site.pattern_freq.shape[0]
    assert float(lnl8) == pytest.approx(float(lnl1), abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(slnl8)[:P0], np.asarray(slnl1), rtol=1e-6
    )


def test_sharded_xla_path_matches(setup):
    aln, ta, ma, site, steps, n_slots = setup
    lnl1, _ = jax.jit(compute_loglik)(ta, ma, site)
    mesh = parallel.make_mesh(8)
    with parallel.use_mesh(mesh):
        site_s = SiteData.from_alignment(aln, jnp.float32)
        lnl8, _ = jax.jit(compute_loglik)(ta, ma, site_s)
    # padding changes the f64 reduction order; rel 1e-8 is still far
    # below every optimizer tolerance
    assert float(lnl8) == pytest.approx(float(lnl1), rel=1e-8)


def test_sharded_gradients_match(setup):
    aln, ta, ma, site, steps, n_slots = setup
    lfn = loglik_fused_fn(n_slots)
    g1 = jax.jit(
        jax.grad(lambda b: lfn(ta.with_blen(b), ma, site, steps)[0])
    )(ta.blen)
    mesh = parallel.make_mesh(8)
    with parallel.use_mesh(mesh):
        site_s = SiteData.from_alignment(aln, jnp.float32)
        ta_s = parallel.replicate(ta, mesh)
        g8 = jax.jit(
            jax.grad(lambda b: lfn(ta_s.with_blen(b), ma, site_s, steps)[0])
        )(ta_s.blen)
    np.testing.assert_allclose(
        np.asarray(g8), np.asarray(g1), rtol=2e-4, atol=1e-5
    )


def test_pad_patterns_inert(setup):
    """Padded patterns must not change the likelihood at all."""
    aln, ta, ma, site, steps, n_slots = setup
    lnl1, _ = jax.jit(compute_loglik)(ta, ma, site)
    site_p = parallel.pad_patterns(site, 64)
    lnl2, _ = jax.jit(compute_loglik)(ta, ma, site_p)
    assert float(lnl2) == pytest.approx(float(lnl1), rel=1e-8)


def test_multihost_helpers_single_process():
    """Multi-host utilities must be safe no-ops in single-process runs
    (the real multi-process path needs a pod slice; SURVEY §2c P6)."""
    from iqtree_tpu.parallel import (
        broadcast_host_data,
        init_multihost,
        is_multihost,
        sync_global_flag,
    )

    # no coordinator configured anywhere -> stays single-process
    assert init_multihost() is False
    assert is_multihost() is False
    data = {"tree": "(a,b);", "lnl": -123.4}
    assert broadcast_host_data(data) == data
    assert sync_global_flag(True) is True
    assert sync_global_flag(False) is False
