"""SH-aLRT / aBayes branch tests + checkpoint round-trip."""

import os

import jax.numpy as jnp
import numpy as np

from iqtree_tpu.engine.branch_tests import test_all_branches as run_branch_tests
from iqtree_tpu.engine.derivatives import optimize_all_branches
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.utils.checkpoint import Checkpoint

from test_search import _simulate


def test_branch_tests_strong_signal():
    true_tree, aln = _simulate(n_taxa=8, n_sites=600, seed=2)
    subst, rate = parse_model_string("JC", aln)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    ta = TreeArrays.from_tree(true_tree, jnp.float64)
    ta, lnl = optimize_all_branches(ta, ma, sd)
    _, pat = compute_loglik(ta, ma, sd)
    true_tree.blen = ta.host_blen()
    bt = run_branch_tests(
        ta, ma, sd, np.asarray(pat), float(lnl), aln.n_sites, reps=500,
        rng=np.random.default_rng(0), host_tree=true_tree,
    )
    assert len(bt.edges) == aln.n_taxa - 3
    assert np.all(bt.sh_alrt >= 0) and np.all(bt.sh_alrt <= 100)
    assert np.all(bt.abayes > 0) and np.all(bt.abayes <= 1)
    # strong simulated signal: most branches strongly supported
    assert np.median(bt.sh_alrt) > 80
    assert np.median(bt.abayes) > 0.9
    labels = bt.labels(sh=True, abayes=True)
    assert all("/" in v for v in labels.values())


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "x.ckp.gz")
    ckp = Checkpoint(path)
    ckp.put("a", 1)
    ckp.start_struct("s")
    ckp.put("b", [1.5, 2.5])
    ckp.end_struct()
    ckp.put("arr", np.arange(3))
    ckp.mark_finished("model_init")
    ckp.dump(force=True)

    ckp2 = Checkpoint(path)
    assert ckp2.load()
    assert ckp2.get("a") == 1
    ckp2.start_struct("s")
    assert ckp2.get("b") == [1.5, 2.5]
    ckp2.end_struct()
    assert ckp2.get("arr") == [0, 1, 2]
    assert ckp2.is_finished("model_init")
    assert not ckp2.is_finished("all")
