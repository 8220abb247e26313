"""Partitioned model selection + TESTMERGE greedy merging
(search/partition_select.py vs reference phylotesting.cpp:833)."""

import numpy as np
import jax.numpy as jnp

from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.io.partition import PartitionDef
from iqtree_tpu.io.superalignment import SuperAlignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.search.partition_select import \
    test_partition_model as select_partition_models
from iqtree_tpu.trees.tree import random_tree
from iqtree_tpu.utils.simulate import simulate_alignment


def _make_saln(seed=0, n_taxa=8, n_sites=400):
    """3 partitions: p1+p2 simulated under the same JC process on the
    same tree (should merge), p3 under a strongly asymmetric HKY on a
    4x longer tree (should stay apart)."""
    rng = np.random.default_rng(seed)
    tree = random_tree(n_taxa, rng)
    long_tree = tree.copy()
    long_tree.blen = long_tree.blen * 4.0
    names = [f"t{i}" for i in range(n_taxa)]
    jc = create_dna_model("JC")
    hky = create_dna_model("HKY")
    hky.set_rate_param_vector(np.array([15.0]))
    hky.state_freq = np.array([0.4, 0.3, 0.2, 0.1])
    rate = RateModel.make()
    parts, defs, off = [], [], 0
    for i, (subst, t) in enumerate([(jc, tree), (jc, tree),
                                    (hky, long_tree)]):
        seqs = simulate_alignment(t, subst, rate, n_sites, rng)
        parts.append(Alignment.from_sequences(names, seqs, "DNA"))
        defs.append(PartitionDef(name=f"p{i + 1}", model=None,
                                 sites=np.arange(off, off + n_sites),
                                 seq_type="DNA"))
        off += n_sites
    return SuperAlignment(names=names, partitions=parts, defs=defs)


def test_concatenate_patterns():
    saln = _make_saln()
    cat = Alignment.concatenate(saln.partitions[:2])
    assert cat.n_sites == saln.partitions[0].n_sites * 2
    assert cat.pattern_freq.sum() == cat.n_sites
    # same per-site columns survive the re-compression
    a = saln.partitions[0]
    col_a = a.patterns[:, a.site_to_pattern[3]]
    col_c = cat.patterns[:, cat.site_to_pattern[3]]
    np.testing.assert_array_equal(col_a, col_c)


def test_per_partition_selection():
    saln = _make_saln()
    scheme = select_partition_models(
        saln, dtype=jnp.float64, log=lambda s: None, rate_classes=[""],
    )
    assert len(scheme.gene_sets) == 3
    assert len(scheme.model_names) == 3
    # the asymmetric partition should not pick JC
    assert scheme.model_names[2] != "JC"
    nex = scheme.nexus_scheme(saln)
    assert "charpartition" in nex and "p3" in nex


def test_merge_joins_same_process_partitions():
    saln = _make_saln()
    scheme = select_partition_models(
        saln, dtype=jnp.float64, log=lambda s: None, merge=True,
        rate_classes=[""],
    )
    # p1+p2 (same JC process) merge; p3 (asymmetric HKY) stays separate
    sets = [sorted(g) for g in scheme.gene_sets]
    assert [0, 1] in sets, f"expected p1+p2 merged, got {sets}"
    assert [2] in sets, f"expected p3 separate, got {sets}"
    merged = scheme.merged_superalignment(saln)
    assert merged.n_parts == len(scheme.gene_sets)
    assert merged.n_sites == saln.n_sites
    assert merged.defs[0].model == scheme.model_names[0]
