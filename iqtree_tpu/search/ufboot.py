"""Ultrafast bootstrap (UFBoot, Minh et al. 2013).

Reference flow (/root/reference/iqtree.cpp:2676 saveCurrentTree,
:2803 summarizeBootstrap, computeBootstrapCorrelation): every tree visited
during the NNI search is RELL-rescored against B bootstrap pattern-weight
vectors; each sample keeps its best-scoring tree; supports = split
frequencies over the samples; convergence = correlation of split
frequencies between checkpoints >= 0.99.

TPU-native: the per-sample RELL scores for ALL B samples are one
[B, P] x [P] matvec on the MXU (the reference loops a dotProduct per
sample under OpenMP, iqtree.cpp:2724-2756).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.alignment import Alignment
from ..trees.splits import SplitCounter, consensus_tree, map_supports, tree_splits
from ..trees.tree import PhyloTree

RELL_EPSILON = 0.5  # default -beps (params.ufboot_epsilon, tools.cpp)


class UFBoot:
    def __init__(
        self,
        aln: Alignment,
        n_replicates: int,
        rng: np.random.Generator,
        dtype=jnp.float32,
        epsilon: float = RELL_EPSILON,
    ):
        self.aln = aln
        self.B = n_replicates
        # -beps: a tree whose RELL is within +-epsilon of a sample's
        # best ties with it and replaces it with probability
        # 1/(tie_count+1) (saveCurrentTree, iqtree.cpp:2738-2752)
        self.epsilon = float(epsilon)
        self._rng = rng
        self.boot_counts = np.zeros(n_replicates, dtype=np.int64)
        probs = aln.pattern_freq / aln.pattern_freq.sum()
        freqs = rng.multinomial(aln.n_sites, probs, size=n_replicates)
        self.boot_freqs = jnp.asarray(freqs, dtype=dtype)  # [B, P]
        self.boot_logl = np.full(n_replicates, -np.inf)
        self.boot_tree_id = np.full(n_replicates, -1, dtype=np.int64)
        self._trees: List[PhyloTree] = []
        self._tree_keys: Dict[frozenset, int] = {}
        self._rell = jax.jit(
            lambda pat_lnl: self.boot_freqs @ pat_lnl
        )
        self._checkpoint_freqs: Optional[np.ndarray] = None
        self.converged_correlation: Optional[float] = None

    # -- recording ------------------------------------------------------
    def save_tree(self, tree: PhyloTree, pattern_lnl: np.ndarray) -> None:
        """RELL-rescore one visited tree against all samples
        (saveCurrentTree)."""
        # engine outputs may carry inert padding patterns (mesh sharding
        # pads the pattern axis); the bootstrap matrix covers the true
        # alignment patterns only
        P = self.boot_freqs.shape[1]
        rell = np.asarray(self._rell(jnp.asarray(pattern_lnl[:P],
                                                 self.boot_freqs.dtype)))
        better = rell > self.boot_logl + self.epsilon
        near = (~better) & (rell > self.boot_logl - self.epsilon)
        rd = self._rng.uniform()
        tie_take = near & (rd <= 1.0 / (self.boot_counts + 1))
        take = better | tie_take
        if not take.any():
            return
        key = tree.splits_key()
        tid = self._tree_keys.get(key)
        if tid is None:
            tid = len(self._trees)
            self._trees.append(tree.copy())
            self._tree_keys[key] = tid
        self.boot_counts[tie_take] += 1
        self.boot_counts[better] = 1
        self.boot_logl[take] = np.maximum(self.boot_logl[take], rell[take])
        self.boot_tree_id[take] = tid

    # -- summaries ------------------------------------------------------
    def split_counter(self) -> SplitCounter:
        counter = SplitCounter(self.aln.n_taxa)
        ids, counts = np.unique(
            self.boot_tree_id[self.boot_tree_id >= 0], return_counts=True
        )
        for tid, c in zip(ids, counts):
            counter.add_tree(self._trees[int(tid)], float(c))
        return counter

    def check_convergence(self) -> float:
        """Correlation of split supports vs the previous checkpoint
        (computeBootstrapCorrelation); returns the correlation
        (1.0 means converged; <0.99 keep searching)."""
        counter = self.split_counter()
        splits = sorted(counter.counts.keys(), key=lambda s: tuple(sorted(s)))
        vec = counter.frequency_vector(splits)
        keyed = dict(zip(splits, vec))
        if self._checkpoint_freqs is None:
            self._checkpoint_freqs = keyed
            return 0.0
        all_splits = set(keyed) | set(self._checkpoint_freqs)
        a = np.array([keyed.get(s, 0.0) for s in all_splits])
        b = np.array([self._checkpoint_freqs.get(s, 0.0) for s in all_splits])
        self._checkpoint_freqs = keyed
        if a.std() < 1e-12 or b.std() < 1e-12:
            corr = 1.0
        else:
            corr = float(np.corrcoef(a, b)[0, 1])
        self.converged_correlation = corr
        return corr

    # -- checkpoint state (reference: IQTree::saveCheckpoint persists
    # boot_samples/boot_logl/boot_trees, iqtree.cpp saveCheckpoint) -----
    def state(self, names) -> dict:
        """JSON-serializable snapshot: per-sample best RELL scores, the
        per-sample best-tree ids, the distinct tree topologies, and the
        last convergence-check split frequencies."""
        return {
            "boot_logl": self.boot_logl.tolist(),
            "boot_counts": self.boot_counts.tolist(),
            "boot_tree_id": self.boot_tree_id.tolist(),
            "trees": [t.to_newick(names, precision=17)
                      for t in self._trees],
            "ckp_freqs": (
                [[sorted(k), v] for k, v in self._checkpoint_freqs.items()]
                if self._checkpoint_freqs is not None else None
            ),
        }

    def restore(self, state: dict, names) -> None:
        self.boot_logl = np.asarray(state["boot_logl"], dtype=np.float64)
        if "boot_counts" in state:
            self.boot_counts = np.asarray(state["boot_counts"],
                                          dtype=np.int64)
        self.boot_tree_id = np.asarray(state["boot_tree_id"], dtype=np.int64)
        self._trees = [
            PhyloTree.from_newick(nwk, names) for nwk in state["trees"]
        ]
        self._tree_keys = {
            t.splits_key(): i for i, t in enumerate(self._trees)
        }
        if state.get("ckp_freqs") is not None:
            self._checkpoint_freqs = {
                frozenset(members): v for members, v in state["ckp_freqs"]
            }

    def supports_for(self, tree: PhyloTree) -> Dict[int, str]:
        return map_supports(tree, self.split_counter())

    def consensus(self) -> PhyloTree:
        tree, _ = consensus_tree(self.split_counter())
        return tree

    def write_ufboot(self, path: str, names, with_lengths=False,
                     compress=False) -> None:
        """-wbt (topologies only) / -wbtl (with branch lengths,
        tools.cpp:2411); compress=True gzips (-gz)."""
        from ..utils.gzout import open_out

        with open_out(path, compress) as f:
            for tid in self.boot_tree_id:
                if tid >= 0:
                    f.write(self._trees[int(tid)].to_newick(
                        names, with_lengths=with_lengths) + "\n")

    def write_splits_nex(self, path: str, names) -> None:
        """.splits.nex split network file (reference SplitGraph::saveFile)."""
        counter = self.split_counter()
        splits = sorted(counter.counts.items(), key=lambda kv: -kv[1])
        with open(path, "w") as f:
            f.write("#nexus\n\nBEGIN Taxa;\nDIMENSIONS ntax=%d;\nTAXLABELS\n"
                    % len(names))
            for i, n in enumerate(names, 1):
                f.write(f"[{i}] '{n}'\n")
            f.write(";\nEND; [Taxa]\n\nBEGIN Splits;\n")
            f.write(f"DIMENSIONS ntax={len(names)} nsplits={len(splits)};\n")
            f.write("FORMAT labels=no weights=yes confidences=yes;\n")
            f.write("MATRIX\n")
            for s, w in splits:
                sup = 100.0 * w / max(counter.total_weight, 1e-12)
                members = " ".join(str(i + 1) for i in sorted(s))
                f.write(f"\t{sup:.1f}\t{sup:.1f}\t{members},\n")
            f.write(";\nEND; [Splits]\n")
