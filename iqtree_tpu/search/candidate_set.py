"""Bounded population of best candidate trees, keyed by topology.

Equivalent of CandidateSet (/root/reference/candidateset.h:51): a
score-ordered map of the best `max_size` distinct topologies; perturbation
picks a random tree among the top `pop_size` (getRandCandTree :74).
Stable-split bookkeeping (:265) will hook in here later.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..trees.tree import PhyloTree


@dataclass
class CandidateSet:
    max_size: int = 10
    pop_size: int = 5
    entries: Dict[frozenset, Tuple[float, PhyloTree]] = field(default_factory=dict)

    def update(self, tree: PhyloTree, score: float) -> bool:
        """Insert/refresh; returns True if the tree entered the top set as
        a new topology or improved score (candidateset.h update :109)."""
        # store canonical encodings: checkpoint restore goes through a
        # newick round trip, and perturbation determinism across resume
        # requires the live and restored array encodings to be identical
        # (PhyloTree.canonical)
        key = tree.splits_key()
        if key in self.entries:
            if score > self.entries[key][0]:
                self.entries[key] = (score, tree.canonical())
                return True
            return False
        self.entries[key] = (score, tree.canonical())
        if len(self.entries) > self.max_size:
            worst = min(self.entries, key=lambda k: self.entries[k][0])
            removed_new = worst == key
            del self.entries[worst]
            if removed_new:
                return False
        return True

    @staticmethod
    def _topo_rank(key) -> str:
        """Content-derived tiebreak for equal scores: checkpoint restore
        rebuilds the dict in score order while a live run holds
        insertion order, so an insertion-order tiebreak breaks
        resume determinism (random_candidate would pick different
        trees after a resume)."""
        import hashlib

        parts = sorted(tuple(sorted(s)) for s in key)
        return hashlib.md5(repr(parts).encode()).hexdigest()

    def sorted_entries(self) -> List[Tuple[float, PhyloTree]]:
        return [v for _, v in sorted(
            self.entries.items(),
            key=lambda kv: (-kv[1][0], self._topo_rank(kv[0])))]

    @property
    def best_score(self) -> float:
        return max((s for s, _ in self.entries.values()), default=-np.inf)

    def best_tree(self) -> Optional[PhyloTree]:
        ent = self.sorted_entries()
        return ent[0][1].copy() if ent else None

    def random_candidate(self, rng: np.random.Generator) -> PhyloTree:
        top = self.sorted_entries()[: self.pop_size]
        idx = int(rng.integers(len(top)))
        return top[idx][1].copy()

    def contains(self, tree: PhyloTree) -> bool:
        return tree.splits_key() in self.entries

    def stable_splits(self, num_support: int = 20):
        """Splits with 100% support among the `num_support` best trees
        (computeSplitSupport, candidateset.cpp:188-196; default
        numSupportTrees=20, tools.cpp:884).  Empty until that many
        candidates exist."""
        ent = self.sorted_entries()
        if len(ent) < max(2, min(num_support, self.max_size)):
            return frozenset()
        from ..trees.splits import tree_splits

        take = ent[: num_support]
        common = None
        for _, t in take:
            sp = frozenset(tree_splits(t))
            common = sp if common is None else (common & sp)
            if not common:
                break
        return common or frozenset()
