"""Partitioned alignments (the SuperAlignment equivalent).

Replaces /root/reference/superalignment.h:72: one alignment per
partition over a shared taxon set.  Taxa missing from a partition (the
reference drops them from the sub-alignment and remaps ids,
superalignment.cpp) are kept here as all-unknown rows — identical
likelihood, and the shared taxon indexing lets every partition reuse ONE
tree topology (index arrays) on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .alignment import Alignment, read_raw
from .partition import PartitionDef, read_partition_file


@dataclass
class SuperAlignment:
    names: List[str]
    partitions: List[Alignment]
    defs: List[PartitionDef]

    @property
    def n_taxa(self) -> int:
        return len(self.names)

    @property
    def n_parts(self) -> int:
        return len(self.partitions)

    @property
    def n_sites(self) -> int:
        return sum(p.n_sites for p in self.partitions)

    @property
    def n_patterns(self) -> int:
        return sum(p.n_patterns for p in self.partitions)

    @property
    def states(self):  # drop-in for code expecting Alignment.states
        return self.partitions[0].states

    @property
    def num_states(self):
        return self.partitions[0].num_states

    def frac_const_sites(self) -> float:
        return sum(
            p.frac_const_sites() * p.n_sites for p in self.partitions
        ) / max(self.n_sites, 1)

    def num_informative_sites(self) -> int:
        return sum(p.num_informative_sites() for p in self.partitions)

    def bootstrap_pattern_freqs(self, rng, spec=None):
        """One bootstrap resample: per-partition pattern-frequency
        vectors (SuperAlignment::createBootstrapAlignment,
        /root/reference/superalignment.cpp:333-367).

        spec=None      resample sites within each gene (default)
        spec="GENE"    resample whole genes with replacement: each drawn
                       gene contributes its full pattern frequencies
        spec="GENESITE" draw genes, then resample sites within each draw
        """
        K = self.n_parts
        if spec and spec.upper().startswith("GENE"):
            genesite = spec.upper().startswith("GENESITE")
            freqs = [np.zeros(p.n_patterns) for p in self.partitions]
            for _ in range(K):
                part = int(rng.integers(K))
                p = self.partitions[part]
                if genesite:
                    freqs[part] += rng.multinomial(
                        p.n_sites, p.pattern_freq / p.pattern_freq.sum()
                    )
                else:
                    freqs[part] += p.pattern_freq
            return freqs
        return [p.bootstrap_pattern_freq(rng) for p in self.partitions]

    @classmethod
    def from_files(
        cls,
        aln_file: str,
        partition_file: str,
        seq_type: Optional[str] = None,
        genetic_code: int = 1,
    ) -> "SuperAlignment":
        names, seqs = read_raw(aln_file)
        n_sites = len(seqs[0])
        defs = read_partition_file(partition_file, n_sites)
        if not defs:
            raise ValueError(f"no partitions found in {partition_file}")
        used = np.concatenate([d.sites for d in defs])
        if used.max() >= n_sites:
            raise ValueError(
                f"partition site {used.max() + 1} beyond alignment length "
                f"{n_sites}"
            )
        parts = []
        for d in defs:
            sub = ["".join(s[i] for i in d.sites) for s in seqs]
            parts.append(
                Alignment.from_sequences(
                    names, sub, d.seq_type or seq_type,
                    genetic_code=genetic_code,
                )
            )
        return cls(names=list(names), partitions=parts, defs=defs)
