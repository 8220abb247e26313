"""Alignments: readers, state encoding, site-pattern compression.

Host-side (NumPy) data model replacing the reference's Alignment/Pattern
classes (/root/reference/alignment.h:50, pattern.h:24).  Sites are
compressed to unique weighted patterns; ambiguity codes are kept as integer
codes >= num_states with a code->state indicator table, so the device
kernels can turn any tip code into a tip partial-likelihood row by a single
gather (the TPU-native analogue of computeTipPartialLikelihood,
/root/reference/phylotreesse.cpp:359-460).

Supported formats: PHYLIP (sequential + interleaved), FASTA, NEXUS data
block, CLUSTAL, MSF (/root/reference/alignment.h:109-143).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Sequence types and state encodings
# ---------------------------------------------------------------------------

SEQ_DNA = "DNA"
SEQ_PROTEIN = "AA"
SEQ_BINARY = "BIN"
SEQ_MORPH = "MORPH"
SEQ_CODON = "CODON"

# DNA: states 0..3 = A,C,G,T; ambiguity codes are extra integer codes with an
# appearance bitmask over {A,C,G,T} (cf. /root/reference/alignment.cpp
# convertState: R=A|G, Y=C|T, W=A|T, S=C|G, M=A|C, K=G|T, B/H/D/V, N/?/-=any).
_DNA_CODES: Dict[str, Tuple[int, ...]] = {
    "A": (0,), "C": (1,), "G": (2,), "T": (3,), "U": (3,),
    "R": (0, 2), "Y": (1, 3), "W": (0, 3), "S": (1, 2),
    "M": (0, 1), "K": (2, 3),
    "B": (1, 2, 3), "H": (0, 1, 3), "D": (0, 2, 3), "V": (0, 1, 2),
    "N": (0, 1, 2, 3), "X": (0, 1, 2, 3), "O": (0, 1, 2, 3),
    "?": (0, 1, 2, 3), "-": (0, 1, 2, 3), ".": (0, 1, 2, 3), "~": (0, 1, 2, 3),
}

_AA_ORDER = "ARNDCQEGHILKMFPSTWYV"  # standard 20-state ordering (reference order)
_AA_CODES: Dict[str, Tuple[int, ...]] = {c: (i,) for i, c in enumerate(_AA_ORDER)}
_AA_CODES.update({
    "B": (_AA_ORDER.index("N"), _AA_ORDER.index("D")),
    "Z": (_AA_ORDER.index("Q"), _AA_ORDER.index("E")),
    "J": (_AA_ORDER.index("I"), _AA_ORDER.index("L")),
    "U": (_AA_ORDER.index("C"),),  # selenocysteine -> C (reference maps U->C? keep permissive)
    "X": tuple(range(20)), "*": tuple(range(20)),
    "?": tuple(range(20)), "-": tuple(range(20)), ".": tuple(range(20)), "~": tuple(range(20)),
})

_BIN_CODES: Dict[str, Tuple[int, ...]] = {
    "0": (0,), "1": (1,),
    "?": (0, 1), "-": (0, 1), ".": (0, 1), "~": (0, 1),
}


def _morph_codes(num_states: int) -> Dict[str, Tuple[int, ...]]:
    codes: Dict[str, Tuple[int, ...]] = {}
    digits = "0123456789ABCDEFGHIJKLMNOPQRSTUV"
    for i in range(num_states):
        codes[digits[i]] = (i,)
    allstates = tuple(range(num_states))
    for c in "?-.~":
        codes[c] = allstates
    return codes


@dataclass
class StateSpace:
    """Maps characters <-> integer codes and codes -> state indicator masks.

    Codes 0..num_states-1 are definite states; further codes are ambiguity
    classes.  `code_masks[c]` is a float [num_states] 0/1 indicator of
    states consistent with code c; the all-ones row is the unknown code.
    """

    seq_type: str
    num_states: int
    char_to_code: Dict[str, int]
    code_masks: np.ndarray  # [num_codes, num_states] float32
    code_chars: List[str]
    genetic_code: Optional[int] = None  # codon alignments only
    state_to_codon: Optional[np.ndarray] = None  # [S] codon index 0..63
    codon_to_state: Optional[np.ndarray] = None  # [64]; -1 = stop codon

    @property
    def unknown_code(self) -> int:
        return self.char_to_code["?"]

    @classmethod
    def make(
        cls,
        seq_type: str,
        num_states: Optional[int] = None,
        genetic_code: int = 1,
    ) -> "StateSpace":
        if seq_type == SEQ_CODON:
            return cls._make_codon(genetic_code)
        if seq_type == SEQ_DNA:
            table, ns = _DNA_CODES, 4
        elif seq_type == SEQ_PROTEIN:
            table, ns = _AA_CODES, 20
        elif seq_type == SEQ_BINARY:
            table, ns = _BIN_CODES, 2
        elif seq_type == SEQ_MORPH:
            ns = num_states or 2
            table = _morph_codes(ns)
        else:
            raise ValueError(f"unsupported seq type {seq_type}")
        # Deduplicate by state-set: definite states first, then ambiguity sets.
        set_to_code: Dict[Tuple[int, ...], int] = {(i,): i for i in range(ns)}
        masks: List[Tuple[int, ...]] = [(i,) for i in range(ns)]
        char_to_code: Dict[str, int] = {}
        code_chars: List[str] = [c for c, s in table.items() if len(s) == 1 and s[0] < ns][:ns]
        # ensure canonical char for definite states
        code_chars = [None] * ns  # type: ignore
        for c, states in table.items():
            if len(states) == 1 and code_chars[states[0]] is None:
                code_chars[states[0]] = c
        for c, states in table.items():
            key = tuple(sorted(states))
            if key not in set_to_code:
                set_to_code[key] = len(masks)
                masks.append(key)
                code_chars.append(c)
            char_to_code[c] = set_to_code[key]
        m = np.zeros((len(masks), ns), dtype=np.float32)
        for code, states in enumerate(masks):
            m[code, list(states)] = 1.0
        return cls(seq_type, ns, char_to_code, m, code_chars)

    @classmethod
    def _make_codon(cls, genetic_code: int) -> "StateSpace":
        """61-ish-state codon space (state order: sense codons by ACGT-
        lexicographic index, matching the reference's convertState for
        SEQ_CODON, /root/reference/alignment.cpp)."""
        from ..models.codon import genetic_code_table, sense_codons

        tab = genetic_code_table(genetic_code)
        sc = sense_codons(genetic_code)
        ns = len(sc)
        codon_to_state = np.full(64, -1, dtype=np.int32)
        codon_to_state[sc] = np.arange(ns, dtype=np.int32)
        masks = np.concatenate(
            [np.eye(ns, dtype=np.float32), np.ones((1, ns), np.float32)]
        )
        return cls(
            seq_type=SEQ_CODON,
            num_states=ns,
            char_to_code={"?": ns},
            code_masks=masks,
            code_chars=[],
            genetic_code=genetic_code,
            state_to_codon=sc,
            codon_to_state=codon_to_state,
        )

    def encode(self, seq: str) -> np.ndarray:
        if self.seq_type == SEQ_CODON:
            return self._encode_codon(seq)
        out = np.empty(len(seq), dtype=np.int32)
        c2c = self.char_to_code
        unknown = self.unknown_code
        for i, ch in enumerate(seq):
            code = c2c.get(ch.upper())
            if code is None:
                raise ValueError(f"invalid character {ch!r} for {self.seq_type}")
            out[i] = code
        return out

    def _encode_codon(self, seq: str) -> np.ndarray:
        """Triplets of definite nucleotides -> codon states; any ambiguity
        or gap in the triplet -> unknown; stop codons are an error
        (reference Alignment::convertState for SEQ_CODON)."""
        if len(seq) % 3 != 0:
            raise ValueError(
                f"codon sequence length {len(seq)} is not a multiple of 3"
            )
        nt = {"A": 0, "C": 1, "G": 2, "T": 3, "U": 3}
        out = np.empty(len(seq) // 3, dtype=np.int32)
        unknown = self.num_states
        for i in range(0, len(seq), 3):
            tri = seq[i:i + 3].upper()
            a, b, c = nt.get(tri[0]), nt.get(tri[1]), nt.get(tri[2])
            if a is None or b is None or c is None:
                out[i // 3] = unknown
                continue
            st = self.codon_to_state[16 * a + 4 * b + c]
            if st < 0:
                raise ValueError(
                    f"stop codon {tri} at nucleotide position {i + 1}"
                )
            out[i // 3] = st
        return out


def detect_seq_type(seqs: List[str]) -> str:
    """Heuristic sequence-type detection like Alignment::detectSequenceType
    (/root/reference/alignment.cpp)."""
    counts: Dict[str, int] = {}
    total = 0
    for s in seqs:
        for ch in s.upper():
            if ch in "?-.~NX":
                continue
            counts[ch] = counts.get(ch, 0) + 1
            total += 1
    if total == 0:
        return SEQ_DNA
    dna = sum(counts.get(c, 0) for c in "ACGTU")
    binary = sum(counts.get(c, 0) for c in "01")
    digits = sum(counts.get(c, 0) for c in "0123456789")
    if binary / total > 0.9:
        return SEQ_BINARY
    if digits / total > 0.9:
        return SEQ_MORPH
    if dna / total > 0.85:
        return SEQ_DNA
    return SEQ_PROTEIN


# ---------------------------------------------------------------------------
# Alignment
# ---------------------------------------------------------------------------


@dataclass
class Alignment:
    """Pattern-compressed multiple sequence alignment.

    patterns:     int32 [n_taxa, n_patterns] integer codes
    pattern_freq: float64 [n_patterns] site counts per pattern
    site_to_pattern: int32 [n_sites]
    const_state:  int32 [n_patterns]; -1 = not invariant-compatible,
                  num_states = all-unknown column, else the constant state
                  (semantics of Pattern::const_char,
                  /root/reference/alignment.cpp computeConst)
    """

    names: List[str]
    patterns: np.ndarray
    pattern_freq: np.ndarray
    site_to_pattern: np.ndarray
    states: StateSpace
    is_informative: np.ndarray = field(default=None)  # [n_patterns] bool

    @property
    def n_taxa(self) -> int:
        return self.patterns.shape[0]

    @property
    def n_patterns(self) -> int:
        return self.patterns.shape[1]

    @property
    def n_sites(self) -> int:
        return int(self.site_to_pattern.shape[0])

    @property
    def num_states(self) -> int:
        return self.states.num_states

    @property
    def const_state(self) -> np.ndarray:
        return self._const_state

    def __post_init__(self):
        self._compute_const_informative()

    def _compute_const_informative(self):
        masks = self.states.code_masks  # [codes, S]
        pat_masks = masks[self.patterns]  # [taxa, ptn, S]
        inter = pat_masks.min(axis=0)  # [ptn, S] intersection of appearances
        count = inter.sum(axis=1)
        ns = self.num_states
        const_state = np.full(self.n_patterns, -1, dtype=np.int32)
        all_unknown = count == ns
        const_state[all_unknown] = ns
        single = count == 1
        const_state[single] = inter[single].argmax(axis=1)
        self._const_state = const_state
        # parsimony-informative: >=2 states appearing >=2 times (ambiguous
        # codes count toward every consistent state, cf. computeConst)
        app_counts = pat_masks.sum(axis=0)  # [ptn, S] appearances per state
        definite = self.patterns < ns
        # reference counts ambiguous (non-unknown) toward all consistent states;
        # unknown chars are skipped
        unknown = self.patterns == self.states.unknown_code
        adj = pat_masks * (~unknown[:, :, None])
        app_counts = adj.sum(axis=0)
        self.is_informative = (app_counts >= 2).sum(axis=1) >= 2

    # -- derived quantities used by the engine/report --------------------

    def state_frequencies(self) -> np.ndarray:
        """Empirical state frequencies (+F), matching the reference's
        EM-style estimator: 8 rounds of distributing each (possibly
        ambiguous) character over its consistent states in proportion to
        the current frequency estimate, then flooring at MIN_FREQUENCY
        with re-normalization onto the largest state
        (Alignment::computeStateFreq + convfreq,
        /root/reference/alignment.cpp:2714-2784)."""
        S = self.num_states
        masks = self.states.code_masks  # [codes, S]
        counts = np.bincount(
            self.patterns.ravel(),
            weights=np.broadcast_to(
                self.pattern_freq, self.patterns.shape
            ).ravel(),
            minlength=masks.shape[0],
        )
        freq = np.full(S, 1.0 / S)
        for _ in range(8):
            w = freq[None, :] * masks  # [codes, S]
            w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-300)
            new = (w * counts[:, None]).sum(axis=0)
            freq = new / new.sum()
        # convfreq: floor + dump the residual onto the most frequent state
        min_freq = 1e-4
        below = freq < min_freq
        freq[below] = min_freq
        freq[np.argmax(freq)] += 1.0 - freq.sum()
        return freq

    def frac_const_sites(self) -> float:
        isconst = self._const_state >= 0
        return float(self.pattern_freq[isconst].sum() / self.pattern_freq.sum())

    def frac_invariant_sites(self) -> float:
        """Fraction of single-state constant sites (no ambiguity)."""
        ns = self.num_states
        isconst = (self._const_state >= 0) & (self._const_state < ns)
        definite = (self.patterns < ns).all(axis=0) | ((self.patterns == self.states.unknown_code).all(axis=0))
        return float(self.pattern_freq[isconst].sum() / self.pattern_freq.sum())

    def num_informative_sites(self) -> int:
        return int(self.pattern_freq[self.is_informative].sum())

    def bootstrap_pattern_freq(self, rng: np.random.Generator) -> np.ndarray:
        """One bootstrap resample as a pattern-frequency vector
        (Alignment::createBootstrapAlignment, /root/reference/alignment.h:383)."""
        probs = self.pattern_freq / self.pattern_freq.sum()
        return rng.multinomial(self.n_sites, probs).astype(np.float64)

    def codon_nt_frequencies(self, by_position: bool = True) -> np.ndarray:
        """[3, 4] position-specific nucleotide frequencies from the codon
        data (F3X4); rows identical when by_position=False (F1X4).
        (ModelCodon ntfreq computation, modelcodon.cpp init)."""
        assert self.states.seq_type == SEQ_CODON
        sc = self.states.state_to_codon
        counts = np.zeros((3, 4))
        ns = self.num_states
        for p in range(self.n_patterns):
            w = self.pattern_freq[p]
            for code in self.patterns[:, p]:
                if code >= ns:
                    continue
                c = sc[code]
                counts[0, c // 16] += w
                counts[1, (c // 4) % 4] += w
                counts[2, c % 4] += w
        if not by_position:
            counts = np.broadcast_to(counts.sum(0), (3, 4)).copy()
        counts = np.maximum(counts, 1e-6)
        return counts / counts.sum(axis=1, keepdims=True)

    @classmethod
    def from_sequences(
        cls,
        names: List[str],
        seqs: List[str],
        seq_type: Optional[str] = None,
        num_states: Optional[int] = None,
        genetic_code: int = 1,
    ) -> "Alignment":
        if len(set(len(s) for s in seqs)) != 1:
            lens = {n: len(s) for n, s in zip(names, seqs)}
            raise ValueError(f"sequences have unequal lengths: {lens}")
        if seq_type is None:
            seq_type = detect_seq_type(seqs)
        if seq_type == SEQ_MORPH and num_states is None:
            # infer the state count from the data like the reference
            # (Alignment::buildPattern counts distinct morph states,
            # alignment.cpp): highest used symbol + 1, at least binary
            alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUV"
            mx = 1
            for s in seqs:
                for ch in s:
                    i = alphabet.find(ch.upper())
                    if i > mx:
                        mx = i
            num_states = mx + 1
        states = StateSpace.make(seq_type, num_states, genetic_code)
        mat = np.stack([states.encode(s) for s in seqs])  # [taxa, sites]
        # pattern compression: unique columns with counts
        cols = np.ascontiguousarray(mat.T)
        uniq, site_to_pattern, counts = np.unique(
            cols, axis=0, return_inverse=True, return_counts=True
        )
        patterns = np.ascontiguousarray(uniq.T).astype(np.int32)
        return cls(
            names=list(names),
            patterns=patterns,
            pattern_freq=counts.astype(np.float64),
            site_to_pattern=site_to_pattern.astype(np.int32),
            states=states,
        )

    def identical_groups(self):
        """Duplicate-sequence detection (Alignment::removeIdenticalSeq,
        /root/reference/alignment.cpp; driver hook
        PhyloTree::removeIdenticalSeqs, phylotree.cpp:4326).

        Returns (keep_idx [list of taxon indices to analyse],
        removed_pairs [(removed_name, twin_name), ...]) where each
        removed sequence is byte-identical to its (first-seen) twin."""
        seen = {}
        keep = []
        pairs = []
        for i in range(self.n_taxa):
            key = self.patterns[i].tobytes()
            j = seen.get(key)
            if j is None:
                seen[key] = i
                keep.append(i)
            else:
                pairs.append((self.names[i], self.names[j]))
        return keep, pairs

    def subset_taxa(self, keep) -> "Alignment":
        """Alignment restricted to the given taxon indices (pattern
        re-compression included: dropping rows can merge columns)."""
        cols = self.patterns[np.ix_(keep, self.site_to_pattern)]
        uniq, s2p, counts = np.unique(
            np.ascontiguousarray(cols.T), axis=0,
            return_inverse=True, return_counts=True,
        )
        return Alignment(
            names=[self.names[i] for i in keep],
            patterns=np.ascontiguousarray(uniq.T).astype(np.int32),
            pattern_freq=counts.astype(np.float64),
            site_to_pattern=s2p.astype(np.int32),
            states=self.states,
        )

    def add_const_patterns(self, spec: str) -> "Alignment":
        """-fconst: append fully-constant patterns with the given
        per-state site counts, e.g. "10,20,15,40" adds 10 all-A, 20
        all-C, ... columns (Alignment::addConstPatterns,
        /root/reference/alignment.cpp; parse at tools.cpp:1902)."""
        counts = [int(x) for x in spec.split(",")]
        if len(counts) != self.num_states:
            raise ValueError(
                f"-fconst expects {self.num_states} comma-separated "
                f"counts for {self.states.seq_type} data, got {len(counts)}"
            )
        patterns = self.patterns
        freq = self.pattern_freq.copy()
        extra_sites = []
        new_cols = []
        existing = {
            np.ascontiguousarray(patterns[:, p]).tobytes(): p
            for p in range(self.n_patterns)
        }
        for s, c in enumerate(counts):
            if c <= 0:
                continue
            col = np.full(self.n_taxa, s, dtype=patterns.dtype)
            p = existing.get(col.tobytes())
            if p is not None:
                freq[p] += c
            else:
                p = self.n_patterns + len(new_cols)
                new_cols.append(col)
                freq = np.concatenate([freq, [float(c)]])
            extra_sites.extend([p] * c)
        if new_cols:
            patterns = np.concatenate(
                [patterns, np.stack(new_cols, axis=1)], axis=1
            )
        return Alignment(
            names=list(self.names),
            patterns=np.ascontiguousarray(patterns),
            pattern_freq=freq,
            site_to_pattern=np.concatenate(
                [self.site_to_pattern,
                 np.asarray(extra_sites, dtype=np.int32)]
            ),
            states=self.states,
        )

    @classmethod
    def concatenate(cls, parts: List["Alignment"]) -> "Alignment":
        """Concatenate alignments over the same taxon set at the pattern
        level (SuperAlignment::concatenateAlignments,
        /root/reference/superalignment.cpp), re-compressing identical
        patterns across the inputs with weight-aware counts."""
        first = parts[0]
        for p in parts[1:]:
            if p.names != first.names:
                raise ValueError("concatenate: taxon sets differ")
            if p.states.seq_type != first.states.seq_type or \
                    p.num_states != first.num_states:
                raise ValueError("concatenate: sequence types differ")
        pats = np.hstack([p.patterns for p in parts])
        freqs = np.concatenate([p.pattern_freq for p in parts])
        s2p_parts, off = [], 0
        for p in parts:
            s2p_parts.append(p.site_to_pattern + off)
            off += p.n_patterns
        s2p_all = np.concatenate(s2p_parts)
        cols = np.ascontiguousarray(pats.T)
        uniq, inv = np.unique(cols, axis=0, return_inverse=True)
        freq_new = np.bincount(inv, weights=freqs, minlength=uniq.shape[0])
        return cls(
            names=list(first.names),
            patterns=np.ascontiguousarray(uniq.T).astype(np.int32),
            pattern_freq=freq_new.astype(np.float64),
            site_to_pattern=inv[s2p_all].astype(np.int32),
            states=first.states,
        )


# ---------------------------------------------------------------------------
# File readers (PHYLIP / FASTA / NEXUS / CLUSTAL)
# ---------------------------------------------------------------------------


def read_alignment(
    path: str,
    seq_type: Optional[str] = None,
    fmt: Optional[str] = None,
    genetic_code: int = 1,
) -> Alignment:
    """Read an alignment with format auto-detection
    (cf. Alignment ctor dispatch, /root/reference/alignment.cpp readFile)."""
    with open(path) as f:
        text = f.read()
    if not text.strip():
        raise ValueError(f"alignment file {path} is empty")
    if fmt is None:
        head = text.lstrip()[:10].upper()
        first_line = text.lstrip().splitlines()[0].upper()
        if head.startswith(">"):
            fmt = "fasta"
        elif head.startswith("#NEXUS"):
            fmt = "nexus"
        elif head.startswith("CLUSTAL"):
            fmt = "clustal"
        elif "MULTIPLE_ALIGNMENT" in first_line:
            fmt = "msf"
        else:
            fmt = "phylip"
    names, seqs = _READERS[fmt](text)
    return Alignment.from_sequences(
        names, seqs, seq_type, genetic_code=genetic_code
    )


def read_raw(path: str, fmt: Optional[str] = None):
    """(names, seqs) without encoding/compression — used by the
    partition splitter (io/superalignment.py)."""
    with open(path) as f:
        text = f.read()
    if not text.strip():
        raise ValueError(f"alignment file {path} is empty")
    if fmt is None:
        first_line = text.lstrip().splitlines()[0].upper()
        head = first_line[:10]
        if head.startswith(">"):
            fmt = "fasta"
        elif head.startswith("#NEXUS"):
            fmt = "nexus"
        elif head.startswith("CLUSTAL"):
            fmt = "clustal"
        elif "MULTIPLE_ALIGNMENT" in first_line:
            fmt = "msf"
        else:
            fmt = "phylip"
    return _READERS[fmt](text)


def _read_fasta(text: str):
    names, seqs, cur = [], [], []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
                cur = []
            names.append(line[1:].split()[0])
        else:
            cur.append(line.replace(" ", ""))
    if cur:
        seqs.append("".join(cur))
    if not names:
        raise ValueError("empty FASTA file")
    return names, seqs


def _read_phylip(text: str):
    lines = [l for l in text.splitlines() if l.strip()]
    m = re.match(r"\s*(\d+)\s+(\d+)", lines[0])
    if not m:
        raise ValueError("bad PHYLIP header")
    ntax, nsites = int(m.group(1)), int(m.group(2))
    names: List[str] = []
    seqs: List[List[str]] = []
    idx = 0
    for line in lines[1:]:
        if len(names) < ntax:
            parts = line.split(None, 1)
            if len(parts) == 1:
                name, rest = parts[0], ""
            else:
                name, rest = parts
            names.append(name)
            seqs.append([rest.replace(" ", "")])
        else:  # interleaved continuation
            seqs[idx % ntax].append(line.replace(" ", ""))
            idx += 1
    out = ["".join(chunks) for chunks in seqs]
    for n, s in zip(names, out):
        if len(s) != nsites:
            raise ValueError(f"sequence {n}: {len(s)} chars, expected {nsites}")
    return names, out


def _read_clustal(text: str):
    lines = text.splitlines()
    order: List[str] = []
    chunks: Dict[str, List[str]] = {}
    for line in lines[1:]:
        if not line.strip() or line.startswith((" ", "\t")):
            continue
        parts = line.split()
        if len(parts) < 2:
            continue
        name, seq = parts[0], parts[1]
        if set(seq) <= set("*:. "):
            continue
        if name not in chunks:
            order.append(name)
            chunks[name] = []
        chunks[name].append(seq)
    return order, ["".join(chunks[n]) for n in order]


def _read_msf(text: str):
    """GCG MSF format (Alignment::readMSF,
    /root/reference/alignment.cpp:1620): 'Name: X ... Len: N' headers,
    '//' separator, then interleaved 'name blocks...' lines.  '.' and
    '~' are gap characters in MSF."""
    lines = text.splitlines()
    if "MULTIPLE_ALIGNMENT" not in lines[0]:
        raise ValueError(
            "MSF file must start with header line MULTIPLE_ALIGNMENT"
        )
    order: List[str] = []
    lens: Dict[str, int] = {}
    chunks: Dict[str, List[str]] = {}
    started = False
    for line in lines[1:]:
        s = line.strip()
        if not s:
            continue
        if s.startswith("//"):
            started = True
            continue
        if not started:
            if s.startswith("Name:"):
                rest = s[5:].strip()
                name = rest.split()[0]
                m = re.search(r"Len:\s*(\d+)", rest)
                if not m:
                    raise ValueError(
                        f"MSF sequence description missing 'Len:': {s!r}"
                    )
                order.append(name)
                lens[name] = int(m.group(1))
                chunks[name] = []
            continue
        parts = s.split()
        if parts[0] in chunks and len(parts) > 1:
            chunks[parts[0]].append(
                "".join(parts[1:]).replace(".", "-").replace("~", "-")
            )
    seqs = ["".join(chunks[n]) for n in order]
    for n, sq in zip(order, seqs):
        if len(sq) != lens[n]:
            raise ValueError(
                f"MSF sequence {n} has {len(sq)} characters, "
                f"declared Len: {lens[n]}"
            )
    return order, seqs


def _strip_nexus_comments(text: str) -> str:
    out, depth = [], 0
    for ch in text:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
        elif depth == 0:
            out.append(ch)
    return "".join(out)


def _read_nexus(text: str):
    """Minimal NEXUS data/characters block reader (replaces the vendored NCL,
    /root/reference/ncl/)."""
    text = _strip_nexus_comments(text)
    m = re.search(r"begin\s+(data|characters)\s*;(.*?)end\s*;", text, re.I | re.S)
    if not m:
        raise ValueError("no data/characters block in NEXUS file")
    block = m.group(2)
    mm = re.search(r"matrix(.*?);", block, re.I | re.S)
    if not mm:
        raise ValueError("no matrix in NEXUS data block")
    names, chunks = [], {}
    for line in mm.group(1).splitlines():
        line = line.strip()
        if not line:
            continue
        qm = re.match(r"'([^']+)'\s+(\S+)", line) or re.match(r"(\S+)\s+(\S+)", line)
        if not qm:
            continue
        name, seq = qm.group(1), qm.group(2)
        if name not in chunks:
            names.append(name)
            chunks[name] = []
        chunks[name].append(seq)
    return names, ["".join(chunks[n]) for n in names]


_READERS = {
    "fasta": _read_fasta,
    "phylip": _read_phylip,
    "clustal": _read_clustal,
    "msf": _read_msf,
    "nexus": _read_nexus,
}


def read_dist_file(path: str, names: List[str]) -> np.ndarray:
    """User-supplied pairwise distance matrix (-d): PHYLIP square format
    'N' then one row per taxon 'name d1 .. dN'; rows may come in any
    order — they are mapped to the alignment's taxon order by name
    (Alignment::readDist, /root/reference/alignment.cpp:2622-2692)."""
    toks = open(path).read().split()
    n = int(toks[0])
    if n != len(names):
        raise ValueError(
            f"distance file has {n} taxa but alignment has {len(names)}"
        )
    pos = 1
    rows = {}
    for _ in range(n):
        nm = toks[pos]
        pos += 1
        rows[nm] = np.array([float(x) for x in toks[pos:pos + n]])
        pos += n
    order = []
    for nm in names:
        if nm not in rows:
            raise ValueError(f"taxon {nm!r} missing from distance file")
        order.append(nm)
    # column order in the file follows the file's row order
    file_names = list(rows)
    col = {nm: i for i, nm in enumerate(file_names)}
    D = np.zeros((n, n))
    for i, nm in enumerate(names):
        D[i] = rows[nm][[col[m] for m in names]]
    if not np.allclose(D, D.T, atol=1e-8):
        D = 0.5 * (D + D.T)  # reference symmetrizes implicitly via BIONJ
    return D
