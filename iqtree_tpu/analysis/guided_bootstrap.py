"""Guided bootstrap from site log-likelihoods + multinomial alignment
probability.

Re-expresses the reference's slim guided bootstrap
(/root/reference/pda.cpp:1624 guidedBootstrap, maalignment.cpp) and
`-mprob` (pda.cpp:1662 computeMulProb, alignment.cpp:3298):

  * `-gbo <sitelh>`: read per-site log-likelihoods, compute the EXPECTED
    pattern frequencies under the model (n * exp(lnl_p) / sum, rounded
    with carried remainders so they sum to n;
    MaAlignment::computeExpectedNorFre, maalignment.cpp:84), emit the
    "expected" alignment (.gbo), a pattern table (.patInfo), and the
    multinomial log-probability of that alignment (.gbo.logP).
  * `-mprob <ref>`: log multinomial probability of one alignment's
    pattern frequencies under another's empirical pattern distribution.
"""

from __future__ import annotations

from math import lgamma
from typing import List, Tuple

import numpy as np

from ..io.alignment import Alignment


def _log_fac(n) -> np.ndarray:
    return np.array([lgamma(float(x) + 1.0) for x in np.atleast_1d(n)])


def read_site_lnl_file(path: str) -> np.ndarray:
    """Tolerant reader for .sitelh-style files: ignores non-numeric
    tokens ('Site_Lh') and header counts (MaAlignment::readLogLL,
    maalignment.cpp:22 expects '<nsites> Site_Lh <values...>')."""
    vals: List[float] = []
    with open(path) as f:
        toks = f.read().split()
    nums = []
    for t in toks:
        try:
            nums.append(float(t))
        except ValueError:
            continue
    # drop leading header ints that announce the count ("1 384" or "384")
    for skip in (0, 1, 2):
        body = nums[skip:]
        if skip and len(body) and all(
            float(n).is_integer() for n in nums[:skip]
        ) and any(abs(int(n)) == len(body) for n in nums[:skip]):
            vals = body
            break
        vals = nums
    return np.asarray(vals, dtype=np.float64)


def expected_norm_freq(pattern_lnl: np.ndarray, n_sites: int) -> np.ndarray:
    """Expected pattern frequencies with carried rounding so the total
    is exactly n_sites (computeExpectedNorFre, maalignment.cpp:84)."""
    lnl = np.asarray(pattern_lnl, dtype=np.float64)
    ll = np.exp(lnl - lnl.max())
    ell = n_sites * ll / ll.sum()
    out = np.zeros(len(ell), dtype=np.int64)
    r = 0.0
    for j, e in enumerate(ell):
        r = e + r - np.floor(r + 0.5)
        out[j] = int(np.floor(r + 0.5))
    return out


def multinomial_log_prob(freq: np.ndarray, ref_freq: np.ndarray,
                         n_sites: int) -> float:
    """log P(freq | multinomial(ref_freq / n)), patterns aligned
    (Alignment::multinomialProb, alignment.cpp:3298)."""
    freq = np.asarray(freq, dtype=np.float64)
    ref = np.asarray(ref_freq, dtype=np.float64)
    used = freq > 0
    if np.any(ref[used] <= 0):
        return float("-inf")
    return float(
        lgamma(n_sites + 1.0)
        - _log_fac(freq[used]).sum()
        + np.sum(freq[used] * np.log(ref[used] / n_sites))
    )


def site_lnl_to_pattern(aln: Alignment, site_lnl: np.ndarray) -> np.ndarray:
    """Per-site values -> per-pattern (consistency-checked like
    readLogLL, maalignment.cpp:69-76)."""
    if len(site_lnl) != aln.n_sites:
        raise ValueError(
            f"site-lnL file has {len(site_lnl)} values, alignment has "
            f"{aln.n_sites} sites"
        )
    pat = np.zeros(aln.n_patterns)
    seen = np.zeros(aln.n_patterns, dtype=bool)
    for s, p in enumerate(aln.site_to_pattern):
        if seen[p] and abs(pat[p] - site_lnl[s]) > 1e-4:
            raise ValueError(
                f"conflicting likelihoods for pattern {p} "
                f"({pat[p]} vs {site_lnl[s]})"
            )
        pat[p] = site_lnl[s]
        seen[p] = True
    return pat


def write_phylip(path: str, names: List[str], seqs: List[str]) -> None:
    with open(path, "w") as f:
        f.write(f"{len(names)} {len(seqs[0])}\n")
        for n, s in zip(names, seqs):
            f.write(f"{n:<10} {s}\n")


def _decode_rows(aln: Alignment, mat: np.ndarray) -> List[str]:
    """Integer code rows -> sequence strings via StateSpace.code_chars."""
    chars = aln.states.code_chars
    if not chars:
        raise ValueError("decoding not supported for codon alignments")
    return ["".join(chars[int(c)] for c in row) for row in mat]


def guided_bootstrap(aln: Alignment, site_lnl: np.ndarray, prefix: str,
                     log=print) -> Tuple[float, float]:
    """Emit .patInfo / .gbo / .gbo.logP (guidedBootstrap, pda.cpp:1624).
    Returns (logP of expected alignment, max unconstrained lnL)."""
    pat_lnl = site_lnl_to_pattern(aln, site_lnl)
    exp_freq = expected_norm_freq(pat_lnl, aln.n_sites)
    obs = np.asarray(aln.pattern_freq)

    # .patInfo: pattern, observed freq, expected freq
    with open(prefix + ".patInfo", "w") as f:
        f.write("Pattern\tObsFre\tExpFre\n")
        for p in range(aln.n_patterns):
            f.write(f"{p}\t{int(obs[p])}\t{int(exp_freq[p])}\n")

    # expected alignment: each pattern repeated exp_freq times
    cols = np.repeat(np.arange(aln.n_patterns), exp_freq)
    mat = np.asarray(aln.patterns)[:, cols]  # [taxa, sites']
    seqs = _decode_rows(aln, mat)
    write_phylip(prefix + ".gbo", aln.names, seqs)

    log_p = multinomial_log_prob(exp_freq, obs, aln.n_sites)
    log_p_max = multinomial_log_prob(obs, obs, aln.n_sites)
    with open(prefix + ".gbo.logP", "w") as f:
        f.write(f"{log_p:.10g}\n")
    log(f"Log-probability of the expected alignment: {log_p:.6f}")
    log(f"Maximum unconstrained log-likelihood:      {log_p_max:.6f}")
    log(f"  Pattern table:                 {prefix}.patInfo")
    log(f"  Guided-bootstrap alignment:    {prefix}.gbo")
    return log_p, log_p_max


def multinomial_prob_of(aln: Alignment, ref: Alignment) -> float:
    """`-mprob`: P(aln | ref's pattern distribution); patterns of `aln`
    must all occur in `ref` (computeMulProb, pda.cpp:1662)."""
    if aln.n_sites != ref.n_sites:
        raise ValueError("alignments have different lengths")
    # match aln patterns to ref patterns by column content
    ref_index = {
        ref.patterns[:, p].tobytes(): p for p in range(ref.n_patterns)
    }
    freq = np.zeros(aln.n_patterns)
    ref_freq = np.zeros(aln.n_patterns)
    for p in range(aln.n_patterns):
        key = aln.patterns[:, p].tobytes()
        if key not in ref_index:
            raise ValueError(
                "pattern in the current alignment is not found in the "
                "reference alignment"
            )
        freq[p] = aln.pattern_freq[p]
        ref_freq[p] = ref.pattern_freq[ref_index[key]]
    return multinomial_log_prob(freq, ref_freq, aln.n_sites)
