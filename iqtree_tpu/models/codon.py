"""Codon substitution models (the ModelCodon family equivalent).

Re-expression of /root/reference/model/modelcodon.h:36 (+ empirical
variants) for the per-category engine:

  GY94 (Goldman-Yang):  Q_ij = kappa^[ts] * omega^[nonsyn] * pi_j
                        for codons differing at exactly one position
                        (/root/reference/model/modelcodon.h:174 initGY94)
  MG94 (Muse-Gaut):     target factor is the *nucleotide* frequency of
                        the changed position instead of the codon
                        frequency (initMG94, modelcodon.h:178); with
                        product-form frequencies (F1X4/F3X4) this is a
                        reversible GTR-style model and runs on the same
                        symmetrized-eigh path
  KOSI07 / SCHN05:      empirical 61x61 exchangeabilities (Kosiol et al.
                        2007 ECM; Schneider et al. 2005), extracted to
                        models/data/codon_models.npz

The genetic code tables are the standard NCBI translation tables
(codon index = 16*nt1 + 4*nt2 + nt3 with A,C,G,T = 0..3; '*' = stop),
as in /root/reference/alignment.cpp:32-48.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from .subst import FREQ_EMPIRICAL, FREQ_USER, ReversibleModel

# Standard code (NCBI table 1); other tables expressed as diffs.
_CODE1 = "KNKNTTTTRSRSIIMIQHQHPPPPRRRRLLLLEDEDAAAAGGGGVVVV*Y*YSSSS*CWCLFLF"

_NT = "ACGT"


def _codon_index(tri: str) -> int:
    return 16 * _NT.index(tri[0]) + 4 * _NT.index(tri[1]) + _NT.index(tri[2])


def _apply_diffs(base: str, diffs: Dict[str, str]) -> str:
    s = list(base)
    for tri, aa in diffs.items():
        s[_codon_index(tri)] = aa
    return "".join(s)


GENETIC_CODES: Dict[int, str] = {
    1: _CODE1,  # Standard
    2: _apply_diffs(_CODE1, {"AGA": "*", "AGG": "*", "ATA": "M", "TGA": "W"}),
    # Vertebrate Mitochondrial
    3: _apply_diffs(_CODE1, {"ATA": "M", "CTA": "T", "CTC": "T", "CTG": "T",
                             "CTT": "T", "TGA": "W"}),  # Yeast Mitochondrial
    4: _apply_diffs(_CODE1, {"TGA": "W"}),  # Mold/Protozoan Mitochondrial
    5: _apply_diffs(_CODE1, {"AGA": "S", "AGG": "S", "ATA": "M", "TGA": "W"}),
    # Invertebrate Mitochondrial
    6: _apply_diffs(_CODE1, {"TAA": "Q", "TAG": "Q"}),  # Ciliate Nuclear
    9: _apply_diffs(_CODE1, {"AAA": "N", "AGA": "S", "AGG": "S", "TGA": "W"}),
    # Echinoderm/Flatworm Mitochondrial
    10: _apply_diffs(_CODE1, {"TGA": "C"}),  # Euplotid Nuclear
    11: _CODE1,  # Bacterial/Archaeal/Plant Plastid (start codons differ only)
    14: _apply_diffs(_CODE1, {"AAA": "N", "AGA": "S", "AGG": "S",
                              "TAA": "Y", "TGA": "W"}),
    # Alternative Flatworm Mitochondrial
}


def genetic_code_table(code_id: int = 1) -> str:
    if code_id not in GENETIC_CODES:
        raise ValueError(f"unsupported genetic code table {code_id}")
    return GENETIC_CODES[code_id]


def sense_codons(code_id: int = 1) -> np.ndarray:
    """Codon indices (0..63) of non-stop codons, in index order."""
    tab = genetic_code_table(code_id)
    return np.array([i for i in range(64) if tab[i] != "*"], dtype=np.int32)


def codon_strings(code_id: int = 1):
    return [
        _NT[c // 16] + _NT[(c // 4) % 4] + _NT[c % 4]
        for c in sense_codons(code_id)
    ]


_TRANSITIONS = {(0, 2), (2, 0), (1, 3), (3, 1)}  # A<->G, C<->T


def codon_masks(code_id: int = 1):
    """Pairwise structure of the sense-codon space:
    step [ns,ns] bool  codons differ at exactly one position
    ts   [ns,ns] bool  ... and that change is a transition
    nonsyn [ns,ns] bool ... and the amino acid changes
    pos  [ns,ns] int   changed position (0..2; -1 where not single-step)
    """
    tab = genetic_code_table(code_id)
    sc = sense_codons(code_id)
    ns = len(sc)
    nts = np.stack([sc // 16, (sc // 4) % 4, sc % 4], axis=1)  # [ns, 3]
    diff = nts[:, None, :] != nts[None, :, :]  # [ns, ns, 3]
    ndiff = diff.sum(-1)
    step = ndiff == 1
    pos = np.where(step, diff.argmax(-1), -1)
    a = np.take_along_axis(
        nts[:, None, :].repeat(ns, 1), np.maximum(pos, 0)[..., None], axis=2
    )[..., 0]
    b = np.take_along_axis(
        nts[None, :, :].repeat(ns, 0), np.maximum(pos, 0)[..., None], axis=2
    )[..., 0]
    ts = step & np.array(
        [[(x, y) in _TRANSITIONS for x, y in zip(ra, rb)]
         for ra, rb in zip(a, b)]
    )
    aa = np.array([tab[c] for c in sc])
    nonsyn = step & (aa[:, None] != aa[None, :])
    return dict(step=step, ts=ts, nonsyn=nonsyn, pos=pos, target_nt=b)


@dataclass
class CodonModel(ReversibleModel):
    """Parametric codon model; `exchange` is derived from (kappa, omega).

    mg=True uses Muse-Gaut target-nucleotide factors (requires
    product-form frequencies).  `nt_freq` is [3,4] position-specific
    nucleotide frequencies (rows identical for F1X4)."""

    code_id: int = 1
    kappa: float = 2.0
    omega: float = 0.3
    mg: bool = False
    nt_freq: Optional[np.ndarray] = None  # [3, 4]
    fix_kappa: bool = False
    fix_omega: bool = False

    def __post_init__(self):
        masks = codon_masks(self.code_id)
        self._step = masks["step"]
        self._ts = masks["ts"]
        self._nonsyn = masks["nonsyn"]
        self._pos = masks["pos"]
        self._target_nt = masks["target_nt"]
        super().__post_init__()
        self.fixed_rates = False
        self.refresh_exchange()

    def mg_factor(self) -> np.ndarray:
        """[ns,ns] symmetric factor making Q_ij proportional to the
        target-nucleotide frequency: f_pos(j_pos) / pi_j.  Requires
        product-form pi (F1X4/F3X4); symmetric because the off-position
        factors of i and j coincide."""
        pi = np.maximum(np.asarray(self.state_freq, float), 1e-12)
        f = self.nt_freq[np.maximum(self._pos, 0), self._target_nt]
        fac = np.where(self._step, f / pi[None, :], 0.0)
        return 0.5 * (fac + fac.T)

    def refresh_exchange(self) -> None:
        """Recompute the exchangeability matrix from current (kappa,
        omega); called after optimization writes parameters back."""
        r = np.where(self._step, 1.0, 0.0)
        r = r * np.where(self._ts, self.kappa, 1.0)
        r = r * np.where(self._nonsyn, self.omega, 1.0)
        if self.mg and self.nt_freq is not None:
            r = r * self.mg_factor()
        self.exchange = r

    @property
    def n_codon_params(self) -> int:
        return (0 if self.fix_kappa else 1) + (0 if self.fix_omega else 1)

    @property
    def df(self) -> int:
        base = self.n_codon_params
        if self.freq_type in (FREQ_EMPIRICAL, FREQ_USER):
            base += self.num_states - 1
        return base


def product_codon_freqs(nt_freq: np.ndarray, code_id: int = 1) -> np.ndarray:
    """Codon frequencies from position-specific nucleotide frequencies
    (F1X4 / F3X4), normalized over sense codons."""
    sc = sense_codons(code_id)
    pi = (
        nt_freq[0, sc // 16]
        * nt_freq[1, (sc // 4) % 4]
        * nt_freq[2, sc % 4]
    )
    return pi / pi.sum()


_EMP_CACHE = {}


def empirical_codon_model(name: str, code_id: int = 1) -> ReversibleModel:
    """KOSI07 (ECM unrestricted), KOSI07_REST, SCHN05 from the data file
    (standard genetic code only, like the reference modelcodon.cpp:331-345)."""
    if code_id != 1:
        raise ValueError(f"{name} requires the standard genetic code")
    global _EMP_CACHE
    if not _EMP_CACHE:
        from pathlib import Path

        path = (
            Path(__file__).resolve().parent / "data/codon_models.npz"
        )
        _EMP_CACHE = dict(np.load(path))
    key = {"KOSI07": "ecm_unrest", "ECM": "ecm_unrest",
           "ECMK07": "ecm_unrest", "ECMREST": "ecm_rest",
           "SCHN05": "ecm_schn05", "ECMS05": "ecm_schn05"}.get(name.upper())
    if key is None:
        raise ValueError(f"unknown empirical codon model {name!r}")
    ex = _EMP_CACHE[key + "_exchange"]
    freq = _EMP_CACHE[key + "_freq"]
    return ReversibleModel(
        name=name.upper(),
        num_states=ex.shape[0],
        exchange=ex,
        freq_type=FREQ_USER,
        state_freq=freq,
        fixed_rates=True,
    )
