"""Site-specific state-frequency models (+SSF; reference ModelSet).

Implements the `-fs <file>` feature: a file assigns each alignment site a
state-frequency vector; sites sharing a vector form a class, each class
gets its own reversible Q (shared exchangeabilities, own frequencies,
individually normalized), and the engine dispatches per pattern
(engine/sitemodel.py).

Reference behavior being matched:
  * file parsing — ModelFactory::readSiteFreq
    (/root/reference/model/modelfactory.cpp:597-680): lines of
    `site_spec f_1 ... f_S`, site specs are 1-based ranges `a`, `a-b`,
    `a-b\\s` joined by commas (extractSiteID, alignment.cpp:2169);
    frequencies must be in (0,1), renormalized when off by >1e-4;
    unspecified sites get a default class with the alignment's empirical
    frequencies (modelfactory.cpp:348-357 createModel FREQ_EMPIRICAL).
  * pattern regrouping — Alignment::regroupSitePattern: sites are
    re-compressed so every pattern is class-pure, and
    ModelSet::pattern_model_map maps pattern -> class
    (modelfactory.cpp:311-321).
  * model construction — one ModelGTR per class sharing the first
    model's exchangeabilities (modelfactory.cpp:324-345);
    here: a bank of eigensystems from ONE exchangeability matrix and
    [K,S] frequencies (vmapped symmetrized eigh).

Deviation (documented): identical frequency vectors are deduplicated
globally (the reference merges only single-site/same-pattern repeats) —
likelihood-identical, fewer eigensystems.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.sitemodel import (
    SSFArrays,
    ssf_compute_loglik,
    ssf_optimize_all_branches,
)
from ..io.alignment import Alignment
from .eigen import eigen_reversible
from .optimize import ModelOptimizer

MIN_FREQUENCY = 1e-4


def parse_site_spec(spec: str, n_sites: int) -> np.ndarray:
    """1-based site spec -> 0-based site ids (extractSiteID semantics:
    comma-separated `a`, `a-b`, `a-b\\s` ranges)."""
    ids = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        step = 1
        if "\\" in part:
            part, s = part.split("\\", 1)
            step = int(s)
        if "-" in part:
            lo, hi = part.split("-", 1)
            lo, hi = int(lo) - 1, int(hi) - 1
        else:
            lo = hi = int(part) - 1
        if lo < 0:
            raise ValueError(f"Negative site ID in '{spec}'")
        if hi >= n_sites:
            raise ValueError(f"Too large site ID in '{spec}' (> {n_sites})")
        if lo > hi:
            raise ValueError(f"Wrong range in '{spec}'")
        if step < 1:
            raise ValueError(f"Wrong step size in '{spec}'")
        ids.extend(range(lo, hi + 1, step))
    return np.asarray(ids, dtype=np.int64)


def _convfreq(freq: np.ndarray) -> np.ndarray:
    """Regularize a frequency vector like Alignment::convfreq: floor at
    MIN_FREQUENCY, dump the residual onto the largest entry."""
    f = np.asarray(freq, dtype=np.float64).copy()
    f[f < MIN_FREQUENCY] = MIN_FREQUENCY
    f[np.argmax(f)] += 1.0 - f.sum()
    return f


def read_site_freq_file(
    path: str, aln: Alignment
) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a `-fs` file.  Returns (site_class [n_sites] int32,
    class_freq [K, S] float64); unspecified sites get a final default
    class with the alignment's empirical (+F) frequencies."""
    S = aln.num_states
    n_sites = aln.n_sites
    site_class = np.full(n_sites, -1, dtype=np.int64)
    freq_rows = []
    with open(path) as fh:
        tokens = fh.read().split()
    i = 0
    while i < len(tokens):
        spec = tokens[i]
        vals = tokens[i + 1 : i + 1 + S]
        if len(vals) < S:
            raise ValueError(
                f"site-frequency file truncated at spec '{spec}'"
            )
        i += 1 + S
        ids = parse_site_spec(spec, n_sites)
        if (site_class[ids] != -1).any():
            raise ValueError(f"Duplicated site ID in '{spec}'")
        f = np.asarray([float(v) for v in vals])
        if (f <= 0).any() or (f >= 1).any():
            raise ValueError(f"Invalid frequency entry for '{spec}'")
        if abs(f.sum() - 1.0) > 1e-4:
            f = f / f.sum()
        site_class[ids] = len(freq_rows)
        freq_rows.append(_convfreq(f))
    if (site_class == -1).any():
        site_class[site_class == -1] = len(freq_rows)
        freq_rows.append(_convfreq(aln.state_frequencies()))
    freqs = np.asarray(freq_rows)
    # global dedup of identical vectors (see module docstring)
    uniq, remap = np.unique(freqs, axis=0, return_inverse=True)
    return remap[site_class].astype(np.int32), uniq


def regroup_by_class(
    aln: Alignment, site_class: np.ndarray
) -> Tuple[Alignment, np.ndarray]:
    """Re-compress patterns so each is class-pure
    (Alignment::regroupSitePattern).  Returns (new alignment,
    ptn_class [n_patterns'])."""
    cols = aln.patterns[:, aln.site_to_pattern]  # [taxa, n_sites]
    key = np.concatenate(
        [cols, site_class[None, :].astype(cols.dtype)], axis=0
    )
    uniq, s2p, counts = np.unique(
        np.ascontiguousarray(key.T), axis=0,
        return_inverse=True, return_counts=True,
    )
    new_aln = Alignment(
        names=list(aln.names),
        patterns=np.ascontiguousarray(uniq[:, :-1].T).astype(np.int32),
        pattern_freq=counts.astype(np.float64),
        site_to_pattern=s2p.astype(np.int32),
        states=aln.states,
    )
    return new_aln, uniq[:, -1].astype(np.int32)


@dataclass
class SSFOptimizer(ModelOptimizer):
    """ModelOptimizer variant producing SSFArrays: per-class frequencies
    are fixed data; exchangeabilities and rate-model parameters are free
    and SHARED (ModelSet::getNDim counts one model's parameters,
    /root/reference/model/modelset.cpp:82)."""

    class_freq: Optional[np.ndarray] = None  # [K, S]
    ptn_class: Optional[np.ndarray] = None  # [P]

    def __post_init__(self):
        super().__post_init__()
        self.opt_freq = False  # class frequencies come from the file

    def build_ssf(self, params: Dict[str, jnp.ndarray]) -> SSFArrays:
        dt = self.dtype
        sym = self._exchange_matrix(params)
        fk = jnp.asarray(self.class_freq, dt)
        lam, v, vinv = jax.vmap(lambda f: eigen_reversible(sym, f))(fk)
        rates, props, pinv = self._rate_part(params)
        return SSFArrays(
            eigenvalues=lam.astype(dt),
            eigvec=v.astype(dt),
            inv_eigvec=vinv.astype(dt),
            state_freq=fk,
            rates=rates,
            props=props,
            p_invar=jnp.asarray(pinv, dt),
            ptn_class=jnp.asarray(self.ptn_class),
        )


def optimize_ssf_model_and_branches(
    opt: SSFOptimizer,
    tree,
    site,
    params: Optional[Dict] = None,
    rounds: int = 10,
    tol: float = 0.01,
    branch_sweeps: int = 100,
    model_iters: int = 60,
):
    """Alternating (model L-BFGS | branch Newton) for +SSF models.

    Model gradients run in FORWARD mode (the site-model pass has no
    custom VJP; the free-parameter count is tiny), chunked into bounded
    device calls like the reversible path (models/optimize.py)."""
    import os

    from ..utils.lbfgs import lbfgs_minimize, zero_lbfgs_state

    if params is None:
        params = opt.init_params()
    M_CHUNK = int(os.environ.get("IQTREE_TPU_MCHUNK", 15))
    B_CHUNK = int(os.environ.get("IQTREE_TPU_BCHUNK", 25))

    key_m = ("ssf_m", site.tip_codes.shape, M_CHUNK)
    key_b = ("ssf_b", site.tip_codes.shape, B_CHUNK)
    mstep = opt._jit_cache.get(key_m)
    bstep = opt._jit_cache.get(key_b)
    if mstep is None:
        scale_cache = {}

        def _mstep(t, p, lst):
            scale = jnp.sum(site.pattern_freq)

            def neg(pp):
                l, _ = ssf_compute_loglik(t, opt.build_ssf(pp), site)
                return -l / scale

            if not p:
                return p, -neg(p) * scale, lst
            p, val, lst = lbfgs_minimize(
                neg, p, max_iters=M_CHUNK, init_state=lst,
                forward_grad=True,
            )
            return p, -val * scale, lst

        mstep = jax.jit(_mstep)
        opt._jit_cache[key_m] = mstep
    if bstep is None:

        def _bstep(t, p):
            return ssf_optimize_all_branches(
                t, opt.build_ssf(p), site, n_sweeps=B_CHUNK
            )

        bstep = jax.jit(_bstep)
        opt._jit_cache[key_b] = bstep

    total_chunks = rounds * max(
        1, -(-model_iters // M_CHUNK), -(-branch_sweeps // B_CHUNK)
    )
    lnl_prev = -np.inf
    lnl = -np.inf
    lst = zero_lbfgs_state(params)
    for it in range(total_chunks):
        params, mlnl, lst = mstep(tree, params, lst)
        tree, lnl = bstep(tree, params)
        if float(lnl) - lnl_prev < tol and it > 0:
            break
        lnl_prev = float(lnl)
    return tree, params, float(lnl)
