"""Analysis report writer (.iqtree / .treefile / .sitelh outputs).

Mirrors the reference report (reportPhyloAnalysis,
/root/reference/phyloanalysis.cpp:537-700: reportModel :170, reportRate
:301, reportTree :343) closely enough for a reference user to find every
section they expect.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from .. import __version__


def _rate_matrix_section(subst) -> str:
    S = subst.num_states
    q = subst.rate_matrix()
    out = ["Rate matrix Q:", ""]
    names = _state_names(subst)
    for i in range(S):
        row = "  ".join(f"{q[i, j]:8.4f}" for j in range(S))
        out.append(f"  {names[i]}  {row}")
    out.append("")
    return "\n".join(out)


def _state_names(subst):
    if subst.num_states == 4:
        return list("ACGT")
    if subst.num_states == 20:
        return list("ARNDCQEGHILKMFPSTWYV")
    if getattr(subst, "code_id", None) is not None or subst.num_states in (60, 61, 62):
        from ..models.codon import codon_strings

        try:
            return codon_strings(getattr(subst, "code_id", 1))
        except Exception:
            pass
    return [str(i) for i in range(subst.num_states)]


def write_report(
    path: str,
    aln,
    subst,
    rate,
    tree,
    lnl: float,
    command: str,
    wall_time: float,
    iterations: int = 0,
    extra_sections: Optional[list] = None,
):
    names = _state_names(subst)
    L = []
    L.append(f"IQ-TREE-TPU {__version__} — maximum-likelihood phylogenetic inference on TPU")
    L.append("")
    L.append(f"Command: {command}")
    L.append(f"Date: {time.strftime('%a %b %d %H:%M:%S %Y')}")
    L.append("")
    L.append("SEQUENCE ALIGNMENT")
    L.append("------------------")
    L.append(f"Input data: {aln.n_taxa} sequences with {aln.n_sites} "
             f"{_seqtype_name(aln)} sites")
    L.append(f"Number of distinct site patterns: {aln.n_patterns}")
    L.append(f"Number of constant sites: "
             f"{int(round(aln.frac_const_sites() * aln.n_sites))} "
             f"(= {aln.frac_const_sites() * 100:.4g}% of all sites)")
    L.append(f"Number of parsimony informative sites: {aln.num_informative_sites()}")
    L.append("")
    L.append("SUBSTITUTION PROCESS")
    L.append("--------------------")
    L.append(f"Model of substitution: {subst.name}{rate.name_suffix()}")
    L.append("")
    from ..models.mixture import MixtureModel

    if isinstance(subst, MixtureModel):
        L.append("Mixture model of substitution (class, rate, weight):")
        L.append("")
        for c, rr, ww in zip(subst.components, subst.comp_rates, subst.weights):
            L.append(f"  {c.name:<16} {rr:.4f}  {ww:.4f}")
        L.append("")
        L.append("State frequencies (class-weighted means):")
        L.append("")
        for n, f in zip(names, subst.state_freq):
            L.append(f"  pi({n}) = {f:.4g}")
        L.append("")
        _append_rate_het(L, rate)
        _append_tree_and_tail(
            L, aln, tree, lnl, extra_sections, iterations, wall_time, path
        )
        return
    if getattr(subst, "kappa", None) is not None and subst.num_states > 20:
        L.append(f"Transition/transversion ratio kappa: {subst.kappa:.4f}")
        L.append(f"Nonsynonymous/synonymous ratio omega: {subst.omega:.4f}")
        L.append("")
    if getattr(subst, "nr_rates", None) is not None:
        # UNREST: print the full 4x4 rate table (ModelNonRev::writeInfo,
        # /root/reference/model/modelnonrev.cpp:166)
        L.append("Rate parameters (non-reversible, row-major):")
        L.append("")
        k = 0
        for i, ni in enumerate(names):
            row = []
            for j in range(subst.num_states):
                if j == i:
                    row.append("      -")
                else:
                    row.append(f"{subst.nr_rates[k]:7.4f}")
                    k += 1
            L.append(f"  {ni}  " + "  ".join(row))
        L.append("")
    if subst.num_states == 4 and getattr(subst, "rate_groups", None) is not None:
        pairs = ["A-C", "A-G", "A-T", "C-G", "C-T", "G-T"]
        r = subst.sym_rates()
        idx = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        L.append("Rate parameter R:")
        L.append("")
        for nm, (i, j) in zip(pairs, idx):
            L.append(f"  {nm}: {r[i, j]:.4f}")
        L.append("")
    L.append(f"State frequencies: ({_freq_desc(subst)})")
    L.append("")
    for n, f in zip(names, subst.state_freq):
        L.append(f"  pi({n}) = {f:.4g}")
    L.append("")
    if subst.num_states <= 20:  # codon Q (61x61) is too wide to print
        L.append(_rate_matrix_section(subst))
    _append_rate_het(L, rate)
    _append_tree_and_tail(
        L, aln, tree, lnl, extra_sections, iterations, wall_time, path
    )


def _append_rate_het(L, rate):
    L.append("RATE HETEROGENEITY")
    L.append("------------------")
    if rate.has_gamma:
        L.append(f"Model of rate heterogeneity: "
                 f"{'Invar+' if rate.has_invar else ''}Gamma with {rate.ncat} categories")
        L.append(f"Gamma shape alpha: {rate.alpha:.4g}")
    elif rate.is_free_rate:
        L.append(f"Model of rate heterogeneity: FreeRate with {rate.ncat} categories")
    elif rate.has_invar:
        L.append("Model of rate heterogeneity: Invariable sites")
    else:
        L.append("Model of rate heterogeneity: Uniform")
    if rate.has_invar:
        L.append(f"Proportion of invariable sites: {rate.p_invar:.4g}")
    rates, props = rate.category_rates()
    if len(rates) > 1 or rate.has_invar:
        L.append("")
        L.append(" Category  Relative_rate  Proportion")
        if rate.has_invar:
            L.append(f"  0         0              {rate.p_invar:.4g}")
        for i, (r_, w_) in enumerate(zip(rates, props), 1):
            L.append(f"  {i}         {r_:.4g}         {w_:.4g}")
    L.append("")


def _append_tree_and_tail(
    L, aln, tree, lnl, extra_sections, iterations, wall_time, path
):
    L.append("MAXIMUM LIKELIHOOD TREE")
    L.append("-----------------------")
    L.append("")
    L.append(f"Log-likelihood of the tree: {lnl:.4f}")
    total_len = float(np.sum(tree.blen)) - float(tree.blen[tree.root])
    L.append(f"Total tree length (sum of branch lengths): {total_len:.4f}")
    L.append("")
    L.append("Tree in newick format:")
    L.append("")
    L.append(tree.to_newick(aln.names))
    L.append("")
    if extra_sections:
        for s in extra_sections:
            L.append(s)
            L.append("")
    L.append("ANALYSIS INFO")
    L.append("-------------")
    L.append(f"Search iterations: {iterations}")
    L.append(f"Wall-clock time used: {wall_time:.3f} sec")
    L.append("")
    with open(path, "w") as f:
        f.write("\n".join(L))


def _seqtype_name(aln):
    return {
        "DNA": "nucleotide",
        "AA": "amino-acid",
        "BIN": "binary",
        "MORPH": "morphological",
        "CODON": "codon",
    }.get(aln.states.seq_type, aln.states.seq_type)


def _freq_desc(subst):
    from ..models.subst import (
        FREQ_EMPIRICAL,
        FREQ_EQUAL,
        FREQ_ESTIMATE,
        FREQ_USER,
    )

    return {
        FREQ_EMPIRICAL: "empirical counts from alignment",
        FREQ_EQUAL: "equal frequencies",
        FREQ_ESTIMATE: "estimated with maximum likelihood",
        FREQ_USER: "user-defined",
    }.get(subst.freq_type, subst.freq_type)


def write_site_lnl(path: str, aln, pattern_lnl: np.ndarray,
                   compress: bool = False):
    """.sitelh file (reference -wsl format: one header line, then
    'Site_Lh' + per-site values); compress=True gzips (-gz)."""
    from ..utils.gzout import open_out

    site_lnl = pattern_lnl[aln.site_to_pattern]
    with open_out(path, compress) as f:
        f.write(f"# Site log-likelihoods\n1 {aln.n_sites}\n")
        f.write("Site_Lh   " + " ".join(f"{x:.5f}" for x in site_lnl) + "\n")


def write_site_lnl_category(
    path: str, aln, pattern_lnl, pattern_lnl_cat, mode: str,
    rates, n_mix: int = 1, n_rate: int = 1,
):
    """.sitelh with per-class columns — the reference's -wslr / -wslm /
    -wslmr outputs (printSiteLhCategory,
    /root/reference/phylotesting.cpp:243-310).

    mode: "RATECAT" (one column per rate class), "MIXTURE" (per mixture
    class, summed over rate classes), "MIXTURE_RATECAT" (per (m, r)
    pair).  pattern_lnl_cat is [P, C] of log(prop_c * L_cp) with the
    engine's fused class axis (m-major); `rates` are the rate-class
    rates for the header."""
    import numpy as np

    cat = np.asarray(pattern_lnl_cat, dtype=np.float64)
    P, C = cat.shape
    if mode == "MIXTURE" and n_rate > 1:
        # collapse the rate axis in probability space
        cat = cat.reshape(P, n_mix, n_rate)
        m = cat.max(axis=2, keepdims=True)
        cat = (np.log(np.exp(cat - m).sum(axis=2)) + m[:, :, 0])
    site_cat = cat[aln.site_to_pattern]
    site_lnl = np.asarray(pattern_lnl)[aln.site_to_pattern]
    with open(path, "w") as f:
        f.write("Note : P(D|M) is the probability of site D given the "
                "model M (i.e., the site likelihood)\n")
        if mode == "RATECAT":
            f.write("P(D|M,rr[i]) is the probability of site D given the "
                    "model M and the relative rate\n"
                    "of evolution rr[i], where i is the class of rate to "
                    "be considered.\n"
                    "We have P(D|M) = \\sum_i P(i) x P(D|M,rr[i]).\n\n")
            hdr = [f"log{{P({i+1})xP(D|M,rr[{i+1}]={rates[i]:g})}}"
                   for i in range(site_cat.shape[1])]
        elif mode == "MIXTURE":
            f.write("P(D|M[i]) is the probability of site D given the "
                    "model M[i],\n"
                    "where i is the mixture class to be considered.\n"
                    "We have P(D|M) = \\sum_i P(i) x P(D|M[i]).\n\n")
            hdr = [f"log{{P({i+1})xP(D|M[{i+1}])}}"
                   for i in range(site_cat.shape[1])]
        else:  # MIXTURE_RATECAT
            f.write("P(D|M[i],rr[j]) is the probability of site D given "
                    "the model M[i] and the relative rate\n"
                    "of evolution rr[j], where i and j are the mixture "
                    "class and rate class, respectively.\n"
                    "We have P(D|M) = \\sum_i \\sum_j P(i) x P(j) x "
                    "P(D|M[i],rr[j]).\n\n")
            hdr = [f"log{{P({i+1})xP({j+1})xP(D|M[{i+1}],rr[{j+1}]="
                   f"{rates[j]:g})}}"
                   for i in range(n_mix) for j in range(n_rate)]
        f.write("Site   logP(D|M)       " + " ".join(hdr) + "\n")
        for s in range(aln.n_sites):
            vals = " ".join(f"{v:<15.5f}" for v in site_cat[s])
            f.write(f"{s+1:<6d} {site_lnl[s]:<15.5f} {vals}\n")
