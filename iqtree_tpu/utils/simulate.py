"""Sequence simulation along a tree (for benchmarks and tests).

Vectorized ancestor->child state sampling under a reversible model with
discrete rate categories (the generating counterpart of the likelihood
engine; the reference has no simulator — its test data are real
alignments)."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..models.rates import RateModel
from ..models.subst import ReversibleModel
from ..trees.tree import PhyloTree, random_tree


def simulate_alignment(
    tree: PhyloTree,
    subst: ReversibleModel,
    rate: RateModel,
    n_sites: int,
    rng: np.random.Generator,
) -> List[str]:
    """Returns sequences (strings) for the N taxa."""
    from scipy.linalg import expm

    S = subst.num_states
    q = subst.rate_matrix()
    pi = subst.state_freq
    rates, props = rate.category_rates()
    props = np.asarray(props, dtype=np.float64)
    p_total = props.sum() + rate.p_invar
    cat_probs = np.concatenate([props, [rate.p_invar]]) / p_total
    # per-site category (last = invariant, rate 0)
    cat = rng.choice(len(cat_probs), size=n_sites, p=cat_probs)
    site_rate = np.concatenate([np.asarray(rates), [0.0]])[cat]

    root = tree.root
    states = {root: rng.choice(S, size=n_sites, p=pi)}
    for v in reversed(tree.postorder()):
        for child in tree.children[v]:
            child = int(child)
            t = float(tree.blen[child])
            # transition per unique rate value
            out = np.empty(n_sites, dtype=np.int64)
            for r in np.unique(site_rate):
                m = site_rate == r
                if r == 0.0:
                    out[m] = states[v][m]
                    continue
                P = expm(q * r * t)
                P = np.clip(P, 0, None)
                P /= P.sum(axis=1, keepdims=True)
                cum = np.cumsum(P, axis=1)
                u = rng.uniform(size=m.sum())
                out[m] = (u[:, None] > cum[states[v][m]]).sum(axis=1)
            states[child] = out
    if S == 4:
        alphabet = "ACGT"
    elif S == 20:
        alphabet = "ARNDCQEGHILKMFPSTWYV"
    else:  # binary / morphology
        alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUV"[:S]
    chars = np.array(list(alphabet))
    return ["".join(chars[states[i]]) for i in range(tree.n_taxa)]


def make_benchmark_alignment(
    n_taxa: int = 1000,
    n_sites: int = 10000,
    seed: int = 2024,
) -> Tuple[PhyloTree, List[str], List[str]]:
    """Deterministic benchmark workload: GTR+G4 data on a random tree.
    Returns (true tree, names, sequences)."""
    from ..models.dna import create_dna_model

    rng = np.random.default_rng(seed)
    tree = random_tree(n_taxa, rng, mean_blen=0.08)
    subst = create_dna_model("GTR")
    subst.group_rates = np.array([1.0, 1.8, 3.2, 0.9, 1.1, 4.0])
    subst.state_freq = np.array([0.30, 0.20, 0.25, 0.25])
    rate = RateModel.make(gamma_cats=4, alpha=0.6)
    names = [f"T{i:04d}" for i in range(n_taxa)]
    seqs = simulate_alignment(tree, subst, rate, n_sites, rng)
    return tree, names, seqs


def make_protein_benchmark(
    n_taxa: int = 300,
    n_sites: int = 2000,
    seed: int = 2025,
) -> Tuple[PhyloTree, List[str], List[str]]:
    """Protein benchmark workload: LG+G4 data on a random tree (the
    20-state shape class, /root/reference/phylotreeavx.cpp:34)."""
    from ..models.protein import create_protein_model

    rng = np.random.default_rng(seed)
    tree = random_tree(n_taxa, rng, mean_blen=0.08)
    subst = create_protein_model("LG")
    rate = RateModel.make(gamma_cats=4, alpha=0.8)
    names = [f"P{i:04d}" for i in range(n_taxa)]
    seqs = simulate_alignment(tree, subst, rate, n_sites, rng)
    return tree, names, seqs


def make_codon_benchmark(
    n_taxa: int = 80,
    n_codons: int = 500,
    seed: int = 2026,
) -> Tuple[PhyloTree, List[str], List[str]]:
    """Codon benchmark workload: GY94 (kappa=2.5, omega=0.2, F3X4-style
    product frequencies) + G4 on a random tree; sequences returned as
    nucleotide triplets (the 61-state shape class)."""
    from ..models.codon import CodonModel, codon_strings, product_codon_freqs

    rng = np.random.default_rng(seed)
    tree = random_tree(n_taxa, rng, mean_blen=0.06)
    nt_freq = np.array([[0.30, 0.20, 0.25, 0.25]] * 3)
    ns = len(codon_strings(1))
    subst = CodonModel("GY", ns, code_id=1, kappa=2.5, omega=0.2)
    subst.nt_freq = nt_freq
    subst.state_freq = product_codon_freqs(nt_freq, 1)
    subst.refresh_exchange()
    rate = RateModel.make(gamma_cats=4, alpha=0.9)
    names = [f"C{i:04d}" for i in range(n_taxa)]

    # simulate at the codon-state level, then expand states to triplets
    S = ns
    q = subst.rate_matrix()
    pi = subst.state_freq
    from scipy.linalg import expm

    rates, props = rate.category_rates()
    props = np.asarray(props, dtype=np.float64)
    p_total = props.sum() + rate.p_invar
    cat_probs = np.concatenate([props, [rate.p_invar]]) / p_total
    cat = rng.choice(len(cat_probs), size=n_codons, p=cat_probs)
    site_rate = np.concatenate([np.asarray(rates), [0.0]])[cat]
    root = tree.root
    states = {root: rng.choice(S, size=n_codons, p=pi / pi.sum())}
    for v in reversed(tree.postorder()):
        for child in tree.children[v]:
            child = int(child)
            t = float(tree.blen[child])
            out = np.empty(n_codons, dtype=np.int64)
            for r in np.unique(site_rate):
                m = site_rate == r
                if r == 0.0:
                    out[m] = states[v][m]
                    continue
                P = expm(q * r * t)
                P = np.clip(P, 0, None)
                P /= P.sum(axis=1, keepdims=True)
                cum = np.cumsum(P, axis=1)
                u = rng.uniform(size=m.sum())
                out[m] = (u[:, None] > cum[states[v][m]]).sum(axis=1)
            states[child] = out
    tris = codon_strings(1)
    seqs = ["".join(tris[s] for s in states[i]) for i in range(n_taxa)]
    return tree, names, seqs


def write_phylip(path: str, names, seqs):
    with open(path, "w") as f:
        f.write(f" {len(names)} {len(seqs[0])}\n")
        for n, s in zip(names, seqs):
            f.write(f"{n:<12} {s}\n")
