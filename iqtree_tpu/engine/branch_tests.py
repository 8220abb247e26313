"""Branch support tests: SH-aLRT, parametric aLRT, aBayes, local bootstrap.

Reference: PhyloTree::testOneBranch / testAllBranches
(/root/reference/phylotree.cpp:3984,4058) — for every internal branch the
two NNI alternatives are evaluated (5 local branches re-optimized), then:
  * parametric aLRT: stat = 2(l0 - max(l1,l2)); support by PhyML's
    alrt.c table — interpolated chi2_1 CDF, then ((1+p)/2)^3
    (phylotree.cpp:3816 Statistics_To_Probabilities)
  * aBayes: 1 / (1 + e^{l1-l0} + e^{l2-l0})
  * SH-aLRT / local BP: RELL resampling of the 3 site-lnl vectors
    (resampleLh :3796); SH counts replicates where
    aLRT > (cs_best - cs_2nd_best) + 0.05 with centered scores.

TPU-native: the alternatives come from the batched NNI evaluator (one
up+down pass for ALL branches), and all R resamples x all branches x 3
configurations are a single [E*3, P] x [P, R] MXU matmul.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .likelihood import ModelArrays, SiteData, TreeArrays
from .nni import evaluate_nnis
from ..trees.tree import PhyloTree

HIGHEST = jax.lax.Precision.HIGHEST


@dataclass
class BranchTestResult:
    edges: np.ndarray  # [E] child-node ids of tested branches
    sh_alrt: np.ndarray  # [E] percent
    lbp: np.ndarray  # [E] percent
    alrt_parametric: np.ndarray  # [E] 0..1
    abayes: np.ndarray  # [E] 0..1

    def labels(
        self, sh: bool = True, lbp: bool = False, alrt: bool = False,
        abayes: bool = False,
    ) -> Dict[int, str]:
        out = {}
        for k, v in enumerate(self.edges):
            parts = []
            if sh:
                parts.append(f"{self.sh_alrt[k]:.0f}")
            if lbp:
                parts.append(f"{self.lbp[k]:.0f}")
            if alrt:
                parts.append(f"{self.alrt_parametric[k]:.3g}")
            if abayes:
                parts.append(f"{self.abayes[k]:.3g}")
            out[int(v)] = "/".join(parts)
        return out


# PhyML alrt.c lookup knots: chi2_1 quantiles (x) and their CDF values (f)
# — reference Statistics_To_Probabilities, phylotree.cpp:3817-3980
_ALRT_X = np.array([
    0.000000393, 0.00000157, 0.0000393, 0.000157, 0.000982, 0.00393,
    0.0158, 0.0642, 0.148, 0.275, 0.455, 0.708, 1.074, 1.642, 2.706,
    3.841, 5.024, 6.635, 7.879, 10.828, 12.116,
])
_ALRT_F = np.array([
    0.0005, 0.001, 0.005, 0.01, 0.025, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5,
    0.6, 0.7, 0.8, 0.9, 0.95, 0.975, 0.99, 0.995, 0.999, 0.9995,
])


def alrt_parametric_support(stat: np.ndarray) -> np.ndarray:
    """Parametric aLRT support, exactly the reference's PhyML table:
    linearly interpolate the chi2_1 CDF at fixed knots, clamp to
    [0.0001, 0.9999] outside, then p -> ((1+p)/2)^3
    (Statistics_To_Probabilities, phylotree.cpp:3817-3980; e.g.
    stat=3.841 -> 0.975^3 = 0.926859).  Negative statistics -> 0."""
    stat = np.asarray(stat, dtype=float)
    rough = np.interp(stat, _ALRT_X, _ALRT_F, left=0.0001, right=0.9999)
    p = (1.0 + rough) / 2.0
    return np.where(stat >= 0, p ** 3, 0.0)


def test_all_branches(
    tree: TreeArrays,
    model: ModelArrays,
    site: SiteData,
    pattern_lnl: np.ndarray,  # [P] current-tree per-pattern lnl
    best_lnl: float,
    n_sites: int,
    reps: int = 1000,
    rng: Optional[np.random.Generator] = None,
    host_tree: Optional[PhyloTree] = None,
) -> BranchTestResult:
    rng = rng or np.random.default_rng(1)
    # internal edges on the host view; NNI evaluation uses device ids
    if host_tree is not None:
        edges = host_tree.internal_edges()
        edges_dev = np.asarray(tree.h2d)[edges]
    else:
        parent = np.asarray(tree.parent)
        N = tree.n_taxa
        vs = np.arange(N, tree.n_nodes - 1)
        edges_dev = vs[(parent[vs] >= N) & (parent[vs] != tree.root)]
        edges = np.asarray(tree.d2h)[edges_dev]
    ev = evaluate_nnis(
        tree, model, site, jnp.asarray(edges_dev), nni5=True,
        want_site_lnl=True,
    )
    alt_lnl = np.asarray(ev.lnl)  # [E, 2]
    alt_site = np.asarray(ev.site_lnl)  # [E, 2, P]
    E, _, P = alt_site.shape

    l0 = best_lnl
    l12 = alt_lnl  # [E, 2]
    alrt = l0 - np.maximum(l12[:, 0], l12[:, 1])  # [E]
    stat = 2.0 * alrt
    alrt_param = alrt_parametric_support(stat)
    abayes = 1.0 / (
        1.0 + np.exp(np.clip(l12[:, 0] - l0, -700, 700))
        + np.exp(np.clip(l12[:, 1] - l0, -700, 700))
    )

    if reps <= 0:
        # only parametric tests requested: skip the RELL resampling
        # (reference testOneBranch with reps == lbp_reps == 0)
        return BranchTestResult(
            edges=np.asarray(edges),
            sh_alrt=np.zeros(E),
            lbp=np.zeros(E),
            alrt_parametric=alrt_param,
            abayes=abayes,
        )

    # RELL: one weight matrix for all branches (the reference draws a fresh
    # resample per branch; sharing them across branches is statistically
    # equivalent for the per-branch supports and lets everything batch)
    probs = np.asarray(site.pattern_freq, dtype=np.float64)
    probs = probs / probs.sum()
    w = rng.multinomial(n_sites, probs, size=reps).astype(np.float32)  # [R, P]
    pat = np.concatenate(
        [np.broadcast_to(pattern_lnl, (E, 1, P)), alt_site], axis=1
    )  # [E, 3, P]
    pat_j = jnp.asarray(pat.reshape(E * 3, P), dtype=jnp.float32)
    lh_new = np.asarray(
        jnp.einsum("ep,rp->er", pat_j, jnp.asarray(w), precision=HIGHEST)
    ).reshape(E, 3, reps)

    lh = np.stack([np.full(E, l0), l12[:, 0], l12[:, 1]], axis=1)  # [E, 3]
    cs = lh_new - lh[:, :, None]  # centered scores [E, 3, R]
    order = np.sort(cs, axis=1)
    cs_best = order[:, 2, :]
    cs_2nd = order[:, 1, :]
    sh_count = (alrt[:, None] > (cs_best - cs_2nd) + 0.05).mean(axis=1)
    lbp = (
        (lh_new[:, 0, :] > lh_new[:, 1, :]) & (lh_new[:, 0, :] > lh_new[:, 2, :])
    ).mean(axis=1)

    return BranchTestResult(
        edges=np.asarray(edges),
        sh_alrt=100.0 * sh_count,
        lbp=100.0 * lbp,
        alrt_parametric=alrt_param,
        abayes=abayes,
    )
