"""Likelihood mapping (TREE-PUZZLE style quartet analysis).

TPU-native re-expression of /root/reference/quartet.cpp (ported there
from TREE-PUZZLE lmap.c; driver doLikelihoodMapping :1345): instead of
the reference's per-quartet loop (OpenMP over quartets, each quartet
running the full tree machinery on a 4-leaf tree), ALL quartets x 3
topologies are evaluated in one batched device program:

  * the 4-taxon likelihood is a closed form over the two internal
    states: L_p = sum_c w_c sum_xy pi_x (P1 a)(P2 b)[x] P5[x,y]
    (P3 c)(P4 d)[y] — three [C,S,S]x[C,S,P] contractions
  * the 5 branch lengths of every (quartet, topology) are optimized by
    a vmapped full Newton (5x5 Hessian via jax.hessian — exact, tiny)
  * region assignment follows the reference's nearest-discrete-
    distribution rule over sorted likelihood weights
    (quartet.cpp:1044-1130): (1,0,0) -> corner, (.5,.5,0) -> edge,
    (1/3,1/3,1/3) -> center.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.eigen import transition_matrices
from .likelihood import ModelArrays, SiteData, tip_partials

HIGHEST = jax.lax.Precision.HIGHEST

# topology t: pairs (0, PAIRINGS[t][0]) | (the other two)
# T0 = (ab|cd), T1 = (ac|bd), T2 = (ad|bc) — reference ordering
_PAIR2 = np.array([[1, 2, 3], [2, 1, 3], [3, 1, 2]])


def _quartet_topology_lnl(model: ModelArrays, site: SiteData,
                          tips4: jnp.ndarray, log_blen: jnp.ndarray):
    """lnL of one 4-taxon topology given tips4 [4,S,P] ordered
    (a,b | c,d) and 5 log branch lengths (a,b,c,d,internal)."""
    t = jnp.exp(log_blen)
    tt = t[:, None] * model.rates[None, :]  # [5, C]
    P = transition_matrices(
        model.eigenvalues, model.eigvec, model.inv_eigvec, tt
    )  # [5, C, S, S]
    m = jnp.einsum("bcst,btp->bcsp", P[:4], tips4.astype(P.dtype),
                   precision=HIGHEST)
    u = m[0] * m[1]  # [C, S, P]
    v = m[2] * m[3]
    z = jnp.einsum("cxy,cyp->cxp", P[4], v, precision=HIGHEST)
    lh = jnp.einsum("c,cx,cxp,cxp->p", model.props, model.state_freq, u, z,
                    precision=HIGHEST)
    lh = jnp.maximum(lh, 1e-300)
    lnl_p = jnp.log(lh)
    # invariable-site class
    S = model.num_states
    mean_freq = model.mean_freq
    pi_ext = jnp.concatenate([mean_freq, jnp.ones((1,), mean_freq.dtype)])
    w = jnp.where(site.const_state >= 0,
                  pi_ext[jnp.clip(site.const_state, 0, S)], 0.0)
    ptn_invar = model.p_invar * w
    lnl_p = jnp.where(ptn_invar > 0,
                      jnp.logaddexp(lnl_p, jnp.log(jnp.maximum(ptn_invar,
                                                               1e-300))),
                      lnl_p)
    return jnp.sum(site.pattern_freq * lnl_p)


def _optimize_one(model, site, tips4, n_iter: int = 8):
    """Newton-optimize the 5 log-branch-lengths; returns max lnL."""

    def neg(lb):
        return -_quartet_topology_lnl(model, site, tips4, lb)

    lb0 = jnp.log(jnp.full((5,), 0.1))

    lo, hi = jnp.log(1e-6), jnp.log(50.0)
    halvings = 2.0 ** -jnp.arange(8)  # 1, 1/2, ..., 1/128

    def step(i, lb):
        g = jax.grad(neg)(lb)
        h = jax.hessian(neg)(lb) + jnp.eye(5) * 1e-4
        delta = jnp.linalg.solve(h, g)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, g)
        # damped Newton + damped gradient candidate fan; keep the best
        # (monotone by construction — the current point is a candidate)
        cands = jnp.concatenate([
            lb[None] - halvings[:, None] * delta[None],
            lb[None] - halvings[:, None] * g[None],
            lb[None],
        ])
        cands = jnp.clip(cands, lo, hi)
        vals = jax.vmap(neg)(cands)
        return cands[jnp.argmin(vals)]

    lb = jax.lax.fori_loop(0, n_iter, step, lb0)
    return -neg(lb)


def quartet_lnls(model: ModelArrays, site: SiteData,
                 quartets: jnp.ndarray, n_iter: int = 8) -> jnp.ndarray:
    """[Q, 3] optimized log-likelihoods for the 3 topologies of every
    quartet (rows of `quartets` are 4 taxon ids)."""
    tips = tip_partials(site, model.ncat)  # [N, S, P]

    def one_quartet(q):
        out = []
        for t in range(3):
            order = jnp.stack([q[0], q[_PAIR2[t][0]],
                               q[_PAIR2[t][1]], q[_PAIR2[t][2]]])
            tips4 = tips[order]  # [4, S, P]
            out.append(_optimize_one(model, site, tips4, n_iter))
        return jnp.stack(out)

    return jax.lax.map(one_quartet, quartets)


def region_assign(weights: np.ndarray) -> np.ndarray:
    """[Q] area index 0-6 by the reference's nearest-discrete-distribution
    rule (quartet.cpp:1044-1130). Areas 0-2: corners T1/T2/T3; 3-5:
    edges (T1T2 / T2T3 / T1T3); 6: center."""
    Q = weights.shape[0]
    order = np.argsort(-weights, axis=1)  # descending
    w_sorted = np.take_along_axis(weights, order, axis=1)
    treebits = np.array([1, 2, 4])
    # squared distances to (1,0,0), (1/2,1/2,0), (1/3,1/3,1/3)
    d100 = ((1.0 - w_sorted[:, 0]) ** 2 + w_sorted[:, 1] ** 2
            + w_sorted[:, 2] ** 2)
    d110 = ((0.5 - w_sorted[:, 0]) ** 2 + (0.5 - w_sorted[:, 1]) ** 2
            + w_sorted[:, 2] ** 2)
    d111 = ((w_sorted - 1.0 / 3.0) ** 2).sum(1)
    which = np.argmin(np.stack([d100, d110, d111], 1), axis=1)
    bits100 = treebits[order[:, 0]]
    bits110 = treebits[order[:, 0]] + treebits[order[:, 1]]
    bits = np.where(which == 0, bits100, np.where(which == 1, bits110, 7))
    area = np.empty(Q, dtype=np.int32)
    table = {1: 0, 2: 1, 4: 2, 3: 3, 6: 4, 5: 5, 7: 6}
    for b, a in table.items():
        area[bits == b] = a
    return area


@dataclass
class LikelihoodMapping:
    quartets: np.ndarray  # [Q, 4]
    lnls: np.ndarray  # [Q, 3]
    weights: np.ndarray  # [Q, 3] likelihood weights
    areas: np.ndarray  # [Q] 0-6
    # cluster-labeled corner captions for -lmclust output
    # (quartet.cpp:115-200); None = plain t1/t2/t3 labels
    corners: Optional[Tuple[str, str, str]] = None

    @property
    def n_quartets(self) -> int:
        return len(self.quartets)

    @property
    def resolved(self) -> float:
        return float(np.mean(self.areas <= 2))

    @property
    def partly_resolved(self) -> float:
        return float(np.mean((self.areas >= 3) & (self.areas <= 5)))

    @property
    def unresolved(self) -> float:
        return float(np.mean(self.areas == 6))

    def summary(self) -> str:
        L = ["LIKELIHOOD MAPPING ANALYSIS", "---------------------------", ""]
        L.append(f"Number of quartets: {self.n_quartets} (random choice)")
        L.append("")
        L.append("Quartet trees are based on the selected model of substitution.")
        L.append("")
        area_counts = np.bincount(self.areas, minlength=7)
        names = ["1 (t1)", "2 (t2)", "3 (t3)", "4 (t1t2)", "5 (t2t3)",
                 "6 (t1t3)", "7 (center)"]
        L.append("Area   Quartets   Fraction")
        for i, nm in enumerate(names):
            L.append(f"  {nm:<10} {area_counts[i]:<9} "
                     f"{area_counts[i] / max(self.n_quartets, 1):.4f}")
        L.append("")
        L.append(f"Resolved quartets:        {self.resolved * 100:.2f}%")
        L.append(f"Partly resolved quartets: {self.partly_resolved * 100:.2f}%")
        L.append(f"Unresolved quartets:      {self.unresolved * 100:.2f}%")
        return "\n".join(L)

    def write_svg(self, path: str):
        """Triangle plot of the quartet points (barycentric), the
        likelihood-mapping figure (.lmap.svg analogue)."""
        W = 560
        H = 520
        ax, ay = W / 2, 30.0
        bx, by = 30.0, H - 30.0
        cx, cy = W - 30.0, H - 30.0
        pts = []
        for w in self.weights:
            x = w[0] * ax + w[1] * cx + w[2] * bx
            y = w[0] * ay + w[1] * cy + w[2] * by
            pts.append((x, y))
        dots = "\n".join(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="1.6" fill="#1f6feb" '
            f'fill-opacity="0.6"/>' for x, y in pts
        )
        l1, l2, l3 = self.corners or ("t1 (ab|cd)", "t2 (ac|bd)",
                                      "t3 (ad|bc)")
        svg = f"""<?xml version="1.0"?>
<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}">
<polygon points="{ax},{ay} {cx},{cy} {bx},{by}" fill="none"
 stroke="#333" stroke-width="1.5"/>
<text x="{ax}" y="{ay - 8}" text-anchor="middle" font-size="13">{l1}</text>
<text x="{cx}" y="{cy + 16}" text-anchor="middle" font-size="13">{l2}</text>
<text x="{bx}" y="{by + 16}" text-anchor="middle" font-size="13">{l3}</text>
{dots}
<text x="{W / 2}" y="{H - 4}" text-anchor="middle" font-size="11">
{self.resolved * 100:.1f}% resolved / {self.partly_resolved * 100:.1f}% partly
 / {self.unresolved * 100:.1f}% unresolved ({self.n_quartets} quartets)</text>
</svg>
"""
        with open(path, "w") as f:
            f.write(svg)

    def write_eps(self, path: str):
        """EPS triangle plot — the reference writes both .eps and .svg
        (finishLikelihoodMapping, quartet.cpp:366-670 initeps)."""
        W, H = 560.0, 520.0
        ax, ay = W / 2, H - 30.0
        bx, by = 30.0, 30.0
        cx, cy = W - 30.0, 30.0
        l1, l2, l3 = self.corners or ("t1 (ab|cd)", "t2 (ac|bd)",
                                      "t3 (ad|bc)")
        out = [
            "%!PS-Adobe-3.0 EPSF-3.0",
            f"%%BoundingBox: 0 0 {W:.0f} {H:.0f}",
            "%%Title: Likelihood mapping (iqtree_tpu)",
            "/Helvetica findfont 11 scalefont setfont",
            f"newpath {ax} {ay} moveto {cx} {cy} lineto {bx} {by} lineto "
            "closepath 0.5 setlinewidth stroke",
            f"{ax - 30} {ay + 8} moveto ({l1}) show",
            f"{cx - 60} {cy - 16} moveto ({l2}) show",
            f"{bx - 20} {by - 16} moveto ({l3}) show",
        ]
        for w in self.weights:
            x = w[0] * ax + w[1] * cx + w[2] * bx
            y = w[0] * ay + w[1] * cy + w[2] * by
            out.append(f"newpath {x:.1f} {y:.1f} 1.4 0 360 arc fill")
        out.append("showpage")
        with open(path, "w") as f:
            f.write("\n".join(out) + "\n")


def likelihood_mapping(
    model: ModelArrays,
    site: SiteData,
    n_taxa: int,
    n_quartets: int,
    rng: np.random.Generator,
    n_iter: int = 8,
    clusters: Optional["LmapClusters"] = None,
) -> LikelihoodMapping:
    """Sample random quartets (or cluster-constrained quartets with
    -lmclust) and map them (doLikelihoodMapping, quartet.cpp:1345)."""
    if clusters is not None:
        qs = sample_cluster_quartets(clusters, n_quartets, rng)
    else:
        qs = np.empty((n_quartets, 4), dtype=np.int32)
        for i in range(n_quartets):
            qs[i] = rng.choice(n_taxa, 4, replace=False)
    lnls = np.asarray(
        jax.jit(lambda m, s, q: quartet_lnls(m, s, q, n_iter))(
            model, site, jnp.asarray(qs)
        )
    )
    # likelihood weights (posterior probabilities of the 3 topologies)
    shifted = lnls - lnls.max(axis=1, keepdims=True)
    w = np.exp(shifted)
    w = w / w.sum(axis=1, keepdims=True)
    return LikelihoodMapping(
        quartets=qs, lnls=lnls, weights=w, areas=region_assign(w),
        corners=clusters.corner_labels() if clusters is not None else None,
    )


# ---- cluster (-lmclust) support -------------------------------------
# (readLikelihoodMappingGroups, /root/reference/quartet.cpp:1231-1345;
#  quartet sampling per cluster count :710-880)

@dataclass
class LmapClusters:
    names: List[str]  # cluster names (2-4 entries, 'ignored' excluded)
    groups: List[List[int]]  # taxon ids per cluster
    ignored: List[int]

    @property
    def n_groups(self) -> int:
        return len(self.groups)

    def unique_quartets(self) -> int:
        s = [len(g) for g in self.groups]
        if self.n_groups == 2:
            return (s[0] * (s[0] - 1)) // 2 * (s[1] * (s[1] - 1)) // 2
        if self.n_groups == 3:
            return s[0] * s[1] * (s[2] * (s[2] - 1)) // 2
        if self.n_groups == 4:
            return s[0] * s[1] * s[2] * s[3]
        raise ValueError("2-4 clusters required")

    def corner_labels(self):
        """(t1, t2, t3) corner captions — the cluster-labeled quartet
        splits of the reference SVG (quartet.cpp:115-200)."""
        n = self.names
        if self.n_groups == 2:
            return (f"({n[0]},{n[0]})-({n[1]},{n[1]})",
                    f"({n[0]},{n[1]})-({n[0]},{n[1]})",
                    f"({n[0]},{n[1]})-({n[0]},{n[1]})")
        if self.n_groups == 3:
            return (f"({n[0]},{n[1]})-({n[2]},{n[2]})",
                    f"({n[0]},{n[2]})-({n[1]},{n[2]})",
                    f"({n[0]},{n[2]})-({n[1]},{n[2]})")
        return (f"({n[0]},{n[1]})-({n[2]},{n[3]})",
                f"({n[0]},{n[2]})-({n[1]},{n[3]})",
                f"({n[0]},{n[3]})-({n[1]},{n[2]})")


def read_lmap_clusters(path: str, names: List[str]) -> LmapClusters:
    """-lmclust file: NEXUS `taxset NAME = t1 t2 ...;` sets or the
    RAxML-style `(t1, t2, t3) NAME` lines; a cluster named
    'ignored'/'IGNORED' lists sequences excluded from the analysis."""
    import re

    name_to_id = {n: i for i, n in enumerate(names)}
    text = open(path).read()
    sets: List[Tuple[str, List[str]]] = []
    if text.lstrip().lower().startswith("#nexus"):
        for m in re.finditer(r"taxset\s+(\S+)\s*=\s*([^;]+);", text,
                             re.IGNORECASE):
            sets.append((m.group(1), m.group(2).split()))
    else:
        for m in re.finditer(r"\(([^)]*)\)\s*([^\s(]*)", text):
            taxa = [t.strip() for t in m.group(1).split(",") if t.strip()]
            nm = m.group(2).strip() or f"Cluster{len(sets) + 1}"
            sets.append((nm, taxa))
    if not sets:
        raise ValueError(f"no clusters found in {path}")
    groups, gnames, ignored = [], [], []
    for nm, taxa in sets:
        ids = []
        for t in taxa:
            if t in name_to_id:
                ids.append(name_to_id[t])
            else:
                print(f"Warning: unknown sequence name \"{t}\"! "
                      f"Will be ignored.")
        if nm.lower() == "ignored":
            ignored = ids
        else:
            gnames.append(nm)
            groups.append(ids)
    if not (2 <= len(groups) <= 4):
        raise ValueError("-lmclust requires 2-4 clusters "
                         "(plus an optional 'ignored' cluster)")
    mins = {2: (2, 2), 3: (1, 1, 2), 4: (1, 1, 1, 1)}[len(groups)]
    for g, mn in zip(groups, mins):
        if len(g) < mn:
            raise ValueError("cluster too small for likelihood mapping "
                             f"(needs >= {mn} taxa)")
    return LmapClusters(names=gnames, groups=groups, ignored=ignored)


def sample_cluster_quartets(
    clusters: LmapClusters, n_quartets: int, rng: np.random.Generator
) -> np.ndarray:
    """[Q, 4] quartets drawn per the reference's cluster semantics:
    2 clusters -> (a,a,b,b); 3 -> (a,b,c,c); 4 -> (a,b,c,d)
    (computeQuartetLikelihoods, quartet.cpp:765-880).  n_quartets==0 or
    >= the unique count enumerates ALL unique quartets."""
    import itertools

    g = clusters.groups
    uq = clusters.unique_quartets()
    if n_quartets == 0 or n_quartets >= uq:
        if clusters.n_groups == 2:
            combos = [(a1, a2, b1, b2)
                      for a1, a2 in itertools.combinations(g[0], 2)
                      for b1, b2 in itertools.combinations(g[1], 2)]
        elif clusters.n_groups == 3:
            combos = [(a, b, c1, c2) for a in g[0] for b in g[1]
                      for c1, c2 in itertools.combinations(g[2], 2)]
        else:
            combos = list(itertools.product(*g))
        return np.asarray(combos, dtype=np.int32)
    qs = np.empty((n_quartets, 4), dtype=np.int32)
    for i in range(n_quartets):
        if clusters.n_groups == 2:
            a = rng.choice(g[0], 2, replace=False)
            b = rng.choice(g[1], 2, replace=False)
            qs[i] = [a[0], a[1], b[0], b[1]]
        elif clusters.n_groups == 3:
            c = rng.choice(g[2], 2, replace=False)
            qs[i] = [rng.choice(g[0]), rng.choice(g[1]), c[0], c[1]]
        else:
            qs[i] = [rng.choice(gr) for gr in g]
    return qs
