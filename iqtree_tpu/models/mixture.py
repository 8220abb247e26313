"""Mixture substitution models (the ModelMixture equivalent).

Re-expression of /root/reference/model/modelmixture.cpp for the
per-category engine: a mixture is M fixed (matrix, frequency) components
with weights and per-component rate multipliers; the engine fuses the
mixture axis with the rate-heterogeneity axis into ONE category axis C
(the reference's fused_mix_rate layout, phylotreesse.cpp:99-136), so
mixtures run through exactly the same pruning/derivative/NNI kernels.

Supported forms (builtin defs in models/data/builtin_mixmodels.nex;
user definitions via -mdef NEXUS models blocks):
  MIX{m1:rate1:w1,m2,...}      matrix mixtures (EX2, EHO, EX_EHO, ...)
  BASE+FMIX{f1:r:w,...}        frequency mixtures over one matrix
                               (CF4, CAT C10..C60; `empirical` = counted)
  MIX{...}*G4                  rate-fused mixtures (LG4M: class m pairs
                               with Gamma rate class m)
Weights given in the definition are fixed; omitted weights start equal
and are ML-optimized (softmax logits in models/optimize.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .subst import FREQ_USER, ReversibleModel

# process-wide -mwopt switch (set by the CLI before models are built):
# force mixture-class weights to be free parameters even when the model
# string pins them (reference params.optimize_mixmodel_weight)
FORCE_OPT_WEIGHTS = False


@dataclass
class MixtureModel:
    name: str
    components: List[ReversibleModel]  # each with fixed matrix + freqs
    weights: np.ndarray  # [M]
    comp_rates: np.ndarray  # [M] per-component rate multipliers
    fix_weights: bool = False
    fused_with_rate: bool = False  # LG4M-style `*G4`
    asc: bool = False

    @property
    def n_mix(self) -> int:
        return len(self.components)

    @property
    def num_states(self) -> int:
        return self.components[0].num_states

    @property
    def state_freq(self) -> np.ndarray:
        """Weight-averaged frequencies (reporting / invariable class)."""
        f = np.stack([c.state_freq for c in self.components])
        return (self.weights[:, None] * f).sum(0) / self.weights.sum()

    def eigen_all(self) -> Tuple[np.ndarray, ...]:
        """Stacked per-component eigensystems:
        (lam [M,S], V [M,S,S], V^-1 [M,S,S], freq [M,S])."""
        lams, vs, vinvs, freqs = [], [], [], []
        for c in self.components:
            lam, v, vinv = c.eigen()
            lams.append(lam)
            vs.append(v)
            vinvs.append(vinv)
            freqs.append(np.asarray(c.state_freq))
        return (
            np.stack(lams),
            np.stack(vs),
            np.stack(vinvs),
            np.stack(freqs),
        )

    # -- reporting helpers (mirrors ModelSubst API where needed) --------
    @property
    def n_free_weight_params(self) -> int:
        return 0 if self.fix_weights else self.n_mix - 1


def _parse_component_list(body: str) -> List[Tuple[str, float, Optional[float]]]:
    """'A:1.2:0.3,B,C:2' -> [(name, rate, weight|None), ...]  (the
    reference's NAME:RATE:WEIGHT component syntax)."""
    out = []
    for tok in body.split(","):
        parts = tok.split(":")
        name = parts[0]
        rate = float(parts[1]) if len(parts) > 1 and parts[1] else 1.0
        weight = float(parts[2]) if len(parts) > 2 and parts[2] else None
        out.append((name, rate, weight))
    return out


def build_mixture(
    base_token: str,
    fmix_body: Optional[str],
    aln,
    defs: Dict[str, object],
    resolve_base,
) -> "MixtureModel":
    """Construct a MixtureModel from either a `MIX{...}` base token or a
    (plain base, `+FMIX{...}` suffix) pair.

    `resolve_base(name) -> ReversibleModel` resolves plain component
    names (builtin matrices like LG/JTT/POISSON, or MatrixDef entries in
    `defs`).  `defs` comes from modelsblock.parse_models_nexus.
    """
    from ..io.modelsblock import FreqDef, MatrixDef

    fused = False
    tok = base_token
    star = None
    if "*" in tok:
        tok, star = tok.split("*", 1)
        fused = True

    if fmix_body is not None:
        # frequency mixture: same matrix, per-class frequencies
        base = resolve_base(tok)
        comps: List[ReversibleModel] = []
        rates, weights = [], []
        for name, rate, weight in _parse_component_list(fmix_body):
            if name.lower() == "empirical":
                freq = aln.state_frequencies()
            else:
                d = defs.get(name.upper())
                if not isinstance(d, FreqDef):
                    raise ValueError(f"unknown frequency vector {name!r}")
                freq = d.freqs
            c = ReversibleModel(
                name=f"{base.name}+{name}",
                num_states=base.num_states,
                rate_groups=base.rate_groups,
                group_rates=base.group_rates,
                exchange=base.exchange,
                freq_type=FREQ_USER,
                state_freq=np.asarray(freq, float),
                fixed_rates=True,
            )
            comps.append(c)
            rates.append(rate)
            weights.append(weight)
        mixname = f"{base.name}+FMIX"
    else:
        if not (tok.upper().startswith("MIX{") and tok.endswith("}")):
            raise ValueError(f"not a mixture token: {base_token!r}")
        body = tok[4:-1]
        comps, rates, weights = [], [], []
        for name, rate, weight in _parse_component_list(body):
            comps.append(resolve_base(name))
            rates.append(rate)
            weights.append(weight)
        mixname = "MIX"

    M = len(comps)
    given = [w for w in weights if w is not None]
    if given and len(given) != M:
        raise ValueError("mixture weights must be given for all or none")
    if given:
        w = np.asarray(given, float)
        w = w / w.sum()
        # -mwopt forces weight optimization even when weights were given
        # (reference optimize_mixmodel_weight, tools.cpp:1805)
        fix_weights = not FORCE_OPT_WEIGHTS
    else:
        w = np.full(M, 1.0 / M)
        fix_weights = False
    mix = MixtureModel(
        name=mixname,
        components=comps,
        weights=w,
        comp_rates=np.asarray(rates, float),
        fix_weights=fix_weights,
        fused_with_rate=fused,
    )
    return mix, star
