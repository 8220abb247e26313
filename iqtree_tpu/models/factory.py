"""Model-string parsing and construction (the ModelFactory equivalent).

Parses IQ-TREE-style model strings like "GTR+G4+I", "HKY+F{.3,.2,.2,.3}",
"TN93e+R4", "WAG+G", "C20+G", "MIX{HKY{2.0},GTR}+G", "LG4M" into a
(substitution model | MixtureModel, RateModel) pair, mirroring
/root/reference/model/modelfactory.cpp:296-368, ModelGTR::init, and
modelmixture.cpp createModel (:982-1031).

Supported suffixes:
  +F    empirical (counted) frequencies        [+F  in reference]
  +FO   ML-optimized frequencies               [+FO]
  +FQ   equal frequencies                      [+FQ]
  +F{a,b,...} user frequencies                 [+FU / +F{...}]
  +I[{p}]       invariable sites
  +G[n][{a}]    discrete Gamma (default n=4)
  +R[n][{r,w,...}]  FreeRate
  +Gm           median instead of mean rates (reference -gmedian)
  +ASC          Lewis ascertainment-bias correction
  +FMIX{f1:r:w,...}  frequency-mixture classes (CF4/C10..C60 style)
Model parameters may be pinned inline: GTR{1.5,2.0,...}.  Mixture names
(EX2, EX3, EHO, EX_EHO, LG4M, LG4X, CF4, C10..C60) resolve from the
builtin NEXUS definitions; `user_defs` adds -mdef definitions.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from ..io.alignment import (
    Alignment,
    SEQ_BINARY,
    SEQ_CODON,
    SEQ_DNA,
    SEQ_MORPH,
    SEQ_PROTEIN,
)
from ..io.modelsblock import ExprDef, FreqDef, MatrixDef, builtin_mixture_defs
from .dna import DNA_MODELS, create_dna_model
from .mixture import MixtureModel, build_mixture
from .rates import RateModel
from .subst import (
    FREQ_EMPIRICAL,
    FREQ_EQUAL,
    FREQ_ESTIMATE,
    FREQ_USER,
    ReversibleModel,
)


class ModelParseError(ValueError):
    pass


def _split_suffixes(s: str):
    """'GTR{1,2}+F+G4{0.5}' -> ('GTR{1,2}', ['F', 'G4{0.5}', ...])"""
    parts = []
    depth = 0
    cur = []
    for ch in s:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "+" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts[0], parts[1:]


def _parse_braces(tok: str) -> Tuple[str, Optional[list]]:
    m = re.match(r"([^{]*)(?:\{([^}]*)\})?$", tok)
    if not m:
        raise ModelParseError(f"bad model token {tok!r}")
    name = m.group(1)
    vals = None
    if m.group(2) is not None:
        vals = [float(x) for x in m.group(2).split(",") if x.strip()]
    return name, vals


def parse_model_string(
    model_str: str,
    aln: Alignment,
    user_defs: Optional[Dict[str, object]] = None,
):
    """Returns (ReversibleModel | MixtureModel, RateModel)."""
    defs = dict(builtin_mixture_defs())
    if user_defs:
        defs.update(user_defs)

    base_tok, suffixes = _split_suffixes(model_str.strip())

    def resolve_base(name: str) -> ReversibleModel:
        """Resolve a plain (non-mixture) component/base model name."""
        bname, bparams = _parse_braces(name)
        d = defs.get(bname.upper())
        if isinstance(d, MatrixDef):
            if d.exchange.shape[0] != aln.num_states:
                raise ModelParseError(
                    f"model {bname} has {d.exchange.shape[0]} states, "
                    f"alignment has {aln.num_states}"
                )
            freq = (
                d.freqs if d.freqs is not None else aln.state_frequencies()
            )
            return ReversibleModel(
                name=d.name,
                num_states=d.exchange.shape[0],
                exchange=d.exchange,
                freq_type=FREQ_USER,
                state_freq=np.asarray(freq, float),
                fixed_rates=True,
            )
        m = _create_subst(bname, aln)
        if bparams is not None:
            if m.rate_groups is None:
                raise ModelParseError(f"{bname} takes no rate parameters")
            ngroups = int(m.rate_groups.max()) + 1
            if len(bparams) != ngroups - 1:
                raise ModelParseError(
                    f"{bname} expects {ngroups - 1} rate parameters, got "
                    f"{len(bparams)}"
                )
            m.set_rate_param_vector(np.asarray(bparams))
            m.fixed_rates = True
        return m

    # --- expand ExprDef aliases (builtin mixtures like C10, LG4M) -------
    plain = base_tok.split("*")[0].split("{")[0]
    d = defs.get(plain.upper())
    if isinstance(d, ExprDef):
        inner_base, inner_suffixes = _split_suffixes(d.expr)
        base_tok = inner_base
        suffixes = inner_suffixes + suffixes

    # --- pull out a frequency-mixture suffix ----------------------------
    fmix_body = None
    rest = []
    for tok in suffixes:
        if tok.upper().startswith("FMIX{") and tok.endswith("}"):
            fmix_body = tok[5:-1]
        else:
            rest.append(tok)
    suffixes = rest

    # --- construct the substitution model -------------------------------
    subst: object
    base_params = None
    mix_star = None
    if base_tok.upper().startswith("MIX{") or fmix_body is not None:
        subst, mix_star = build_mixture(
            base_tok, fmix_body, aln, defs, resolve_base
        )
    else:
        base_name, base_params = _parse_braces(base_tok)
        subst = resolve_base(base_tok)

    is_mix = isinstance(subst, MixtureModel)

    gamma_cats = 0
    invar = False
    free_cats = 0
    kat_cats = 0
    alpha, p_invar = 1.0, 0.0
    fix_alpha = fix_pinv = False
    gamma_median = False
    free_init = None
    freq_set = False

    for tok in suffixes:
        name, vals = _parse_braces(tok)
        upper = name.upper()
        if upper in ("F", "FO", "FE", "FQ", "FU", "FC"):
            if is_mix:
                raise ModelParseError(
                    "frequency suffixes don't apply to mixture models"
                )
            if upper == "F":
                if vals:
                    f = np.asarray(vals)
                    if len(f) != subst.num_states:
                        raise ModelParseError(
                            f"+F expects {subst.num_states} frequencies"
                        )
                    subst.state_freq = f / f.sum()
                    subst.freq_type = FREQ_USER
                else:
                    subst.freq_type = FREQ_EMPIRICAL
            elif upper in ("FO", "FE"):
                subst.freq_type = FREQ_ESTIMATE
            elif upper == "FQ":
                subst.freq_type = FREQ_EQUAL
                subst.state_freq = np.full(
                    subst.num_states, 1.0 / subst.num_states
                )
            elif upper == "FU":
                subst.freq_type = FREQ_USER
            freq_set = True
        elif upper in ("F1X4", "F3X4"):
            from .codon import product_codon_freqs

            if aln.states.seq_type != SEQ_CODON:
                raise ModelParseError(f"+{upper} needs codon data")
            nt = aln.codon_nt_frequencies(by_position=(upper == "F3X4"))
            subst.nt_freq = nt
            subst.state_freq = product_codon_freqs(
                nt, aln.states.genetic_code
            )
            subst.freq_type = FREQ_USER
            freq_set = True
        elif upper == "I":
            invar = True
            if vals:
                p_invar, fix_pinv = vals[0], True
        elif upper.startswith("G") and (len(upper) == 1 or upper[1:].isdigit()
                                        or (upper.startswith("GM") and
                                            upper[2:].isdigit())
                                        or upper == "GM"):
            if upper.startswith("GM"):
                gamma_median = True
                gamma_cats = int(upper[2:]) if len(upper) > 2 else (
                    gamma_cats or 4
                )
            else:
                gamma_cats = int(upper[1:]) if len(upper) > 1 else 4
            if vals:
                alpha, fix_alpha = vals[0], True
        elif upper.startswith("R") and (len(upper) == 1 or upper[1:].isdigit()):
            free_cats = int(upper[1:]) if len(upper) > 1 else 4
            if vals:
                free_init = np.asarray(vals)
        elif upper.startswith("K") and (len(upper) == 1 or upper[1:].isdigit()):
            # +K{n}: RateKategory — free rates, equal category weights
            # (modelfactory.cpp:527-531, ratekategory.cpp:23)
            kat_cats = int(upper[1:]) if len(upper) > 1 else 4
        elif upper == "ASC":
            subst.asc = True
        else:
            raise ModelParseError(f"unknown model suffix +{name}")

    if not is_mix:
        if not freq_set:
            # resolve the model's default policy; FREQ_ESTIMATE default means
            # "empirical counts" for DNA in the reference (e.g. GTR+G reports
            # 'empirical counts from alignment')
            if subst.freq_type == FREQ_ESTIMATE:
                subst.freq_type = FREQ_EMPIRICAL
        if subst.freq_type == FREQ_EMPIRICAL or subst.freq_type == FREQ_ESTIMATE:
            subst.state_freq = aln.state_frequencies()

    if subst.asc:
        # reference rejects +ASC with invariable sites / +I (Lewis
        # correction conditions on variability; modelfactory.cpp:341-356)
        if invar:
            raise ModelParseError("+ASC is incompatible with +I")
        if aln.frac_const_sites() > 0:
            raise ModelParseError(
                "+ASC requires an alignment without constant sites"
            )

    if is_mix and subst.fused_with_rate:
        # `MIX{..}*G4` fuses class m with Gamma rate class m (LG4M);
        # `MIX{..}*R4` fuses with FreeRate, whose free weights double as
        # the mixture weights (LG4X; Le, Dang & Gascuel 2012)
        if mix_star and mix_star.upper().startswith("R"):
            free_cats = subst.n_mix
            gamma_cats = 0
            subst.fix_weights = True  # tied to the FreeRate weights
        else:
            if gamma_cats and gamma_cats != subst.n_mix:
                raise ModelParseError(
                    f"fused mixture {subst.name} needs G{subst.n_mix}"
                )
            gamma_cats = gamma_cats or subst.n_mix

    if kat_cats and (gamma_cats or free_cats or invar):
        raise ModelParseError("+K cannot combine with +G/+R/+I")
    rate = RateModel.make(
        gamma_cats=gamma_cats,
        invar=invar,
        free_cats=free_cats,
        kat_cats=kat_cats,
        alpha=alpha,
        p_invar=p_invar,
        gamma_median=gamma_median,
        fix_alpha=fix_alpha,
        fix_p_invar=fix_pinv,
    )
    from .codon import CodonModel

    if isinstance(subst, CodonModel):
        subst.refresh_exchange()
    if free_init is not None:
        k = free_cats
        if len(free_init) == 2 * k:
            rate.free_props = free_init[0::2].copy()
            rate.free_rates = free_init[1::2].copy()
        else:
            raise ModelParseError(f"+R{k} expects {2*k} values (w1,r1,...)")
    return subst, rate


def _create_subst(name: str, aln: Alignment) -> ReversibleModel:
    upper = name.upper()
    st = aln.states.seq_type
    if st == SEQ_DNA:
        if upper == "UNREST":
            from .nonrev import NonRevModel

            return NonRevModel()
        return create_dna_model(name)
    if st == SEQ_BINARY:
        if upper in ("JC2", ""):
            return ReversibleModel("JC2", 2, rate_groups=np.array([0]),
                                   freq_type=FREQ_EQUAL)
        if upper == "GTR2":
            return ReversibleModel("GTR2", 2, rate_groups=np.array([0]),
                                   freq_type=FREQ_ESTIMATE)
        raise ModelParseError(f"unknown binary model {name!r}")
    if st == SEQ_MORPH:
        ns = aln.num_states
        npairs = ns * (ns - 1) // 2
        if upper in ("MK", ""):
            return ReversibleModel("MK", ns, rate_groups=np.zeros(npairs, int),
                                   freq_type=FREQ_EQUAL)
        if upper == "ORDERED":
            # stepwise character change only (morph_model_names,
            # phylotesting.cpp:45)
            band = np.zeros((ns, ns))
            for i in range(ns - 1):
                band[i, i + 1] = band[i + 1, i] = 1.0
            return ReversibleModel("ORDERED", ns, exchange=band,
                                   freq_type=FREQ_EQUAL, fixed_rates=True)
        raise ModelParseError(f"unknown morphology model {name!r}")
    if st == SEQ_PROTEIN:
        from .protein import create_protein_model

        return create_protein_model(name)
    if st == SEQ_CODON:
        from .codon import CodonModel, empirical_codon_model

        code = aln.states.genetic_code
        ns = aln.num_states
        if upper in ("KOSI07", "ECM", "ECMK07", "ECMREST", "SCHN05", "ECMS05"):
            return empirical_codon_model(upper, code)
        if upper in ("GY", "GY94", ""):
            m = CodonModel("GY", ns, code_id=code,
                           freq_type=FREQ_EMPIRICAL)
        elif upper in ("MG", "MG94"):
            m = CodonModel("MG", ns, code_id=code, mg=True,
                           freq_type=FREQ_USER)
        else:
            raise ModelParseError(f"unknown codon model {name!r}")
        m.nt_freq = aln.codon_nt_frequencies(by_position=True)
        if m.mg:
            from .codon import product_codon_freqs

            m.state_freq = product_codon_freqs(m.nt_freq, code)
        return m
    raise ModelParseError(f"no models for sequence type {st}")


def default_model(aln: Alignment) -> str:
    """Reference default when -m is omitted: HKY+G for DNA, LG+G for protein
    (cf. phyloanalysis.cpp initializeParams defaults)."""
    st = aln.states.seq_type
    if st == SEQ_DNA:
        return "HKY+G"
    if st == SEQ_PROTEIN:
        return "LG+G"
    if st == SEQ_BINARY:
        return "JC2+G"
    if st == SEQ_CODON:
        return "GY+G"
    return "MK+G"
