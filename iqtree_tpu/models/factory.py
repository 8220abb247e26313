"""Model-string parsing and construction (the ModelFactory equivalent).

Parses IQ-TREE-style model strings like "GTR+G4+I", "HKY+F{.3,.2,.2,.3}",
"TN93e+R4", "WAG+G" into a (ReversibleModel, RateModel) pair, mirroring
/root/reference/model/modelfactory.cpp:296-368 and ModelGTR::init.

Supported suffixes:
  +F    empirical (counted) frequencies        [+F  in reference]
  +FO   ML-optimized frequencies               [+FO]
  +FQ   equal frequencies                      [+FQ]
  +F{a,b,...} user frequencies                 [+FU / +F{...}]
  +I[{p}]       invariable sites
  +G[n][{a}]    discrete Gamma (default n=4)
  +R[n][{r,w,...}]  FreeRate
  +Gm           median instead of mean rates (reference -gmedian)
Model parameters may be pinned inline: GTR{1.5,2.0,...}.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np

from ..io.alignment import Alignment, SEQ_BINARY, SEQ_DNA, SEQ_MORPH, SEQ_PROTEIN
from .dna import DNA_MODELS, create_dna_model
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
    model_str: str, aln: Alignment
) -> Tuple[ReversibleModel, RateModel]:
    base_tok, suffixes = _split_suffixes(model_str.strip())
    base_name, base_params = _parse_braces(base_tok)

    subst = _create_subst(base_name, aln)
    if base_params is not None:
        if subst.rate_groups is not None:
            ngroups = int(subst.rate_groups.max()) + 1
            if len(base_params) != ngroups - 1:
                raise ModelParseError(
                    f"{base_name} expects {ngroups - 1} rate parameters, got "
                    f"{len(base_params)}"
                )
            subst.set_rate_param_vector(np.asarray(base_params))
            subst.fixed_rates = True
        else:
            raise ModelParseError(f"{base_name} takes no rate parameters")

    gamma_cats = 0
    invar = False
    free_cats = 0
    alpha, p_invar = 1.0, 0.0
    fix_alpha = fix_pinv = False
    gamma_median = False
    free_init = None
    freq_set = False

    for tok in suffixes:
        name, vals = _parse_braces(tok)
        upper = name.upper()
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
            freq_set = True
        elif upper in ("FO", "FE"):
            subst.freq_type = FREQ_ESTIMATE
            freq_set = True
        elif upper == "FQ":
            subst.freq_type = FREQ_EQUAL
            subst.state_freq = np.full(subst.num_states, 1.0 / subst.num_states)
            freq_set = True
        elif upper == "FU":
            subst.freq_type = FREQ_USER
            freq_set = True
        elif upper == "I":
            invar = True
            if vals:
                p_invar, fix_pinv = vals[0], True
        elif upper.startswith("G") and (len(upper) == 1 or upper[1:].isdigit()
                                        or upper == "GM"):
            if upper == "GM":
                gamma_median = True
                gamma_cats = gamma_cats or 4
            else:
                gamma_cats = int(upper[1:]) if len(upper) > 1 else 4
            if vals:
                alpha, fix_alpha = vals[0], True
        elif upper.startswith("R") and (len(upper) == 1 or upper[1:].isdigit()):
            free_cats = int(upper[1:]) if len(upper) > 1 else 4
            if vals:
                free_init = np.asarray(vals)
        elif upper == "ASC":
            raise ModelParseError("+ASC not implemented yet")
        else:
            raise ModelParseError(f"unknown model suffix +{name}")

    if not freq_set:
        # resolve the model's default policy; FREQ_ESTIMATE default means
        # "empirical counts" for DNA in the reference (e.g. GTR+G reports
        # 'empirical counts from alignment')
        if subst.freq_type == FREQ_ESTIMATE:
            subst.freq_type = FREQ_EMPIRICAL

    if subst.freq_type == FREQ_EMPIRICAL or (
        subst.freq_type == FREQ_ESTIMATE and freq_set
    ):
        subst.state_freq = aln.state_frequencies()
    if subst.freq_type == FREQ_ESTIMATE:
        subst.state_freq = aln.state_frequencies()  # ML start point

    rate = RateModel.make(
        gamma_cats=gamma_cats,
        invar=invar,
        free_cats=free_cats,
        alpha=alpha,
        p_invar=p_invar,
        gamma_median=gamma_median,
        fix_alpha=fix_alpha,
        fix_p_invar=fix_pinv,
    )
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
        raise ModelParseError(f"unknown morphology model {name!r}")
    if st == SEQ_PROTEIN:
        from .protein import create_protein_model

        return create_protein_model(name)
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
    return "MK+G"
