"""Named DNA substitution models.

The reference's name->rate-code table (/root/reference/model/modeldna.cpp:
41-240): each 6-character code assigns the rate pairs AC,AG,AT,CG,CT,GT to
equality groups; group '0' is the reference rate pinned to 1.  Arbitrary
user codes like "010010" are accepted too (ModelDNA::init).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .subst import (
    FREQ_EQUAL,
    FREQ_EMPIRICAL,
    FREQ_ESTIMATE,
    ReversibleModel,
)

# name -> (rate code over AC,AG,AT,CG,CT,GT ; default frequency policy)
# NOTE: the reference's FREQ_ESTIMATE default resolves to empirical counts
# unless +FO is given; we record "estimate" and let the factory decide.
DNA_MODELS: Dict[str, Tuple[str, str]] = {
    "JC": ("000000", FREQ_EQUAL),
    "JC69": ("000000", FREQ_EQUAL),
    "F81": ("000000", FREQ_ESTIMATE),
    "K2P": ("010010", FREQ_EQUAL),
    "K80": ("010010", FREQ_EQUAL),
    "HKY": ("010010", FREQ_ESTIMATE),
    "HKY85": ("010010", FREQ_ESTIMATE),
    "K3P": ("012210", FREQ_EQUAL),
    "K81": ("012210", FREQ_EQUAL),
    "TPM1": ("012210", FREQ_EQUAL),
    "K3PU": ("012210", FREQ_ESTIMATE),
    "K81U": ("012210", FREQ_ESTIMATE),
    "K81UF": ("012210", FREQ_ESTIMATE),
    "TPM1U": ("012210", FREQ_ESTIMATE),
    "TPM1UF": ("012210", FREQ_ESTIMATE),
    "TN": ("010020", FREQ_ESTIMATE),
    "TRN": ("010020", FREQ_ESTIMATE),
    "TN93": ("010020", FREQ_ESTIMATE),
    "TNE": ("010020", FREQ_EQUAL),
    "TNEF": ("010020", FREQ_EQUAL),
    "TPM2": ("121020", FREQ_ESTIMATE),
    "TPM2U": ("121020", FREQ_ESTIMATE),
    "TPM2UF": ("121020", FREQ_ESTIMATE),
    "TPM3": ("120120", FREQ_ESTIMATE),
    "TPM3U": ("120120", FREQ_ESTIMATE),
    "TPM3UF": ("120120", FREQ_ESTIMATE),
    "TIM": ("012230", FREQ_ESTIMATE),
    "TIM1": ("012230", FREQ_ESTIMATE),
    "TIME": ("012230", FREQ_EQUAL),
    "TIMEF": ("012230", FREQ_EQUAL),
    "TIM2": ("121030", FREQ_ESTIMATE),
    "TIM2E": ("121030", FREQ_EQUAL),
    "TIM2EF": ("121030", FREQ_EQUAL),
    "TIM3": ("120130", FREQ_ESTIMATE),
    "TIM3E": ("120130", FREQ_EQUAL),
    "TIM3EF": ("120130", FREQ_EQUAL),
    "TVM": ("412310", FREQ_ESTIMATE),
    "TVME": ("412310", FREQ_EQUAL),
    "TVMEF": ("412310", FREQ_EQUAL),
    "SYM": ("123450", FREQ_EQUAL),
    "GTR": ("123450", FREQ_ESTIMATE),
    "REV": ("123450", FREQ_ESTIMATE),
}

def _code_to_groups(code: str) -> np.ndarray:
    if len(code) != 6 or not code.isalnum():
        raise ValueError(f"bad DNA rate code {code!r}")
    # remap arbitrary digits to dense group ids with '0' staying group 0
    groups = []
    mapping = {"0": 0}
    for ch in code:
        if ch not in mapping:
            mapping[ch] = len(mapping)
        groups.append(mapping[ch])
    return np.asarray(groups, dtype=np.int32)


def create_dna_model(name: str, state_freq: Optional[np.ndarray] = None) -> ReversibleModel:
    upper = name.upper()
    if upper in DNA_MODELS:
        code, freq_type = DNA_MODELS[upper]
    elif len(name) == 6 and all(c.isdigit() for c in name):
        code, freq_type = name, FREQ_ESTIMATE
        upper = name
    else:
        raise ValueError(f"unknown DNA model {name!r}")
    return ReversibleModel(
        name=upper if upper in DNA_MODELS else name,
        num_states=4,
        rate_groups=_code_to_groups(code),
        freq_type=freq_type,
        state_freq=state_freq,
    )
