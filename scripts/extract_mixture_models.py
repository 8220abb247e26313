"""Extract the builtin mixture-model NEXUS definitions (published model
data: EX2/EX3/EHO, LG4M/LG4X, CF4, CAT C10-C60 profiles of Le, Lartillot,
Gascuel, Quang, Wang et al.) from the reference's embedded string constant
(/root/reference/model/modelmixture.cpp:19 builtin_mixmodels_definition)
into a plain NEXUS data file consumed by iqtree_tpu.io.modelsblock.

Run: python scripts/extract_mixture_models.py
"""

import re
from pathlib import Path

SRC = Path("/root/reference/model/modelmixture.cpp")
DST = Path(__file__).resolve().parent.parent / (
    "iqtree_tpu/models/data/builtin_mixmodels.nex"
)


def main():
    text = SRC.read_text()
    start = text.index("builtin_mixmodels_definition =")
    # the string literal runs until the terminating ";\n" after the last
    # line continuation; collect quoted segments
    m = re.search(
        r'builtin_mixmodels_definition\s*=\s*"(.*?)";', text, re.DOTALL
    )
    body = m.group(1)
    # unescape C line continuations and \n escapes
    body = body.replace("\\\n", "")
    body = body.replace("\\n", "\n")
    body = body.replace('\\"', '"')
    DST.write_text(body)
    n_models = len(re.findall(r"^\s*model\s+", body, re.MULTILINE))
    n_freqs = len(re.findall(r"^\s*frequency\s+", body, re.MULTILINE))
    print(f"wrote {DST} ({n_models} models, {n_freqs} frequency vectors)")


if __name__ == "__main__":
    main()
