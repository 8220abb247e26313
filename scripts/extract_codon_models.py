"""Extract the empirical codon models (published data: Kosiol et al. 2007
ECM unrestricted/restricted from http://www.ebi.ac.uk/goldman/ECM/, and
Schneider et al. 2005) from the reference's embedded string constants
(/root/reference/model/modelcodon.cpp model_ECMunrest/model_ECMrest/
model_ECM_Schneider05) into models/data/codon_models.npz, with rows/cols
remapped to this package's sense-codon order (ACGT-lexicographic over the
standard genetic code, matching readCodonModel's state_map logic,
modelcodon.cpp:561-607).

Run: python scripts/extract_codon_models.py
"""

import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from iqtree_tpu.models.codon import codon_strings  # noqa: E402

SRC = Path("/root/reference/model/modelcodon.cpp")
DST = (
    Path(__file__).resolve().parent.parent
    / "iqtree_tpu/models/data/codon_models.npz"
)


def _extract_strings(text: str, var: str) -> str:
    """Concatenate the RHS of `string VAR = ...;` — any mix of C string
    literals (with backslash line continuations) and other string
    variable names joined by '+'."""
    m = re.search(rf"string\s+{var}\s*=", text)
    if not m:
        raise SystemExit(f"cannot find {var}")
    i = m.end()
    out = []
    while i < len(text):
        ch = text[i]
        if ch == '"':
            j = i + 1
            buf = []
            while text[j] != '"':
                if text[j] == "\\":
                    nxt = text[j + 1]
                    if nxt == "\n":
                        buf.append(" ")  # line continuation
                    elif nxt == "n":
                        buf.append("\n")
                    elif nxt == "t":
                        buf.append(" ")
                    else:
                        buf.append(nxt)
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            out.append("".join(buf))
            i = j + 1
        elif ch == ";":
            break
        elif ch in "+ \t\n":
            i += 1
        else:
            j = i
            while text[j].isalnum() or text[j] == "_":
                j += 1
            out.append(_extract_strings(text, text[i:j]))
            i = j
    return " ".join(out)


def parse_codon_model(raw: str):
    toks = raw.split()
    ns = 61
    ntri = ns * (ns - 1) // 2
    vals = [float(t) for t in toks[: ntri + ns]]
    labels = toks[ntri + ns: ntri + ns + ns]
    assert all(len(l) == 3 for l in labels), labels[:5]
    ours = codon_strings(1)
    pos = {lab: k for k, lab in enumerate(ours)}
    perm = np.array([pos[l] for l in labels])  # data row i -> our state
    ex = np.zeros((ns, ns))
    k = 0
    for i in range(1, ns):
        for j in range(i):
            ex[perm[i], perm[j]] = ex[perm[j], perm[i]] = vals[k]
            k += 1
    freq = np.zeros(ns)
    for i in range(ns):
        freq[perm[i]] = vals[k]
        k += 1
    freq = freq / freq.sum()
    return ex, freq


def main():
    text = SRC.read_text()
    out = {}
    for var, key in [
        ("model_ECMunrest", "ecm_unrest"),
        ("model_ECMrest", "ecm_rest"),
        ("model_ECM_Schneider05", "ecm_schn05"),
    ]:
        raw = _extract_strings(text, var)
        ex, freq = parse_codon_model(raw)
        out[key + "_exchange"] = ex
        out[key + "_freq"] = freq
        print(f"{key}: {ex.shape} exchange, freq sum {freq.sum():.6f}")
    np.savez_compressed(DST, **out)
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
