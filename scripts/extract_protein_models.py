#!/usr/bin/env python
"""Extract empirical amino-acid replacement matrices into a data file.

The empirical protein models (JTT, WAG, LG, mtREV, ...) are published
scientific constants (Jones et al. 1992, Whelan & Goldman 2001, Le &
Gascuel 2008, etc.).  Every phylogenetics package ships the same numbers;
we materialize them from the reference implementation's tables
(/root/reference/model/modelprotein.cpp:38-2455, the daa/f assignment
blocks) into iqtree_tpu/models/data/protein_models.npz.

Run:  python scripts/extract_protein_models.py
"""

import os
import re
import sys

import numpy as np

SRC = "/root/reference/model/modelprotein.cpp"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "iqtree_tpu", "models", "data",
    "protein_models.npz",
)


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    text = re.sub(r"//[^\n]*", "", text)
    return text


def main():
    text = strip_comments(open(SRC).read())
    # split into per-model blocks
    blocks = re.split(r'prot_model == "([A-Z0-9]+)"', text)
    # blocks = [prefix, name1, body1, name2, body2, ...]
    out = {}
    for i in range(1, len(blocks) - 1, 2):
        name = blocks[i]
        body = blocks[i + 1]
        # body extends to the next split point; assignments of the NEXT
        # model are not present since split consumed them
        daa = np.zeros((20, 20))
        f = np.zeros(20)
        for m in re.finditer(
            r"daa\[\s*(\d+)\s*\*\s*20\s*\+\s*(\d+)\s*\]\s*=\s*([0-9.eE+-]+)", body
        ):
            a, b, v = int(m.group(1)), int(m.group(2)), float(m.group(3))
            daa[a, b] = v
        for m in re.finditer(r"f\[\s*(\d+)\s*\]\s*=\s*([0-9.eE+-]+)", body):
            f[int(m.group(1))] = float(m.group(2))
        if name == "POISSON":
            daa = np.ones((20, 20))
            if f.sum() == 0:
                f = np.full(20, 0.05)
        if daa.sum() == 0 and name != "POISSON":
            print(f"WARNING: no daa entries for {name}", file=sys.stderr)
            continue
        # symmetrize (reference fills lower triangle only) and normalize f
        daa = np.maximum(daa, daa.T)
        np.fill_diagonal(daa, 0.0)
        f = f / f.sum()
        out[f"{name}_rates"] = daa
        out[f"{name}_freq"] = f
        print(f"{name}: daa nonzero {np.count_nonzero(daa)}, f sum 1.0")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} with {len(out)//2} models")


if __name__ == "__main__":
    main()
