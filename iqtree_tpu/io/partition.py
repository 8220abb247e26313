"""Partition definitions: NEXUS `sets` block and RAxML-style files.

Replaces the reference's MSetsBlock/NCL machinery
(/root/reference/msetsblock.cpp, consumed by PhyloSuperTree::readPartition,
phylosupertree.cpp).  Grammar:

  NEXUS (example/example.nex):
    #nexus
    begin sets;
      charset part1 = 1-100;
      charset part2 = 101-384;        [ also: 1-100\\3 (codon step), lists ]
      charpartition mine = HKY+G:part1, GTR+I+G:part2;
    end;

  RAxML style:
    DNA, part1 = 1-100
    GTR+G, part2 = 101-384

Returns a list of PartitionDef(name, model, sites) with 0-based site
index arrays into the full alignment.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class PartitionDef:
    name: str
    model: Optional[str]  # model string or None (use CLI -m / default)
    sites: np.ndarray  # [n] 0-based site indices
    seq_type: Optional[str] = None  # from RAxML-style DNA/AA prefix


def _parse_ranges(spec: str, n_sites_hint: int = 10**9) -> np.ndarray:
    """'1-100 205 300-400\\3' -> 0-based indices (NEXUS charset syntax,
    msetsblock.cpp readCharset semantics)."""
    out: List[int] = []
    for tok in spec.replace(",", " ").split():
        m = re.fullmatch(r"(\d+)(?:-(\d+|\.))?(?:\\(\d+))?", tok)
        if not m:
            raise ValueError(f"bad charset range {tok!r}")
        a = int(m.group(1))
        b = m.group(2)
        step = int(m.group(3)) if m.group(3) else 1
        if b is None:
            out.append(a - 1)
        else:
            end = n_sites_hint if b == "." else int(b)
            out.extend(range(a - 1, end, step))
    return np.asarray(sorted(set(out)), dtype=np.int64)


def parse_nexus_sets(text: str, n_sites: int = 10**9) -> List[PartitionDef]:
    text = re.sub(r"\[[^\]]*\]", " ", text)
    m = re.search(r"begin\s+sets\s*;(.*?)end\s*;", text,
                  re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError("no `begin sets;` block found")
    body = m.group(1)
    charsets = {}
    order: List[str] = []
    for cm in re.finditer(r"charset\s+(\S+)\s*=\s*([^;]+);", body,
                          re.IGNORECASE):
        name = cm.group(1)
        charsets[name.upper()] = _parse_ranges(cm.group(2).strip(), n_sites)
        order.append(name)
    parts: List[PartitionDef] = []
    pm = re.search(r"charpartition\s+\S+\s*=\s*([^;]+);", body, re.IGNORECASE)
    if pm:
        for item in pm.group(1).split(","):
            item = item.strip()
            if not item:
                continue
            if ":" in item:
                model, cname = item.rsplit(":", 1)
                model = model.strip() or None
            else:
                model, cname = None, item
            cname = cname.strip()
            # strip partition-specific rate "{...}" (reference -spp syntax)
            cname = re.sub(r"\{[^}]*\}$", "", cname).strip()
            if cname.upper() not in charsets:
                raise ValueError(f"charpartition references unknown charset "
                                 f"{cname!r}")
            parts.append(PartitionDef(cname, model, charsets[cname.upper()]))
    else:
        for name in order:
            parts.append(PartitionDef(name, None, charsets[name.upper()]))
    return parts


_RAXML_TYPES = {
    "DNA": "DNA", "AA": "AA", "PROT": "AA", "BIN": "BIN", "MORPH": "MORPH",
    "CODON": "CODON",
}


def parse_raxml_partitions(text: str, n_sites: int = 10**9) -> List[PartitionDef]:
    parts: List[PartitionDef] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = re.match(r"([^,]+),\s*(\S+)\s*=\s*(.+)", line)
        if not m:
            raise ValueError(f"bad partition line {line!r}")
        tag = m.group(1).strip()
        name = m.group(2)
        sites = _parse_ranges(m.group(3), n_sites)
        # a bare data-type tag (DNA/AA/...) means "no model given"; anything
        # else is a model string
        seq_type = _RAXML_TYPES.get(tag.upper())
        model = None if seq_type is not None else tag
        parts.append(PartitionDef(name, model, sites, seq_type))
    return parts


def read_partition_file(path: str, n_sites: int = 10**9) -> List[PartitionDef]:
    text = open(path).read()
    if text.lstrip()[:6].upper() == "#NEXUS":
        return parse_nexus_sets(text, n_sites)
    return parse_raxml_partitions(text, n_sites)
