"""Newick tree parsing and printing.

A small, strict Newick reader/writer operating on a nested-tuple AST,
decoupled from the array tree encoding (iqtree_tpu.trees.tree converts
between the two).  Covers the dialect the reference reads/writes
(/root/reference/mtree.cpp readTree/printTree): branch lengths, internal
node labels/support values, quoted labels, comments in [...], and both
rooted (bifurcating root) and unrooted (trifurcating root) trees.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class NewickNode:
    name: str = ""
    length: Optional[float] = None
    children: List["NewickNode"] = field(default_factory=list)
    # internal-node label (bootstrap support etc.) is stored in `name` too

    @property
    def is_leaf(self) -> bool:
        return not self.children


class NewickError(ValueError):
    pass


def _tokenize(s: str):
    """Yield Newick tokens; strips [...] comments, handles quoted labels."""
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c == "[":
            j = s.find("]", i)
            if j < 0:
                raise NewickError("unterminated comment")
            i = j + 1
        elif c in "(),;:":
            yield c
            i += 1
        elif c == "'":
            j = i + 1
            buf = []
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":  # escaped quote
                        buf.append("'")
                        j += 2
                    else:
                        break
                else:
                    buf.append(s[j])
                    j += 1
            if j >= n:
                raise NewickError("unterminated quoted label")
            yield "".join(buf)
            i = j + 1
        else:
            j = i
            while j < n and s[j] not in "(),;:[" and not s[j].isspace():
                j += 1
            yield s[i:j]
            i = j


def parse_newick(text: str) -> NewickNode:
    """Parse one Newick tree string into a NewickNode AST."""
    tokens = list(_tokenize(text))
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else None

    def take():
        nonlocal pos
        t = tokens[pos]
        pos += 1
        return t

    def parse_clade() -> NewickNode:
        node = NewickNode()
        if peek() == "(":
            take()
            node.children.append(parse_clade())
            while peek() == ",":
                take()
                node.children.append(parse_clade())
            if take() != ")":
                raise NewickError("expected ')'")
        t = peek()
        if t is not None and t not in "(),;:":
            node.name = take()
        if peek() == ":":
            take()
            try:
                node.length = float(take())
            except (TypeError, ValueError) as e:
                raise NewickError(f"bad branch length: {e}")
        return node

    root = parse_clade()
    if peek() == ";":
        take()
    if pos != len(tokens):
        raise NewickError(f"trailing tokens: {tokens[pos:]}")
    return root


def _quote_if_needed(name: str) -> str:
    if name and any(c in name for c in " (),;:[]'\t\n"):
        return "'" + name.replace("'", "''") + "'"
    return name


def write_newick(
    node: NewickNode,
    with_lengths: bool = True,
    precision: int = 10,
    _root: bool = True,
) -> str:
    parts = []
    if node.children:
        inner = ",".join(
            write_newick(c, with_lengths, precision, _root=False) for c in node.children
        )
        parts.append("(" + inner + ")")
    parts.append(_quote_if_needed(node.name))
    if with_lengths and node.length is not None and not _root:
        parts.append(":" + f"{node.length:.{precision}g}")
    s = "".join(parts)
    return s + ";" if _root else s
