"""-gz output compression (reference params.do_compression,
/root/reference/tools.cpp:2501; ogzstream writers in
guidedbootstrap.cpp:844-857).

Scope: the LARGE per-site / per-tree outputs (.treels, .treelh,
.sitelh, .ufboot, .boottrees).  Reports (.iqtree/.log/.treefile) stay
plain text like the reference's.
"""

from __future__ import annotations

import gzip
from typing import IO


def out_name(path: str, compress: bool = False) -> str:
    return path + ".gz" if compress else path


def open_out(path: str, compress: bool = False) -> IO[str]:
    """Text-mode output stream; gzip-compressed (path + '.gz') when
    compress is set."""
    if compress:
        return gzip.open(path + ".gz", "wt")
    return open(path, "w")


def open_in(path: str) -> IO[str]:
    """Text-mode input that transparently handles gzip files (sniffs
    the magic bytes, so both `x.sitelh` and `x.sitelh.gz` work)."""
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rt")
    return open(path, "r")
