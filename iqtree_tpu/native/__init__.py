"""Native (C++) host runtime: tree scheduling/traversal hot paths.

Loader for treekit.cpp.  The library is compiled on first use with the
system g++ into the package directory (rebuilt when the source changes)
and bound through ctypes; every entry point has a pure-Python fallback in
trees/tree.py, so a missing compiler only costs speed, never features.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "treekit.cpp")

_lib = None
_tried = False


def _build() -> Optional[str]:
    src_hash = hashlib.sha256(open(_SRC, "rb").read()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"libtreekit-{src_hash}.so")
    if os.path.exists(so_path):
        return so_path
    # clean stale builds
    for f in os.listdir(_DIR):
        if f.startswith("libtreekit-") and f.endswith(".so"):
            try:
                os.unlink(os.path.join(_DIR, f))
            except OSError:
                pass
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception:
        return None


def load():
    """The treekit ctypes library, or None when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("IQTREE_TPU_NO_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.tk_postorder.argtypes = [ctypes.c_int32, i32p, i32p]
    lib.tk_postorder.restype = ctypes.c_int32
    lib.tk_device_layout.argtypes = [
        ctypes.c_int32, i32p, ctypes.c_int32, i32p, i32p, i32p, i32p,
    ]
    lib.tk_device_layout.restype = ctypes.c_int32
    lib.tk_slot_schedule.argtypes = [ctypes.c_int32, i32p, i32p]
    lib.tk_slot_schedule.restype = ctypes.c_int32
    lib.tk_robinson_foulds.argtypes = [ctypes.c_int32, i32p, i32p]
    lib.tk_robinson_foulds.restype = ctypes.c_int32
    _lib = lib
    return _lib


def postorder(n_taxa: int, children: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    out = np.empty(n_taxa - 1, dtype=np.int32)
    ch = np.ascontiguousarray(children, dtype=np.int32)
    n = lib.tk_postorder(n_taxa, ch, out)
    if n != n_taxa - 1:
        return None
    return out


def device_layout(n_taxa: int, children: np.ndarray, width: int):
    lib = load()
    if lib is None:
        return None
    n_nodes = 2 * n_taxa - 1
    d2h = np.empty(n_nodes, dtype=np.int32)
    h2d = np.empty(n_nodes, dtype=np.int32)
    row_start = np.zeros(max(n_taxa - 1, 1), dtype=np.int32)
    row_len = np.zeros(max(n_taxa - 1, 1), dtype=np.int32)
    ch = np.ascontiguousarray(children, dtype=np.int32)
    n_rows = lib.tk_device_layout(n_taxa, ch, width, d2h, h2d, row_start,
                                  row_len)
    if n_rows < 0:
        return None
    return dict(d2h=d2h, h2d=h2d, row_start=row_start, row_len=row_len,
                n_rows=int(n_rows))


def slot_schedule(n_taxa: int, children: np.ndarray):
    lib = load()
    if lib is None:
        return None
    steps = np.empty((n_taxa - 1, 6), dtype=np.int32)
    ch = np.ascontiguousarray(children, dtype=np.int32)
    n_slots = lib.tk_slot_schedule(n_taxa, ch, steps)
    if n_slots < 0:
        return None
    return steps, int(n_slots)


def robinson_foulds(n_taxa: int, children_a: np.ndarray,
                    children_b: np.ndarray) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(children_a, dtype=np.int32)
    b = np.ascontiguousarray(children_b, dtype=np.int32)
    return int(lib.tk_robinson_foulds(n_taxa, a, b))
