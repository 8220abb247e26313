"""Native treekit (C++) vs Python fallbacks: identical results."""

import os

import numpy as np
import pytest

from iqtree_tpu import native
from iqtree_tpu.trees.tree import PhyloTree, random_tree


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("g++ unavailable; native treekit not built")
    return lib


def _py_layout(tree, width=32):
    """Run the pure-Python implementations by bypassing the native path."""
    os.environ["IQTREE_TPU_NO_NATIVE"] = "1"
    saved_lib, saved_tried = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        lay = tree.device_layout(width)
        po = tree.postorder()
    finally:
        native._lib, native._tried = saved_lib, saved_tried
        del os.environ["IQTREE_TPU_NO_NATIVE"]
    return lay, po


def test_postorder_and_layout_match(lib):
    for seed in [0, 1, 2]:
        tree = random_tree(60, np.random.default_rng(seed))
        lay_py, po_py = _py_layout(tree)
        po_c = native.postorder(tree.n_taxa, tree.children)
        np.testing.assert_array_equal(po_c, po_py)
        lay_c = native.device_layout(tree.n_taxa, tree.children, 32)
        np.testing.assert_array_equal(lay_c["d2h"], lay_py["d2h"])
        np.testing.assert_array_equal(lay_c["h2d"], lay_py["h2d"])
        assert lay_c["n_rows"] == lay_py["n_rows"]
        np.testing.assert_array_equal(
            lay_c["row_start"][: lay_c["n_rows"]],
            lay_py["row_start"][: lay_py["n_rows"]],
        )
        np.testing.assert_array_equal(
            lay_c["row_len"][: lay_c["n_rows"]],
            lay_py["row_len"][: lay_py["n_rows"]],
        )


def test_slot_schedule_matches(lib):
    from iqtree_tpu.engine.kernels import schedule as sched

    tree = random_tree(100, np.random.default_rng(3))
    steps_c, n_slots_c = native.slot_schedule(tree.n_taxa, tree.children)
    os.environ["IQTREE_TPU_NO_NATIVE"] = "1"
    saved_lib, saved_tried = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        steps_py, n_slots_py = sched.slot_schedule(tree)
    finally:
        native._lib, native._tried = saved_lib, saved_tried
        del os.environ["IQTREE_TPU_NO_NATIVE"]
    assert n_slots_c == n_slots_py
    np.testing.assert_array_equal(steps_c, steps_py)


def test_rf_matches_python(lib):
    rng = np.random.default_rng(5)
    for seed in range(4):
        a = random_tree(25, np.random.default_rng(seed))
        b = a.copy()
        for _ in range(seed * 2):
            edges = b.internal_edges()
            b.apply_nni(int(edges[rng.integers(len(edges))]),
                        int(rng.integers(2)))
        d_c = native.robinson_foulds(a.n_taxa, a.children, b.children)
        d_py = len(a.splits_key() ^ b.splits_key())
        assert d_c == d_py


def test_native_speedup(lib):
    """The native layout should comfortably beat the Python loops."""
    import time

    tree = random_tree(2000, np.random.default_rng(0))
    t0 = time.time()
    for _ in range(20):
        native.device_layout(tree.n_taxa, tree.children, 32)
    t_native = time.time() - t0
    os.environ["IQTREE_TPU_NO_NATIVE"] = "1"
    saved_lib, saved_tried = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        t0 = time.time()
        for _ in range(20):
            tree.device_layout(32)
        t_py = time.time() - t0
    finally:
        native._lib, native._tried = saved_lib, saved_tried
        del os.environ["IQTREE_TPU_NO_NATIVE"]
    assert t_native < t_py, (t_native, t_py)
