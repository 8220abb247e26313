"""Register-slot scheduling for the fused Pallas pruning kernel.

The fused kernel evaluates the whole post-order in VMEM, one pattern tile
per grid step.  Partial-likelihood vectors live in a small pool of VMEM
"slots"; a node's slot is freed once its parent consumes it.  With the
Sethi-Ullman evaluation order (visit the child with larger register need
first) the maximum number of simultaneously-live slots for a binary tree
is its Strahler number <= ceil(log2(N)) + 1 — e.g. 11 slots for 1000
taxa — so the whole traversal state fits in a few hundred KB of VMEM.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ...trees.tree import PhyloTree


def slot_schedule(tree: PhyloTree) -> Tuple[np.ndarray, int]:
    """Returns (steps [N-1, 6] int32, n_slots).

    steps[i] = (left_node, right_node, left_is_tip, right_is_tip,
                left_slot_or_tip_id, right_slot_or_tip_id ... ) packed as:
      col 0: left child node id     col 1: right child node id
      col 2: left slot (-1 = tip)   col 3: right slot (-1 = tip)
      col 4: output slot            col 5: output node id
    in a Sethi-Ullman post-order (children with larger need first).
    Tips are read directly from the tip-state arrays, not slots.
    """
    N = tree.n_taxa
    from ... import native

    nat = native.slot_schedule(N, tree.children)
    if nat is not None:
        return nat

    # register need (Strahler number)
    need = {}

    def compute_need(v: int) -> int:
        stack = [(v, False)]
        while stack:
            u, done = stack.pop()
            if u < N:
                need[u] = 1
                continue
            l, r = int(tree.children[u, 0]), int(tree.children[u, 1])
            if done:
                nl, nr = need[l], need[r]
                need[u] = max(nl, nr) if nl != nr else nl + 1
            else:
                stack.append((u, True))
                stack.append((l, False))
                stack.append((r, False))
        return need[v]

    root = tree.root
    compute_need(root)

    steps = []
    free_slots: list = []
    next_slot = [0]
    slot_of = {}

    def alloc() -> int:
        if free_slots:
            return free_slots.pop()
        s = next_slot[0]
        next_slot[0] += 1
        return s

    def emit(v: int):
        """Iterative Sethi-Ullman evaluation of subtree at v."""
        stack = [(v, False)]
        while stack:
            u, done = stack.pop()
            if u < N:
                continue
            l, r = int(tree.children[u, 0]), int(tree.children[u, 1])
            if not done:
                stack.append((u, True))
                # evaluate child with larger need first
                first, second = (l, r) if need[l] >= need[r] else (r, l)
                stack.append((second, False))
                stack.append((first, False))
            else:
                ls = slot_of.get(l, -1)
                rs = slot_of.get(r, -1)
                # free child slots, then allocate output (may reuse)
                for c, s in ((l, ls), (r, rs)):
                    if s >= 0:
                        free_slots.append(s)
                        del slot_of[c]
                out = alloc()
                slot_of[u] = out
                steps.append((l, r, ls, rs, out, u))

    emit(root)
    assert len(steps) == N - 1
    return np.asarray(steps, dtype=np.int32), next_slot[0]
