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


def packed_slot_schedule(tree: PhyloTree, pack: int) -> Tuple[np.ndarray, int]:
    """Pack-`pack` slot schedule: steps grouped so that every group of
    `pack` consecutive rows is mutually independent (each row's children
    are tips or outputs of strictly earlier groups).  The packed fused
    kernel then evaluates a whole group with ONE
    [2*pack*CS, 2*pack*CS] x [2*pack*CS, tile] MXU matmul — at DNA+G4
    shapes (CS=16, pack=4) that is a full 128-wide systolic pass instead
    of four 32-row ones, cutting the sequential step count ~3.5x (the
    hot loop this accelerates replaces /root/reference/phylokernel.h:70).

    Group construction is greedy list scheduling over the ready set
    (children complete), prioritized by slots freed (keeps live-slot
    pressure within ~3x of the Sethi-Ullman sequential schedule; ~35
    slots at 1000 taxa).  Rows that pad a short group carry
    (0, 0, -1, -1, trash_slot, -1): node id -1 marks them for the
    reverse-sweep kernels to skip, and the forward kernel writes their
    output to a dedicated trash slot.  The root step is always the LAST
    row (kernels read the root slot there), and the row count strictly
    exceeds n_taxa-1 so wrappers can detect a packed schedule from its
    shape alone.

    Returns (steps [G*pack, 6] int32, n_slots) — n_slots includes the
    trash slot.
    """
    assert pack >= 2
    N = tree.n_taxa
    ch = tree.children
    parent = tree.parent
    root = tree.root
    emitted = np.zeros(2 * N - 1, dtype=bool)
    emitted[:N] = True
    # ready nodes in 3 priority buckets by number of internal children
    # (prefer freeing more slots); bucket queues replace a full sort of
    # the ready set per group, which dominated the build at 1000 taxa
    buckets = ([], [], [])
    queued = np.zeros(2 * N - 1, dtype=bool)

    def push_ready(v):
        if queued[v]:
            return False
        queued[v] = True
        prio = int(ch[v, 0] >= N) + int(ch[v, 1] >= N)
        buckets[prio].append(v)
        return True

    n_ready = 0
    for v in range(N, 2 * N - 1):
        l, r = int(ch[v, 0]), int(ch[v, 1])
        if l < N and r < N and v != root:
            push_ready(v)
            n_ready += 1
    slot_of = {}
    free: list = []
    next_slot = [0]

    def alloc() -> int:
        if free:
            return free.pop()
        s = next_slot[0]
        next_slot[0] += 1
        return s

    def emit_batch(batch, steps):
        freed = []
        pk = []
        for v in batch:
            l, r = int(ch[v, 0]), int(ch[v, 1])
            ls = slot_of.get(l, -1)
            rs = slot_of.get(r, -1)
            for c, s in ((l, ls), (r, rs)):
                if s >= 0:
                    freed.append(s)
                    del slot_of[c]
            pk.append((v, l, r, ls, rs))
        for v, l, r, ls, rs in pk:
            out = alloc()
            slot_of[v] = out
            steps.append((l, r, ls, rs, out, v))
            emitted[v] = True
        # slots freed in this group become reusable only in LATER groups:
        # within-group reuse would let a reverse sweep's D-push (parent
        # row) overwrite a same-group node's pending dslots read — the
        # reverse kernels process rows of one group in arbitrary relative
        # order (strict cross-group ordering is the only guarantee)
        free.extend(freed)
        nonlocal_added = 0
        for v, *_ in pk:
            p = int(parent[v])
            if p >= 2 * N - 1 or emitted[p] or p == root:
                continue
            pl_, pr = int(ch[p, 0]), int(ch[p, 1])
            if (pl_ < N or emitted[pl_]) and (pr < N or emitted[pr]):
                if push_ready(p):
                    nonlocal_added += 1
        return nonlocal_added

    steps: list = []
    pad_rows = 0
    while n_ready:
        batch = []
        for q in (buckets[2], buckets[1], buckets[0]):
            while q and len(batch) < pack:
                batch.append(q.pop())
        n_ready -= len(batch)
        n_ready += emit_batch(batch, steps)
        for _ in range(pack - len(batch)):
            steps.append(None)  # placeholder; trash slot known at the end
            pad_rows += 1
    # final group: root last, padded in front; guarantee at least one
    # padding row overall so rows > N-1 (shape-based pack detection)
    n_pad_front = pack - 1
    if pad_rows == 0 and n_pad_front == 0:
        n_pad_front += pack
    for _ in range(n_pad_front):
        steps.append(None)
    l, r = int(ch[root, 0]), int(ch[root, 1])
    ls = slot_of.get(l, -1)
    rs = slot_of.get(r, -1)
    out = alloc()
    steps.append((l, r, ls, rs, out, root))
    trash = next_slot[0]
    steps = [s if s is not None else (0, 0, -1, -1, trash, -1)
             for s in steps]
    arr = np.asarray(steps, dtype=np.int32)
    assert arr.shape[0] % pack == 0 and arr.shape[0] > N - 1
    assert int((arr[:, 5] >= 0).sum()) == N - 1
    validate_packed_schedule(arr, pack)
    return arr, trash + 1


def validate_packed_schedule(steps: np.ndarray, pack: int) -> None:
    """Assert every aligned group of `pack` rows is mutually independent
    (no row consumes a slot produced within its own group) and the root
    is the last row — guards against a schedule built with a different
    pack factor being grouped incorrectly (round-3 advisor finding: the
    kernels infer pack from shape alone, which a mismatched schedule
    could satisfy while silently mixing dependent steps)."""
    R = steps.shape[0]
    assert R % pack == 0, (R, pack)
    for g in range(R // pack):
        grp = steps[g * pack:(g + 1) * pack]
        outs = set(int(o) for o, n in zip(grp[:, 4], grp[:, 5]) if n >= 0)
        for row in grp:
            if row[5] < 0:
                continue
            for c in (int(row[2]), int(row[3])):
                assert c < 0 or c not in outs, (
                    f"group {g} consumes slot {c} produced in-group")


def pad_packed_rows(steps: np.ndarray, pack: int, rows: int) -> np.ndarray:
    """Pad a packed schedule to exactly `rows` rows by inserting no-op
    groups BEFORE the final group (the kernels read the root from the
    LAST row).  Used to keep the schedule shape stable across the
    topologies of one search so jitted programs never respecialize."""
    cur = steps.shape[0]
    if cur == rows:
        return steps
    assert rows > cur and (rows - cur) % pack == 0, (cur, rows, pack)
    pad_mask = steps[:, 5] < 0
    assert pad_mask.any(), "packed schedules always carry a padding row"
    pad_row = steps[np.argmax(pad_mask)]
    pad = np.tile(pad_row, (rows - cur, 1))
    return np.concatenate([steps[:-pack], pad, steps[-pack:]])
