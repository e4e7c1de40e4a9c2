"""Minimal acyclic FST over sorted byte keys with non-negative integer
outputs — the FSTCompiler role (util/fst/FSTCompiler.java:44,848,996 —
"builds a minimal FST ... from pre-sorted terms"; outputs as in
util/fst/PositiveIntOutputs.java:28, where output "concatenation" is
integer addition and the common prefix of two outputs is their min).

Algorithm: the sorted-input incremental construction of the minimal
acyclic automaton (Daciuk, Mihov, Watson & Watson, Computational
Linguistics 26(1), 2000) extended with on-line output pushing for the
subsequential transducer (Mihov & Maurel, "Direct Construction of
Minimal Acyclic Subsequential Transducers", CIAA 2000) — the same two
published constructions the reference cites. States are frozen
(hash-consed on their right language) as soon as the next key proves
their subtree can no longer change, so peak memory is O(longest key ×
alphabet), not O(keys).

The compiled form is flat numpy CSR: per-state arc slices sorted by
label (binary-searched lookups), int64 outputs. The reference encodes
the same thing as a reverse-topological byte stream; a columnar layout
is the natural Arrow-era equivalent and keeps lookups vectorizable.

This module exists for the suggest/FST surface (AnalyzingSuggester);
the inverted-index term dictionary intentionally stays the sorted
Arrow table + searchsorted design (SURVEY §2.3: BlockTree row) — at
100 TB the term dict is sharded columnar data, not a driver-side
automaton.
"""

from __future__ import annotations

import numpy as np

__all__ = ["FST", "build_fst"]


class _Node:
    """Uncompiled frontier state: labels/targets/outputs kept as
    parallel lists (labels arrive in sorted order by construction)."""

    __slots__ = ("labels", "targets", "outs", "final", "final_out")

    def __init__(self):
        self.labels: list[int] = []
        self.targets: list = []  # _Node (frontier) or int (frozen id)
        self.outs: list[int] = []
        self.final = False
        self.final_out = 0


class FST:
    """Compiled minimal FST: ``get`` / ``completions`` over CSR arrays."""

    def __init__(self, arc_start, labels, targets, outs, final, final_out,
                 root):
        self.arc_start = arc_start      # int64[num_states + 1]
        self.labels = labels            # uint8[num_arcs]
        self.targets = targets          # int64[num_arcs]
        self.outs = outs                # int64[num_arcs]
        self.final = final              # bool[num_states]
        self.final_out = final_out      # int64[num_states]
        self.root = int(root)

    # -- stats ---------------------------------------------------------
    @property
    def num_states(self) -> int:
        return int(self.final.shape[0])

    @property
    def num_arcs(self) -> int:
        return int(self.labels.shape[0])

    # -- traversal -----------------------------------------------------
    def _step(self, state: int, label: int):
        lo, hi = self.arc_start[state], self.arc_start[state + 1]
        i = lo + np.searchsorted(self.labels[lo:hi], label)
        if i < hi and self.labels[i] == label:
            return int(self.targets[i]), int(self.outs[i])
        return -1, 0

    def get(self, key: bytes | str):
        """Output for ``key``, or None if absent (FST.get role,
        util/fst/Util.java:46)."""
        if isinstance(key, str):
            key = key.encode("utf-8")
        s, acc = self.root, 0
        for b in key:
            s, o = self._step(s, b)
            if s < 0:
                return None
            acc += o
        return acc + int(self.final_out[s]) if self.final[s] else None

    def completions(self, prefix: bytes | str, limit: int | None = None):
        """All (key, output) with the given prefix, in sorted key order —
        the Util.shortestPaths enumeration surface (util/fst/Util.java:
        260) without the cost ordering (callers re-rank by output)."""
        if isinstance(prefix, str):
            prefix = prefix.encode("utf-8")
        s, acc = self.root, 0
        for b in prefix:
            s, o = self._step(s, b)
            if s < 0:
                return
            acc += o
        n = 0
        # iterative DFS in label order == sorted key order
        stack = [(s, prefix, acc, True)]
        while stack:
            st, key, out, fresh = stack.pop()
            if fresh and self.final[st]:
                yield key, out + int(self.final_out[st])
                n += 1
                if limit is not None and n >= limit:
                    return
            lo, hi = int(self.arc_start[st]), int(self.arc_start[st + 1])
            # push arcs in REVERSE label order so the pop order is sorted
            for i in range(hi - 1, lo - 1, -1):
                stack.append((int(self.targets[i]),
                              key + bytes([int(self.labels[i])]),
                              out + int(self.outs[i]), True))

    def __contains__(self, key) -> bool:
        return self.get(key) is not None


def build_fst(pairs) -> FST:
    """Compile sorted unique (key, output) pairs into a minimal FST.

    ``pairs``: iterable of (bytes|str, int>=0) in strictly increasing
    key order (the FSTCompiler.add contract, FSTCompiler.java:848 —
    "duplicate FST inputs are not allowed").
    """
    # frozen-state storage (grown append-only; ids are indices)
    f_labels: list[list[int]] = []
    f_targets: list[list[int]] = []
    f_outs: list[list[int]] = []
    f_final: list[bool] = []
    f_final_out: list[int] = []
    registry: dict = {}

    def freeze(node: _Node) -> int:
        # children must already be frozen (ints)
        sig = (node.final, node.final_out, tuple(node.labels),
               tuple(node.targets), tuple(node.outs))
        sid = registry.get(sig)
        if sid is None:
            sid = len(f_final)
            registry[sig] = sid
            f_labels.append(node.labels)
            f_targets.append(node.targets)
            f_outs.append(node.outs)
            f_final.append(node.final)
            f_final_out.append(node.final_out)
        return sid

    root = _Node()
    path: list[_Node] = [root]
    prev = b""

    def freeze_tail(upto: int):
        """Freeze path states deeper than ``upto`` (end of prev key)."""
        for i in range(len(prev), upto, -1):
            sid = freeze(path[i])
            parent = path[i - 1]
            parent.targets[-1] = sid  # last arc is the deepest one
        del path[upto + 1:]

    for key, out in pairs:
        if isinstance(key, str):
            key = key.encode("utf-8")
        out = int(out)
        if out < 0:
            raise ValueError("outputs must be non-negative (PositiveIntOutputs)")
        if key <= prev and prev:
            raise ValueError(
                f"keys must be strictly increasing: {key!r} after {prev!r}")
        if not key:
            raise ValueError("empty key not supported")
        # common prefix length
        k = 0
        m = min(len(prev), len(key))
        while k < m and prev[k] == key[k]:
            k += 1
        freeze_tail(k)
        # push output along the (uncompiled) common-prefix path:
        # common prefix of int outputs is min; excess is pushed down
        # into the target's other arcs + final output (Mihov-Maurel)
        node = root
        rem = out
        for d in range(k):
            # the arc we follow is always the LAST arc of the node
            # (keys arrive sorted, so key[d] == node.labels[-1])
            arc_out = node.outs[-1]
            common = min(arc_out, rem)
            excess = arc_out - common
            node.outs[-1] = common
            rem -= common
            child = node.targets[-1]  # still a _Node on the path
            if excess:
                for j in range(len(child.outs)):
                    child.outs[j] += excess
                if child.final:
                    child.final_out += excess
            node = child
        # append the new suffix
        for d in range(k, len(key)):
            nxt = _Node()
            node.labels.append(key[d])
            node.targets.append(nxt)
            node.outs.append(0)
            node = nxt
            path.append(nxt)
        if node.final:
            raise ValueError(f"duplicate key {key!r}")
        node.final = True
        node.final_out = 0
        if len(key) > k:
            # remaining output goes on the first new arc (deepest
            # shared state's new child), matching the reference's
            # "put the rest on the last (new) arc" placement
            path[k].outs[-1] = rem
        else:
            node.final_out = rem
        prev = key

    freeze_tail(0)
    root_id = freeze(root)

    n = len(f_final)
    counts = np.fromiter((len(x) for x in f_labels), np.int64, n)
    arc_start = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=arc_start[1:])
    labels = np.fromiter((b for xs in f_labels for b in xs), np.uint8,
                         int(arc_start[-1]))
    targets = np.fromiter((t for xs in f_targets for t in xs), np.int64,
                          int(arc_start[-1]))
    outs = np.fromiter((o for xs in f_outs for o in xs), np.int64,
                       int(arc_start[-1]))
    return FST(arc_start, labels, targets, outs,
               np.asarray(f_final, bool),
               np.asarray(f_final_out, np.int64), root_id)
