#!/usr/bin/env python3
"""Reconstruct FASTA inputs from golden k=2 `.cfrk` files.

The reference repo's sample FASTAs were LFS-stripped from the mirror
(`.MISSING_LARGE_BLOBS`), but its golden outputs survive.  At k=2 each
golden row is a dimer histogram, i.e. a multigraph on the 4 bases where
each dimer x→y is a directed edge; any read with those dimer counts is an
Eulerian trail decomposition of that multigraph.  We rebuild, per row, a
minimal set of edge-disjoint trails (Hierholzer with virtual balancing
edges) and join trails with 'N' (windows spanning N are invalid and count
nothing, so the joined read reproduces the row exactly).

This gives deterministic synthetic inputs on which the new framework's
k=2 output is byte-identical to the reference goldens — the strongest
correctness anchor available without the original samples.

Usage:
    python tools/reconstruct_fasta.py GOLDEN.cfrk OUT.fasta[.gz]
"""

from __future__ import annotations

import gzip
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from cfrk_tpu.format import parse_cfrk
from cfrk_tpu.ops.reference import count_perread_np
from cfrk_tpu.io.fasta import encode_seq

BASES = "ACGT"


def _eulerian_trails(counts16: np.ndarray) -> list[list[int]]:
    """Decompose a 4x4 dimer multigraph into a minimal set of trails.

    Returns trails as base-code sequences (each of length #edges+1).
    """
    mat = counts16.reshape(4, 4).astype(int)
    if mat.sum() == 0:
        return []
    # Undirected components over nodes that touch any edge.
    active = [v for v in range(4) if mat[v].sum() + mat[:, v].sum() > 0]
    parent = list(range(4))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(4):
        for b in range(4):
            if mat[a, b]:
                parent[find(a)] = find(b)

    trails: list[list[int]] = []
    for comp_root in {find(v) for v in active}:
        nodes = [v for v in active if find(v) == comp_root]
        sub = np.zeros((4, 4), dtype=int)
        for a in nodes:
            for b in range(4):
                sub[a, b] = mat[a, b]
        # Balance with virtual edges end→start; each virtual edge splits the
        # Eulerian circuit into one more trail.
        out_in = sub.sum(axis=1) - sub.sum(axis=0)
        starts = [v for v in range(4) for _ in range(max(out_in[v], 0))]
        ends = [v for v in range(4) for _ in range(max(-out_in[v], 0))]
        virtual: list[tuple[int, int]] = list(zip(ends, starts))
        # Multiset adjacency incl. virtual edges (marked).
        adj: list[list[tuple[int, bool]]] = [[] for _ in range(4)]
        for a in range(4):
            for b in range(4):
                adj[a].extend([(b, False)] * int(sub[a, b]))
        for e, s in virtual:
            adj[e].append((s, True))
        # Iterative Hierholzer with edge tracking: push (node, incoming-edge-
        # is-virtual); the reversed pop order is an Euler circuit whose
        # consecutive pairs consume exactly the recorded edges.
        root = starts[0] if starts else nodes[0]
        stack = [(root, False)]
        circuit: list[tuple[int, bool]] = []
        while stack:
            v, virt = stack[-1]
            if adj[v]:
                nxt, is_virt = adj[v].pop()
                stack.append((nxt, is_virt))
            else:
                circuit.append(stack.pop())
        circuit.reverse()  # list of (node, edge-into-node-was-virtual)
        # Split circuit at virtual edges → trails.
        cur_trail: list[int] = [circuit[0][0]]
        segs: list[list[int]] = []
        for node, via_virtual in circuit[1:]:
            if via_virtual:
                segs.append(cur_trail)
                cur_trail = [node]
            else:
                cur_trail.append(node)
        segs.append(cur_trail)
        # The circuit is cyclic (ends at root): the first and last linear
        # segments are halves of one trail split at the seam — glue them.
        if virtual and len(segs) > 1 and segs[0][0] == segs[-1][-1]:
            last = segs.pop()
            segs[0] = last + segs[0][1:]
        trails.extend(s for s in segs if len(s) >= 2)
    return trails


def row_to_read(counts16: np.ndarray) -> bytes:
    """One golden row → a read whose k=2 histogram equals the row."""
    trails = _eulerian_trails(counts16)
    if not trails:
        return b"A"
    return b"N".join("".join(BASES[c] for c in t).encode() for t in trails)


def reconstruct(golden_path: str, out_path: str, verify: bool = True) -> int:
    counts = parse_cfrk(Path(golden_path).read_bytes())
    assert counts.shape[1] == 16, "reconstruction requires k=2 goldens"
    reads = [row_to_read(row) for row in counts]
    if verify:
        got = count_perread_np([encode_seq(r) for r in reads], 2)
        bad = np.nonzero((got != counts).any(axis=1))[0]
        if bad.size:
            raise AssertionError(f"reconstruction mismatch on rows {bad[:10]}")
    opener = gzip.open if out_path.endswith(".gz") else open
    with opener(out_path, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b">read%d reconstructed-from-golden\n" % i)
            f.write(r + b"\n")
    return len(reads)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    n = reconstruct(sys.argv[1], sys.argv[2])
    print(f"reconstructed {n} reads -> {sys.argv[2]}")
