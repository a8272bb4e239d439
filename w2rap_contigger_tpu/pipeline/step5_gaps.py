"""Step 5 foundations — Unsat: clusters of unsatisfiable read pairs.

Reference: Unsat (src/paths/long/large/Unsat.cc:124-382) — phase 1 of
AssembleGaps2 (AssembleGaps.cc:237): find read pairs whose mates cannot
be connected within depth 15 / 50 vertices, link their terminal edges,
cluster links by radius-3 edge neighborhoods, and merge clusters over 10
passes.  (The final sequence-overlap cluster-merge refinement,
Unsat.cc:275-380, is staged with the rest of the local-assembly engine.)

The local assembly per blob (CorrectionSuite + MakeLocalAssembly2 +
BasesToGraph) and the global Patch/AddNewStuff rebuild are the round-2
step-5 work; this module provides their input clustering.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

MAX_DEPTH = 15
MAX_VERTS = 50
RADIUS = 3
MERGE_PASSES = 10
MAX_CLUSTER = 20


def _nhood(hbv, fo, fe, to, te, e, radius):
    """Nhood (Unsat.cc:25): edges within `radius` alternating hops."""
    x = {int(e)}
    for _ in range(radius):
        x2 = set(x)
        for el in x:
            w = int(hbv.to_right[el])
            x2.update(int(g) for g in fe[fo[w] : fo[w + 1]])
        x = set(x2)
        for el in x:
            w = int(hbv.to_left[el])
            x2.update(int(g) for g in te[to[w] : to[w + 1]])
        x = x2
    return sorted(x)


def unsat(hbv, paths):
    """Returns list of clusters; cluster = sorted list of (e1, e2) link
    pairs (left terminal edge, right terminal edge)."""
    inv = hbv.inv
    fo, fe, to, te = hbv.vertex_csr()
    E = hbv.n_edges
    npids = paths.n_reads // 2

    # ---- phase 1: unsatisfied pairs ----------------------------------
    unsat_pairs = []
    for pid in range(npids):
        p1 = [int(x) for x in paths.path(2 * pid)]
        p2 = [int(x) for x in paths.path(2 * pid + 1)]
        if not p1 or not p2:
            continue
        x1 = p1
        x2 = [int(inv[e]) for e in p2[::-1]]
        if set(x1) & set(x2):
            continue
        v = int(hbv.to_right[x1[-1]])
        w = int(hbv.to_left[x2[0]])
        if v == w:
            continue
        sat = False
        s = [v]
        for _ in range(MAX_DEPTH):
            s2 = []
            for x in s:
                for e in fe[fo[x] : fo[x + 1]]:
                    y = int(hbv.to_right[e])
                    if y == w:
                        sat = True
                        break
                    s2.append(y)
                if sat:
                    break
            if sat or len(s2) > MAX_VERTS:
                break
            s = s2
        if not sat:
            unsat_pairs.append(pid)

    # ---- links + multiplicities --------------------------------------
    unsats = defaultdict(list)  # left edge -> [(right edge, pid)]
    for pid in unsat_pairs:
        p1 = [int(x) for x in paths.path(2 * pid)]
        p2 = [int(x) for x in paths.path(2 * pid + 1)]
        if p1[-1] == p2[-1]:
            continue
        unsats[p1[-1]].append((int(inv[p2[-1]]), pid))
        unsats[p2[-1]].append((int(inv[p1[-1]]), pid))
    mult = defaultdict(int)
    for e, lst in unsats.items():
        lst = sorted(set(lst))
        unsats[e] = lst
        for r, _ in lst:
            mult[(e, r)] += 1

    # ---- neighborhoods + initial clusters ----------------------------
    active = sorted(
        set(unsats.keys())
        | {r for lst in unsats.values() for r, _ in lst}
    )
    nh = {}
    for e in active:
        nh[e] = _nhood(hbv, fo, fe, to, te, e, RADIUS)
    # extend neighborhoods lazily for edges touched below
    def nhood_of(e):
        if e not in nh:
            nh[e] = _nhood(hbv, fo, fe, to, te, e, RADIUS)
        return nh[e]

    xs = set()
    for id1, lst in unsats.items():
        seen_r = set()
        for id2, _pid in lst:
            if id2 in seen_r:
                continue
            seen_r.add(id2)
            n2 = set(nhood_of(id2))
            x = []
            for e1 in nhood_of(id1):
                for e2, _ in unsats.get(e1, []):
                    if e2 in n2:
                        x.append((e1, e2))
            xs.add(tuple(sorted(set(x))))
    clusters = [list(x) for x in sorted(xs) if x]

    # ---- merge passes -------------------------------------------------
    for _ in range(MERGE_PASSES):
        merged = _merge_clusters(clusters, nhood_of)
        if len(merged) == len(clusters):
            clusters = merged
            break
        clusters = merged

    # ---- size filters --------------------------------------------------
    out = []
    for cl in clusters:
        edges = set()
        for a, b in cl:
            edges.add(a)
            edges.add(b)
        if len(edges) > MAX_CLUSTER:
            continue
        if len(cl) == 1 and mult[cl[0]] == 1:
            continue
        out.append(sorted(cl))
    return out, mult


def _merge_clusters(clusters, nhood_of):
    """MergeClusters (Unsat.cc:44): union clusters whose neighborhood-
    expanded left AND right edge sets both intersect another cluster's."""
    ind1 = defaultdict(set)
    ind2 = defaultdict(set)
    for i, cl in enumerate(clusters):
        for a, b in cl:
            ind1[a].add(i)
            ind2[b].add(i)
    parent = list(range(len(clusters)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for i, cl in enumerate(clusters):
        s1 = sorted({a for a, _ in cl})
        s2 = sorted({b for _, b in cl})
        ss1 = set()
        for a in s1:
            ss1.update(nhood_of(a))
        ss2 = set()
        for b in s2:
            ss2.update(nhood_of(b))
        t1 = set()
        for a in ss1:
            t1.update(ind1.get(a, ()))
        t2 = set()
        for b in ss2:
            t2.update(ind2.get(b, ()))
        for j in t1 & t2:
            union(i, j)

    groups = defaultdict(set)
    for i in range(len(clusters)):
        groups[find(i)].update(clusters[i])
    return [sorted(g) for _, g in sorted(groups.items())]


def condense_lr(clusters, inv):
    """AssembleGaps.cc:252-284: clusters -> (lefts, rights) pairs with
    inverted duplicates removed."""
    LR = []
    for cl in clusters:
        lefts = sorted({a for a, _ in cl})
        rights = sorted({b for _, b in cl})
        LR.append((tuple(lefts), tuple(rights)))
    LR = sorted(set(LR))
    lr_set = set(LR)
    out = []
    for lefts, rights in LR:
        rl = tuple(sorted(int(inv[b]) for b in rights))
        rr = tuple(sorted(int(inv[a]) for a in lefts))
        if (rl, rr) <= (lefts, rights) or (rl, rr) not in lr_set:
            out.append((list(lefts), list(rights)))
    return out


def layout_reads(hbv, paths, read_lengths):
    """LayoutReads (GapToyTools2.cc:550): per edge, the (pos, read id,
    orientation) layout of reads whose path starts or ends there (both
    orientations), sorted by position.  Feeds FindPidsST's local read
    selection in AssembleGaps2.
    """
    E = hbv.n_edges
    inv = hbv.inv
    kmers = hbv.edge_kmers()
    elen = hbv.edge_len()
    layout = [[] for _ in range(E)]  # (pos, read_id, fwd?)
    for i in range(paths.n_reads):
        x = [int(e) for e in paths.path(i)]
        if not x:
            continue
        pos = int(paths.start[i])
        for j, e in enumerate(x):
            if 0 < j < len(x) - 1:
                pos -= int(kmers[e])
                continue
            layout[e].append((pos, i, True))
            pos -= int(kmers[e])
        xr = [int(inv[e]) for e in x[::-1]]
        pos = int(paths.start[i]) + int(read_lengths[i])
        ln = int(elen[xr[0]]) + int(np.sum(kmers[xr[1:]]))
        pos = ln - pos
        for j, e in enumerate(xr):
            if 0 < j < len(xr) - 1:
                pos -= int(kmers[e])
                continue
            layout[e].append((pos, i, False))
            pos -= int(kmers[e])
    for e in range(E):
        layout[e].sort()
    return layout
