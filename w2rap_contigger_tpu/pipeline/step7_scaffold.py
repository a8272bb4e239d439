"""Step 7 — MakeGaps: PE scaffolding within the graph.

Reference: MakeGaps (src/paths/long/large/MakeGaps.cc:20-509), driver
call w2rap-contigger.cc:570-603 with MIN_LINE=5000, MIN_LINK_COUNT=3.

Pipeline: line stats -> edge groups near sources/sinks ('tom' mapping,
max_hang=800) -> 'nears' from read pairs -> link counting with
graph-proximity exclusion -> acceptance filters (count, line length,
coverage +-20%, winner, bubble advance, 1-to-1, symmetry, overlinked)
-> graph edit inserting 0-length gap edges + path truncation.
"""

from __future__ import annotations

import numpy as np

from ..graph import ops
from ..graph.lines import get_line_lengths
from ..paths.read_paths import ReadPathVec

from ..config import DEFAULT as _H

MAX_HANG = _H.GAP_MAX_HANG
MAX_DEPTH = _H.GAP_MAX_DEPTH
MAX_INT = _H.GAP_MAX_INT
PASSES = _H.GAP_PASSES
MAX_COV_PC_OFF = _H.GAP_MAX_COV_PC_OFF
MAX_LINE_TO_IGNORE = _H.GAP_MAX_LINE_TO_IGNORE


def _line_npairs(hbv, paths, lines, tol):
    """GetLineNpairs equivalent: pairs touching each line."""
    inv = hbv.inv
    nl = len(lines)
    npairs = np.zeros(nl, dtype=np.int64)
    for pid in range(paths.n_reads // 2):
        ls = set()
        for rid in (2 * pid, 2 * pid + 1):
            for e in paths.path(rid):
                ls.add(int(tol[e]))
                ls.add(int(tol[inv[e]]))
        ls.discard(-1)
        for l in ls:
            npairs[l] += 1
    return npairs


def _tol(hbv, lines):
    tol = np.full(hbv.n_edges, -1, dtype=np.int64)
    for i, L in enumerate(lines):
        for cell in L:
            for p in cell:
                for e in p:
                    tol[e] = i
    return tol


def make_gaps(
    hbv, paths, lines, min_line: int = 5000, min_link_count: int = 3,
    gap_cleanup: bool = True,
):
    """Returns (hbv2, paths2, n_gaps)."""
    E = hbv.n_edges
    inv = hbv.inv
    kmers = hbv.edge_kmers()
    tol = _tol(hbv, lines)
    llens = get_line_lengths(hbv, lines)
    npairs = _line_npairs(hbv, paths, lines, tol)
    cov = np.where(
        llens > 0, 100.0 * npairs / np.maximum(llens, 1), 0.0
    )

    to_left = hbv.to_left.copy()
    to_right = hbv.to_right.copy()
    fo, fe, to, te = hbv.vertex_csr()

    def outs(v):
        return [int(x) for x in fe[fo[v] : fo[v + 1]]]

    def ins(v):
        return [int(x) for x in te[to[v] : to[v + 1]]]

    # ---- edge groups (tom / sink_like / source_like) ------------------
    tom = np.arange(E, dtype=np.int64)
    sink_like = np.zeros(E, dtype=bool)
    source_like = np.zeros(E, dtype=bool)
    dist_to_end = np.zeros(E, dtype=np.int64)
    for e in range(E):
        if len(outs(int(to_right[e]))) == 0:
            sink_like[e] = True
        if len(ins(int(to_left[e]))) == 0:
            source_like[e] = True

    # zpass==1 runs on the REVERSED graph (hb.Reverse() before the body),
    # zpass==2 on the normal orientation.
    for _p in range(PASSES):
        for zpass in (1, 2):
            if zpass == 1:
                OUT, IN, TR = ins, outs, to_left
            else:
                OUT, IN, TR = outs, ins, to_right
            flag = source_like if zpass == 1 else sink_like
            for e in range(E):
                v = int(TR[e])
                if len(OUT(v)) != 2 or len(IN(v)) != 1:
                    continue
                e1, e2 = OUT(v)
                w1, w2 = int(TR[e1]), int(TR[e2])
                if not (flag[e1] and flag[e2]):
                    continue
                if w1 == w2 and len(IN(w1)) != 2:
                    continue
                if w1 != w2 and (len(IN(w1)) != 1 or len(IN(w2)) != 1):
                    continue
                d1 = int(kmers[e1]) + int(dist_to_end[e1])
                d2 = int(kmers[e2]) + int(dist_to_end[e2])
                if d1 > MAX_HANG or d2 > MAX_HANG:
                    continue
                flag[e] = True
                dist_to_end[e] = max(d1, d2)
                tom[e1] = tom[e]
                tom[e2] = tom[e]
            for e in range(E):
                v = int(TR[e])
                if len(OUT(v)) != 2 or len(IN(v)) != 1:
                    continue
                e1, e2 = OUT(v)
                w1, w2 = int(TR[e1]), int(TR[e2])
                if w1 != w2:
                    continue
                if len(IN(w1)) != 2 or len(OUT(w1)) != 1:
                    continue
                e3 = OUT(w1)[0]
                z = int(TR[e3])
                if len(IN(z)) != 1:
                    continue
                if not flag[e3]:
                    continue
                d1 = int(kmers[e1]) + int(kmers[e3]) + int(dist_to_end[e3])
                d2 = int(kmers[e2]) + int(kmers[e3]) + int(dist_to_end[e3])
                if d1 > MAX_HANG or d2 > MAX_HANG:
                    continue
                flag[e] = True
                dist_to_end[e] = max(d1, d2)
                tom[e1] = tom[e]
                tom[e2] = tom[e]
                tom[e3] = tom[e]

    # ---- nears from read pairs ---------------------------------------
    nears = []
    nears1 = [[] for _ in range(E)]
    nears2 = [[] for _ in range(E)]
    for pid in range(paths.n_reads // 2):
        p1 = [int(x) for x in paths.path(2 * pid)]
        p2 = [int(x) for x in paths.path(2 * pid + 1)]
        if not p1 or not p2:
            continue
        for pass_ in (1, 2):
            x = list(p1)
            y = [int(inv[e]) for e in p2[::-1]]
            if pass_ == 2:
                x, y = y, x
                x = [int(inv[e]) for e in x[::-1]]
                y = [int(inv[e]) for e in y[::-1]]
            x = [int(tom[e]) for e in x]
            y = [int(tom[e]) for e in y]
            x = [e for j, e in enumerate(x) if j == 0 or e != x[j - 1]]
            y = [e for j, e in enumerate(y) if j == 0 or e != y[j - 1]]
            x = [e for e in x if tol[e] >= 0 and llens[tol[e]] > MAX_LINE_TO_IGNORE]
            y = [e for e in y if tol[e] >= 0 and llens[tol[e]] > MAX_LINE_TO_IGNORE]
            ys = set(y)
            for e1 in x:
                if e1 in ys:
                    continue
                for e2 in y:
                    if e1 != e2:
                        nears.append((e1, e2))
                        nears1[e1].append(e2)
                        nears2[e2].append(e1)
    nears.sort()
    for e in range(E):
        nears1[e].sort()
        nears2[e].sort()

    # ---- link counting with graph-proximity exclusion ----------------
    links = []
    counts = []
    i = 0
    while i < len(nears):
        j = i
        while j < len(nears) and nears[j] == nears[i]:
            j += 1
        e1, e2 = nears[i]
        # BFS within max_depth/max_int around e1 (and its solo predecessor)
        close = False
        x = [e1]
        d = [-1]
        kk = [0]
        if len(ins(int(to_left[e1]))) == 1:
            x.append(ins(int(to_left[e1]))[0])
            d.append(-1)
            kk.append(0)
        jx = 0
        while jx < len(x):
            e = x[jx]
            if e == e2:
                close = True
                break
            if kk[jx] <= MAX_INT and d[jx] != MAX_DEPTH:
                v, w = int(to_right[e]), int(to_left[e])
                for e_ in outs(v) + ins(w):
                    x.append(e_)
                    d.append(d[jx] + 1)
                    kk.append(kk[jx] + int(kmers[e_]))
            jx += 1
        if not close:
            links.append((int(tom[e1]), int(tom[e2])))
            counts.append(j - i)
        i = j

    order = np.argsort(
        np.array([l[0] * (E + 1) + l[1] for l in links]) if links else []
    )
    links = [links[i] for i in order]
    counts = [counts[i] for i in order]

    # ---- acceptance filters ------------------------------------------
    def advance_bubbles(e1, e2):
        for _ in range(PASSES):
            v = int(to_right[e1])
            if len(ins(v)) != 1 or len(outs(v)) != 2:
                break
            o = outs(v)
            if int(to_right[o[0]]) != int(to_right[o[1]]):
                break
            w = int(to_right[o[0]])
            if len(ins(w)) != 2 or len(outs(w)) != 1:
                break
            e1 = outs(w)[0]
        for _ in range(PASSES):
            v = int(to_left[e2])
            if len(outs(v)) != 1 or len(ins(v)) != 2:
                break
            ii = ins(v)
            if int(to_left[ii[0]]) != int(to_left[ii[1]]):
                break
            w = int(to_left[ii[0]])
            if len(outs(w)) != 2 or len(ins(w)) != 1:
                break
            e2 = ins(w)[0]
        return e1, e2

    accepted = []
    for (e1, e2), c in zip(links, counts):
        if c < min_link_count:
            continue
        if tol[e1] < 0 or tol[e2] < 0:
            continue
        if llens[tol[e1]] < min_line or llens[tol[e2]] < min_line:
            continue
        c1, c2 = cov[tol[e1]], cov[tol[e2]]
        if c1 < c2:
            c1, c2 = c2, c1
        if c2 <= 0 or c1 / c2 - 1.0 > MAX_COV_PC_OFF / 100.0:
            continue
        max_alt = 0
        for lst in (nears1[e1], nears2[e2]):
            l = 0
            while l < len(lst):
                m = l
                while m < len(lst) and lst[m] == lst[l]:
                    m += 1
                max_alt = max(max_alt, m - l)
                l = m
        if max_alt > c:
            continue
        e1x, e2x = advance_bubbles(e1, e2)
        l1, l2 = int(tol[e1x]), int(tol[e2x])
        if l1 < 0 or l2 < 0:
            continue
        if lines[l1][-1][0][0] != e1x or lines[l2][0][0][0] != e2x:
            continue
        accepted.append((e1, e2))

    # 1-to-1
    from collections import Counter

    c1 = Counter(a for a, _ in accepted)
    c2 = Counter(b for _, b in accepted)
    accepted = [
        (a, b) for a, b in accepted if c1[a] == 1 and c2[b] == 1
    ]
    # advance past bubbles on the accepted pairs
    accepted = [advance_bubbles(a, b) for a, b in accepted]
    accepted = sorted(set(accepted))
    # force symmetry
    aset = set(accepted)
    xa1 = {a for a, _ in accepted}
    xa2 = {b for _, b in accepted}
    add, drop = [], set()
    for a, b in accepted:
        ra, rb = int(inv[a]), int(inv[b])
        if (rb, ra) not in aset:
            if rb not in xa1 and ra not in xa2:
                add.append((rb, ra))
            else:
                drop.add((a, b))
    accepted = sorted((set(accepted) - drop) | set(add))
    # overlinked
    c1 = Counter(a for a, _ in accepted)
    c2 = Counter(b for _, b in accepted)
    accepted = [
        (a, b)
        for a, b in accepted
        if c1[a] <= 1 and c2[b] <= 1
    ]

    if not accepted:
        return hbv, paths, 0

    # ---- graph edit: insert 0-length gap edges -----------------------
    nV = hbv.n_vertices
    gap_edges = []
    for a, b in accepted:
        to_right[a] = nV
        to_left[b] = nV + 1
        gap_edges.append((nV, nV + 1))
        nV += 2
    hbv.to_left = to_left
    hbv.to_right = to_right
    hbv.n_vertices = nV
    E0 = hbv.n_edges
    ng = len(gap_edges)
    hbv.edge_start = np.concatenate(
        [hbv.edge_start, np.full(ng, hbv.edge_start[-1], dtype=np.int64)]
    )
    hbv.to_left = np.concatenate(
        [hbv.to_left, np.array([v for v, _ in gap_edges], np.int32)]
    )
    hbv.to_right = np.concatenate(
        [hbv.to_right, np.array([w for _, w in gap_edges], np.int32)]
    )
    # involution: gap of (a,b) <-> gap of (inv b, inv a)
    pair_pos = {p: i for i, p in enumerate(accepted)}
    inv_new = np.zeros(ng, dtype=np.int32)
    for i, (a, b) in enumerate(accepted):
        ri = pair_pos[(int(inv[b]), int(inv[a]))]
        inv_new[i] = E0 + ri
    hbv.inv = np.concatenate([hbv.inv, inv_new])

    # ---- truncate crossing paths -------------------------------------
    split_after = {a for a, _ in accepted}
    split_before = {b for _, b in accepted}
    lists = []
    starts = paths.start.astype(np.int64).copy()
    for rid in range(paths.n_reads):
        p = [int(x) for x in paths.path(rid)]
        if p:
            for j, e in enumerate(p):
                if e in split_after and j + 1 < len(p):
                    p = p[: j + 1]
                    break
            # keep from LAST occurrence of a split-before edge
            last = None
            for j, e in enumerate(p):
                if e in split_before:
                    last = j
            if last is not None and last > 0:
                starts[rid] -= int(np.sum(kmers[p[:last]]))
                p = p[last:]
        lists.append(p)
    paths = ReadPathVec.from_lists(lists, starts.astype(np.int32))

    if gap_cleanup:
        hbv, paths = ops.remove_small_components(
            hbv, paths, remove_small_cycles=True
        )
        hbv, paths = ops.squeeze(hbv, paths)
    return hbv, paths, len(accepted)
