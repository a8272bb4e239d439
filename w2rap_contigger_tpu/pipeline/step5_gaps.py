"""Step 5 foundations — Unsat: clusters of unsatisfiable read pairs.

Reference: Unsat (src/paths/long/large/Unsat.cc:124-382) — phase 1 of
AssembleGaps2 (AssembleGaps.cc:237): find read pairs whose mates cannot
be connected within depth 15 / 50 vertices, link their terminal edges,
cluster links by radius-3 edge neighborhoods, merge clusters over 10
passes, refine by two sequence-overlap merge passes (shared forward
100-mers between cluster right-hand-side edges, Unsat.cc:275-355),
partially symmetrize with the involution (Unsat.cc:358-365), and trim
low-multiplicity links at ratio 10 (Unsat.cc:369-380).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np

from ..config import DEFAULT as _H

MAX_DEPTH = _H.UNSAT_MAX_DEPTH
MAX_VERTS = _H.UNSAT_MAX_VERTS
RADIUS = _H.UNSAT_RADIUS
MERGE_PASSES = _H.UNSAT_MERGE_PASSES
MAX_CLUSTER = _H.UNSAT_MAX_CLUSTER
OVERLAP_PASSES = _H.UNSAT_OVERLAP_PASSES   # Unsat.cc:275 opass
MAX_OVERLAP_RHS = _H.UNSAT_MAX_OVERLAP_RHS  # Unsat.cc:317 maxo
OVERLAP_L = _H.UNSAT_OVERLAP_L              # Unsat.cc:325 kmer<L>
CLUSTER_RATIO = _H.UNSAT_CLUSTER_RATIO      # Unsat.cc:369


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


def _satisfiable_batch(vs, ws, fo, fe, to_right):
    """Vectorized Unsat BFS (Unsat.cc:148-186): every candidate (v, w)
    pair advances one level per iteration over the shared CSR arrays —
    no per-pair Python BFS, so repeat-rich inputs with many distinct
    pairs stay O(levels) numpy passes.

    Semantics match the reference exactly: the frontier keeps DUPLICATE
    vertices (the reference pushes one entry per out-edge and counts
    them all against MAX_VERTS), a pair is satisfiable when any
    successor vertex equals w, and a pair whose next frontier exceeds
    MAX_VERTS entries stops as unsatisfiable.  Returns (P,) bool.
    """
    P = len(vs)
    sat = np.zeros(P, dtype=bool)
    if P == 0:
        return sat
    fo = np.asarray(fo, dtype=np.int64)
    fe = np.asarray(fe, dtype=np.int64)
    to_right = np.asarray(to_right, dtype=np.int64)
    fp = np.arange(P, dtype=np.int64)  # pair id per frontier entry
    fv = np.asarray(vs, dtype=np.int64)  # frontier vertices (dups kept)
    for _ in range(MAX_DEPTH):
        if fv.size == 0:
            break
        deg = fo[fv + 1] - fo[fv]
        cnt = np.bincount(fp, weights=deg, minlength=P).astype(np.int64)
        total = int(deg.sum())
        if total == 0:
            break
        # flat successor list: one entry per (frontier vertex, out-edge)
        starts = np.repeat(fo[fv], deg)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(deg) - deg, deg
        )
        succ = to_right[fe[starts + within]]
        sp = np.repeat(fp, deg)
        hit = succ == ws[sp]
        sat[sp[hit]] = True
        cont = np.zeros(P, dtype=bool)
        cont[fp] = True
        cont &= ~sat & (cnt <= MAX_VERTS)
        keep = cont[sp]
        fp = sp[keep]
        fv = succ[keep]
    return sat


def unsat(hbv, paths):
    """Returns list of clusters; cluster = sorted list of (e1, e2) link
    pairs (left terminal edge, right terminal edge)."""
    inv = np.asarray(hbv.inv)
    fo, fe, to, te = hbv.vertex_csr()
    E = hbv.n_edges
    npids = paths.n_reads // 2

    # ---- phase 1: unsatisfied pairs (vectorized pre-filters + cached
    # per-(v,w) BFS; reference walks every pair, Unsat.cc:148-186) -----
    off = np.asarray(paths.offsets)
    pedges = np.asarray(paths.edges)
    lens = np.diff(off)
    l1 = lens[0 : 2 * npids : 2]
    l2 = lens[1 : 2 * npids : 2]
    nonempty = (l1 > 0) & (l2 > 0)

    # Meet2(x1, x2): any shared edge between p1 and inv[p2] — one flat
    # key join over all pairs at once
    slot_read = np.repeat(np.arange(2 * npids), lens[: 2 * npids])
    is2 = (slot_read & 1) == 1
    pe_slice = pedges[: off[2 * npids]]
    evals = np.where(is2, inv[pe_slice], pe_slice).astype(np.int64)
    key = (slot_read // 2) * np.int64(E) + evals
    meet_keys = np.intersect1d(key[~is2], key[is2])
    meet = np.zeros(npids, dtype=bool)
    meet[(meet_keys // E).astype(np.int64)] = True

    last1 = np.where(
        nonempty, pedges[np.maximum(off[1 : 2 * npids : 2] - 1, 0)], 0
    )
    last2 = np.where(
        nonempty, pedges[np.maximum(off[2 : 2 * npids + 1 : 2] - 1, 0)], 0
    )
    v_arr = np.asarray(hbv.to_right)[last1]
    w_arr = np.asarray(hbv.to_left)[inv[last2]]
    cand = nonempty & ~meet & (v_arr != w_arr)

    to_right = np.asarray(hbv.to_right)
    cand_idx = np.flatnonzero(cand)
    if cand_idx.size:
        # pack (v, w) into one int64 key — np.unique(axis=0) memcmp-sorts
        nv = np.int64(max(int(hbv.n_vertices), 1))
        packed = v_arr[cand_idx].astype(np.int64) * nv + w_arr[
            cand_idx
        ].astype(np.int64)
        uniq_p, inv_map = np.unique(packed, return_inverse=True)
        sat_u = _satisfiable_batch(
            uniq_p // nv, uniq_p % nv, fo, fe, to_right
        )
        unsat_pairs = [int(p) for p in cand_idx[~sat_u[inv_map]]]
    else:
        unsat_pairs = []

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

    # ---- sequence-overlap merge passes (Unsat.cc:275-355) --------------
    for _ in range(OVERLAP_PASSES):
        out = _overlap_merge(out, hbv)
        out = _merge_clusters(out, nhood_of)

    # ---- partially symmetrize (Unsat.cc:358-365) ------------------------
    nxs = len(out)
    for i in range(nxs):
        rd = sorted((int(inv[b]), int(inv[a])) for a, b in out[i])
        out.append(rd)
    out = _merge_clusters(out, nhood_of)

    # ---- clean clusters: trim low-mult links (Unsat.cc:369-380) ---------
    for i, d in enumerate(out):
        m = [mult[link] for link in d]
        order = sorted(range(len(d)), key=lambda j: (-m[j], d[j]))
        d2 = [d[j] for j in order]
        m2 = [m[j] for j in order]
        for j in range(1, len(m2)):
            if m2[0] >= 1 and m2[0] >= CLUSTER_RATIO * m2[j]:
                d2 = d2[:j]
                break
        out[i] = d2
    return out, mult


def _fwd_kmers(seq, L=OVERLAP_L):
    """Set of forward L-mers of a code sequence (MakeKmerLookup3 uses
    forward kmers, MakeKmerStuff.h:63-78)."""
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    if len(seq) < L:
        return set()
    w = np.lib.stride_tricks.sliding_window_view(seq, L)
    return set(np.ascontiguousarray(w).view(f"V{L}").reshape(-1).tolist())


def _overlap_merge(clusters, hbv):
    """One opass of Unsat.cc:275-355: enlarge each cluster with clusters
    that left-share an edge AND whose right-hand sides overlap (share a
    forward 100-mer with) this cluster's right-hand sides."""
    ind1 = defaultdict(set)
    for i, cl in enumerate(clusters):
        for a, _ in cl:
            ind1[a].add(i)
    out = [list(cl) for cl in clusters]
    kmer_cache = {}

    def kmers_of(e):
        if e not in kmer_cache:
            kmer_cache[e] = _fwd_kmers(hbv.edge_seq(e))
        return kmer_cache[e]

    for i, cl in enumerate(clusters):
        s = sorted({b for _, b in cl})
        m = sorted({j for a, _ in cl for j in ind1[a]})
        r = sorted({b for j in m for _, b in clusters[j]} - set(s))
        if not r or len(r) > MAX_OVERLAP_RHS:
            continue
        skm = set()
        for e in s:
            skm |= kmers_of(e)
        touched = {e for e in r if skm & kmers_of(e)}
        if not touched:
            continue
        grew = False
        for j in m:
            if any(b in touched for _, b in clusters[j]):
                out[i].extend(clusters[j])
                grew = True
        if grew:
            out[i] = sorted(set(out[i]))
    return out


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


class EdgeLayout:
    """CSR view of per-edge read layouts; layout[e] -> sorted list of
    (pos, read_id, fwd?) tuples (the LayoutReads output shape)."""

    def __init__(self, n_edges, edge_ids, pos, rid, fwd):
        order = np.lexsort((fwd, rid, pos, edge_ids))
        self.pos = pos[order]
        self.rid = rid[order]
        self.fwd = fwd[order]
        e_sorted = edge_ids[order]
        self.offsets = np.zeros(n_edges + 1, dtype=np.int64)
        np.add.at(self.offsets, e_sorted + 1, 1)
        np.cumsum(self.offsets, out=self.offsets)

    def __getitem__(self, e):
        lo, hi = self.offsets[e], self.offsets[e + 1]
        return list(
            zip(
                self.pos[lo:hi].tolist(),
                self.rid[lo:hi].tolist(),
                self.fwd[lo:hi].tolist(),
            )
        )


def layout_reads(hbv, paths, read_lengths):
    """LayoutReads (GapToyTools2.cc:550): per edge, the (pos, read id,
    orientation) layout of reads whose path starts or ends there (both
    orientations), sorted by position.  Feeds FindPidsST's local read
    selection in AssembleGaps2.

    Vectorized: only a path's first and last edges receive entries (the
    reference skips interior edges), so every entry is a flat gather —
    no per-read Python loop.
    """
    E = hbv.n_edges
    inv = np.asarray(hbv.inv)
    kmers = np.asarray(hbv.edge_kmers())
    elen = np.asarray(hbv.edge_len())
    off = np.asarray(paths.offsets)
    pedges = np.asarray(paths.edges)
    start = np.asarray(paths.start)
    rl = np.asarray(read_lengths)
    lens = np.diff(off)
    has = np.flatnonzero(lens > 0)
    multi = lens[has] > 1

    first_e = pedges[off[:-1][has]]
    last_e = pedges[off[1:][has] - 1]
    km_cs = np.zeros(len(pedges) + 1, dtype=np.int64)
    np.cumsum(kmers[pedges], out=km_cs[1:])
    # sum of kmers over all path edges except the last
    sum_excl_last = km_cs[off[1:][has] - 1] - km_cs[off[:-1][has]]
    # sum over all except the first
    sum_excl_first = km_cs[off[1:][has]] - km_cs[off[:-1][has] + 1]

    s_i = start[has].astype(np.int64)
    # forward: j=0 at first edge (pos=start); j=m-1 at last edge
    fwd_e = [first_e, last_e[multi]]
    fwd_p = [s_i, (s_i - sum_excl_last)[multi]]
    fwd_r = [has, has[multi]]
    # rc: xr[0]=inv[last], pos0 = ln - (start+rl), ln = elen[last]+sum_excl_last
    pos0_rc = elen[last_e] + sum_excl_last - (s_i + rl[has])
    rc_e = [inv[last_e], inv[first_e][multi]]
    rc_p = [pos0_rc, (pos0_rc - sum_excl_first)[multi]]
    rc_r = [has, has[multi]]

    edge_ids = np.concatenate(fwd_e + rc_e).astype(np.int64)
    pos = np.concatenate(fwd_p + rc_p).astype(np.int64)
    rid = np.concatenate(fwd_r + rc_r).astype(np.int64)
    fwd = np.concatenate(
        [
            np.ones(len(fwd_e[0]) + len(fwd_e[1]), dtype=bool),
            np.zeros(len(rc_e[0]) + len(rc_e[1]), dtype=bool),
        ]
    )
    return EdgeLayout(E, edge_ids, pos, rid, fwd)


# ---------------------------------------------------------------------------
# AssembleGaps2 (AssembleGaps.cc:237-481) — per-blob local reassembly
# ---------------------------------------------------------------------------

MAX_PROX_LEFT = _H.MAX_PROX_LEFT
MAX_PROX_RIGHT = _H.MAX_PROX_RIGHT
PAIR_SAMPLE = _H.PAIR_SAMPLE
# K2_FLOOR sequence (w2rap-contigger.cc:432: {0,100,128,144,172,200});
# the working K2 is max(SelectK2(corrected), K2_FLOOR)
K2_FLOOR_SEQUENCE = _H.K2_FLOOR_SEQUENCE
MAX_BPATHS = _H.MAX_BPATHS  # w2rap-contigger.cc:436

# BigK::gK allowed K values (LargeKDispatcher.h:22-27) as used by
# SelectK2 (LongProtoTools.cc:45: nearest allowed K to 0.22 * median
# corrected length)
ALLOWED_K = (
    20, 24, 28, 32, 40, 48, 60, 72, 80, 84, 88, 96, 100, 108, 116, 128,
    136, 144, 152, 160, 168, 172, 180, 188, 196, 200, 224, 240, 260, 288,
    320, 368, 400, 440, 460, 500, 544, 640, 720, 800, 880, 960, 1000,
    1200, 1600, 2000, 10000,
)
K2FRAC = _H.K2FRAC


def snap_engine_k(k):
    """Historical shim — the all-ones sentinel row can never equal a
    CANONICAL kmer even when k % 16 == 0 (the only all-ones kmer is
    poly-T, whose canonical form is poly-A), and every dictionary/lookup
    in the engine is canonical, so all reference K values are supported
    directly."""
    return k


def select_k2(corrected_lens):
    """SelectK2 (LongProtoTools.cc:45-76)."""
    if not corrected_lens:
        return 0
    med = int(np.median(np.asarray(sorted(corrected_lens))))
    target = K2FRAC * med
    return min(ALLOWED_K, key=lambda k: abs(target - k))


def find_pids_st(lefts, rights, layout, max_prox_left=MAX_PROX_LEFT,
                 max_prox_right=MAX_PROX_RIGHT, pair_sample=PAIR_SAMPLE):
    """FindPidsST (AssembleGaps.cc:65-206): bridging pairs + proximal
    pairs, subsampled to pair_sample."""
    marks = []
    lstarts = defaultdict(list)
    rstarts = defaultdict(list)
    for li, e in enumerate(lefts):
        for pos, rid, fw in layout[e]:
            if fw:
                marks.append((rid // 2, False, pos, li))
    for ri, e in enumerate(rights):
        for pos, rid, fw in layout[e]:
            if not fw:
                marks.append((rid // 2, True, pos, ri))
    marks.sort()
    pids1 = set()
    i = 0
    while i < len(marks):
        j = i
        while j < len(marks) and marks[j][0] == marks[i][0]:
            j += 1
        group = marks[i:j]
        has_l = any(not m[1] for m in group)
        has_r = any(m[1] for m in group)
        if has_l and has_r:
            pids1.add(marks[i][0])
            for pid, is_r, pos, idx in group:
                (rstarts if is_r else lstarts)[idx].append(pos)
        i = j
    for d_ in (lstarts, rstarts):
        for k_ in d_:
            d_[k_].sort()

    pids2 = set()
    for side, edges, starts in (
        ("l", lefts, lstarts),
        ("r", rights, rstarts),
    ):
        for idx, e in enumerate(edges):
            if idx not in starts or not starts[idx]:
                continue
            low, high = starts[idx][0], starts[idx][-1]
            for pos, rid, fw in layout[e]:
                if rid // 2 in pids1:
                    continue
                close = low <= pos <= high
                if not close:
                    a, b = (
                        (max_prox_left, max_prox_right)
                        if fw
                        else (max_prox_right, max_prox_left)
                    )
                    if low > pos and low - pos <= a:
                        close = True
                    elif high < pos and pos - high <= b:
                        close = True
                if close:
                    pids2.add(rid // 2)

    pids1 = sorted(pids1)
    pids2 = sorted(pids2)
    keep = pair_sample // 2
    out = []
    if len(pids1) + len(pids2) <= pair_sample or len(pids1) <= keep:
        out.extend(pids1)
    else:
        out.extend(pids1[(l * len(pids1)) // keep] for l in range(keep))
    if len(out) + len(pids2) <= pair_sample or len(pids2) <= keep:
        out.extend(pids2)
    else:
        out.extend(pids2[(l * len(pids2)) // keep] for l in range(keep))
    return sorted(set(out))


def _local_graph(seqs, k2, min_freq=2):
    """Local HBV from corrected sequences at k2."""
    from ..graph import build as gb
    from ..ops import kmer_engine as ke

    if not seqs:
        return None
    seg = np.zeros(len(seqs) + 1, dtype=np.int64)
    seg[1:] = np.cumsum([len(s) for s in seqs])
    flat = np.concatenate(seqs)
    # blob-local graphs are tiny: everything stays on host (numpy +
    # native leaf) — the padded device form costs DICT_QUANTUM rows of
    # work per call and a dispatch round trip per op on tunneled
    # backends, both of which dwarf the actual problem
    d = ke.count_kmers_flat(flat, seg, k2, min_freq=min_freq, host=True)
    if d.size == 0:
        return None
    gb.recompute_adjacencies(d, host=True)
    eb, es = gb.build_unitigs(d, host=True)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k2)
    return d, hbv, fx, rx


def _low_coverage_set(built, seqs, k2):
    """SupportedHyperBasevector low-coverage filter on a local graph:
    trace the corrected sequences (LongHyper.cc:787-814), weight edges,
    apply DeleteLowCoverage's default branch (graph/shb.py).  Returns
    the set of local edge ids MakeLocalAssembly2 would have deleted
    (GapToyTools.cc:397)."""
    from ..graph import shb
    from ..paths import flat_pather

    d2, lhb, fx, rx = built
    seg = np.zeros(len(seqs) + 1, dtype=np.int64)
    seg[1:] = np.cumsum([len(s) for s in seqs])
    flat = np.concatenate(seqs)
    traced, _, _ = flat_pather.path_flat_sequences(
        flat, seg, d2, lhb, fx, rx, host=True
    )
    inv = shb.involution_from_xlats(lhb.n_edges, fx, rx)
    cov = shb.edge_coverage(lhb.n_edges, inv, traced)
    return shb.low_coverage_edges(lhb, inv, cov)


def _edges_with_shared_kmers(d, hbv_local, fx, rx, root_seqs, k2):
    """Local edges sharing a k2-mer with any root sequence
    (MakeStartStop).  Pure numpy, batched over every root sequence at
    once — the earlier per-sequence device loop paid a fresh jit trace
    per sequence length and a dispatch round trip per op."""
    from ..graph.build import _rows_bytes, _search_host
    from ..ops import bitkmer as bk

    seqs = [s for s in root_seqs if len(s) >= k2]
    if not seqs or d.size == 0:
        return set()
    wins = [
        np.lib.stride_tricks.sliding_window_view(np.asarray(s), k2)
        for s in seqs
    ]
    allw = np.ascontiguousarray(np.concatenate(wins, axis=0))
    words = bk.pack_codes(allw, k2)
    canon, _ = bk.canonicalize(words, k2)
    idx, found = _search_host(_rows_bytes(d.words), canon)
    e0 = np.unique(np.asarray(d.edge_id)[idx[found]])
    return set(np.asarray(fx)[e0].tolist()) | set(np.asarray(rx)[e0].tolist())


def assemble_gaps2(hbv, paths, reads, pair_sample=PAIR_SAMPLE,
                   max_bpaths=MAX_BPATHS, verbose=False, threads=None):
    """Per-blob local reassembly; returns new_stuff (list of uint8 seqs).

    Follows AssembleGaps2 (AssembleGaps.cc:237-481): per blob, the full
    CorrectionSuite (ops.correction), then local assembly of the
    corrected/closed sequences at K2 = max(SelectK2, K2_FLOOR) over the
    K2_FLOOR sequence, start/stop trimming, acyclicity gate, bpath
    enumeration, and Patch's junction cats.

    Blobs run on a dynamic worker pool (the reference's
    ``omp parallel for schedule(dynamic,1)`` over 5000-blob batches,
    AssembleGaps.cc:316-320); results are accumulated in blob order so
    the output is bit-identical to the sequential loop.  The pool is a
    fork()ed process pool by default (blob work is pure numpy + the
    native C++ leaf, so child processes share hbv/paths/reads
    copy-on-write and scale past the GIL); W2RAP_BLOB_POOL=thread
    selects the old thread pool.
    """
    k = hbv.k
    clusters, _ = unsat(hbv, paths)
    if not clusters:
        return []
    LR = condense_lr(clusters, hbv.inv)
    layout = layout_reads(hbv, paths, reads.lengths)

    if threads is None:
        threads = int(os.environ.get("OMP_NUM_THREADS", "0")) or (
            os.cpu_count() or 1
        )
    threads = max(1, min(int(threads), len(LR)))

    def run_blob(lr):
        return _process_blob(
            hbv, paths, reads, layout, lr[0], lr[1], k,
            pair_sample, max_bpaths,
        )

    pool_kind = os.environ.get("W2RAP_BLOB_POOL", "thread")
    new_stuff = []
    if threads == 1:
        results = [run_blob(lr) for lr in LR]
    elif pool_kind == "proc" and hasattr(os, "fork"):
        results = _run_blobs_forked(
            hbv, paths, reads, layout, LR, k, pair_sample, max_bpaths,
            threads,
        )
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as pool:
            results = list(pool.map(run_blob, LR))
    solved = 0
    for pieces in results:
        if pieces:
            solved += 1
            new_stuff.extend(pieces)
    if verbose:
        print(f"AssembleGaps2: {solved}/{len(LR)} blobs solved, "
              f"{len(new_stuff)} pieces")
    return new_stuff


_BLOB_SHARED = None  # (hbv, paths, reads, layout, LR, k, ps, mb) in workers


def _blob_worker(i):
    hbv, paths, reads, layout, LR, k, ps, mb = _BLOB_SHARED
    return _process_blob(
        hbv, paths, reads, layout, LR[i][0], LR[i][1], k, ps, mb
    )


def _run_blobs_forked(hbv, paths, reads, layout, LR, k, pair_sample,
                      max_bpaths, threads):
    """Dynamic (chunksize=1) fork pool over blobs: the big read-only
    arrays are shared copy-on-write, only the blob index travels to the
    worker and only the result pieces travel back (the process-level
    analogue of ``omp parallel for schedule(dynamic,1)``,
    AssembleGaps.cc:316-320).  Falls back to a thread pool if the fork
    pool cannot run (e.g. a backend that forbids forking)."""
    import multiprocessing as mp

    global _BLOB_SHARED
    _BLOB_SHARED = (
        hbv, paths, reads, layout, LR, k, pair_sample, max_bpaths
    )
    try:
        ctx = mp.get_context("fork")
        with ctx.Pool(threads) as pool:
            return pool.map(_blob_worker, range(len(LR)), chunksize=1)
    except Exception:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as pool:
            return list(pool.map(_blob_worker, range(len(LR))))
    finally:
        _BLOB_SHARED = None


def _process_blob(hbv, paths, reads, layout, lefts, rights, k,
                  pair_sample, max_bpaths):
    """One blob of AssembleGaps2 (AssembleGaps.cc:320-470); returns the
    blob's new_stuff pieces (or None).  Pure function of read-only
    shared state — safe to run on a worker pool."""
    from ..core.reads import ReadSet
    from ..graph import ops as gops
    from ..graph.lines import edge_paths
    from ..ops import correction

    pids = find_pids_st(lefts, rights, layout, pair_sample=pair_sample)
    if not pids:
        return None
    rids = np.array(
        sorted({r for p in pids for r in (2 * p, 2 * p + 1)}),
        dtype=np.int64,
    )
    sub = ReadSet(
        reads.bases[rids].copy(),
        reads.lengths[rids].copy(),
        reads.quals[rids].copy(),
    )
    corrected, _creads, _cquals, _done = correction.correction_suite(sub)
    seqs = [np.asarray(s, dtype=np.uint8) for exp in corrected
            for s in exp]
    if not seqs:
        return None
    k2_sel = select_k2([len(exp[0]) for exp in corrected if exp])

    root_left = [hbv.edge_seq(e) for e in lefts]
    root_right = [hbv.edge_seq(e) for e in rights]

    final = None
    tried = set()
    for k2_floor in K2_FLOOR_SEQUENCE:
        k2 = snap_engine_k(max(k2_sel, k2_floor))
        if k2 in tried:
            continue  # next k2_floor
        tried.add(k2)
        built = _local_graph(seqs, k2, min_freq=2)
        if built is None:
            continue
        d2, lhb, fx, rx = built
        lowcov = _low_coverage_set(built, seqs, k2)
        starts = _edges_with_shared_kmers(d2, lhb, fx, rx, root_left, k2)
        starts -= lowcov
        stops = _edges_with_shared_kmers(d2, lhb, fx, rx, root_right, k2)
        stops -= lowcov
        if not starts or not stops:
            continue
        # edges between starts and stops (EdgesSomewhereBetween)
        fwd = _reachable_edges(lhb, starts, forward=True, blocked=lowcov)
        bwd = _reachable_edges(lhb, stops, forward=False, blocked=lowcov)
        keep = ((fwd & bwd) | starts | stops) - lowcov
        dels = [e for e in range(lhb.n_edges) if e not in keep]
        from ..paths.read_paths import ReadPathVec

        empty = ReadPathVec(
            np.zeros(1, np.int64), np.zeros(0, np.int32),
            np.zeros(0, np.int32),
        )
        lhb2, _ = gops.delete_edges(lhb, empty, np.array(dels, dtype=np.int64)) \
            if dels else (lhb, None)
        lhb2, _ = gops.squeeze(lhb2, empty)
        if lhb2.n_edges == 0:
            continue
        if not gops.has_cycle(lhb2, np.arange(lhb2.n_vertices)):
            final = lhb2
            break
    if final is None:
        return None

    # bpaths: all source-sink edge paths
    indeg = final.in_degree()
    outdeg = final.out_degree()
    sources = np.flatnonzero(indeg == 0)
    sinks = np.flatnonzero(outdeg == 0)
    bpaths = []
    overflow = False
    for v in sources:
        for w in sinks:
            ok, ps = edge_paths(final, int(v), int(w), max_bpaths)
            if not ok:
                overflow = True
                break
            for p in ps:
                b = final.edge_seq(p[0]).copy()
                for e in p[1:]:
                    b = np.concatenate(
                        [b[: -(final.k - 1)], final.edge_seq(e)]
                    )
                bpaths.append(b)
            if len(bpaths) > max_bpaths:
                overflow = True
                break
        if overflow:
            break
    if overflow or not bpaths:
        return None
    # left/right root extensions (AssembleGaps.cc:432-460)
    for group, other_end in ((lefts, True), (rights, False)):
        for l in group:
            ext = False
            for m in group:
                if other_end and hbv.to_right[m] == hbv.to_left[l]:
                    b = np.concatenate(
                        [hbv.edge_seq(m)[: -(k - 1)], hbv.edge_seq(l)]
                    )
                    bpaths.append(b.copy())
                    ext = True
                if (not other_end) and hbv.to_left[m] == hbv.to_right[l]:
                    b = np.concatenate(
                        [hbv.edge_seq(l)[: -(k - 1)], hbv.edge_seq(m)]
                    )
                    bpaths.append(b.copy())
                    ext = True
            if not ext:
                bpaths.append(hbv.edge_seq(l).copy())

    # BasesToGraph at K + Patch's new_stuff extraction
    built = _local_graph(bpaths, k, min_freq=1)
    if built is None:
        return None
    _, mhb, _, _ = built
    pieces = []
    for e in range(mhb.n_edges):
        pieces.append(mhb.edge_seq(e).copy())
    mfo, mfe, mto, mte = mhb.vertex_csr()
    for v in range(mhb.n_vertices):
        for e1 in mte[mto[v] : mto[v + 1]]:
            for e2 in mfe[mfo[v] : mfo[v + 1]]:
                s1 = mhb.edge_seq(int(e1))
                s2 = mhb.edge_seq(int(e2))
                # TrimCat (K-1 overlap join)
                pieces.append(
                    np.concatenate([s1[: -(k - 1)], s2]).copy()
                )
    return pieces


def _reachable_edges(hbv, seed_edges, forward=True, blocked=frozenset()):
    """Edges reachable from the far ends of seed edges (edges in
    `blocked` — e.g. low-coverage deletions — are not traversed)."""
    fo, fe, to, te = hbv.vertex_csr()
    seen_v = set()
    stack = [
        int(hbv.to_right[e]) if forward else int(hbv.to_left[e])
        for e in seed_edges
    ]
    out = set()
    while stack:
        v = stack.pop()
        if v in seen_v:
            continue
        seen_v.add(v)
        es = fe[fo[v] : fo[v + 1]] if forward else te[to[v] : to[v + 1]]
        for e in es:
            e = int(e)
            if e in blocked:
                continue
            out.add(e)
            stack.append(
                int(hbv.to_right[e]) if forward else int(hbv.to_left[e])
            )
    return out


def _overlap_append(v1, v2):
    """OverlapAppend (Vec.h:612): append v2 to v1 minus the longest
    suffix-of-v1 == prefix-of-v2 overlap."""
    best = 0
    for overl in range(min(len(v1), len(v2)), 0, -1):
        if v1[-overl:] == v2[:overl]:
            best = overl
            break
    v1.extend(v2[best:])
    return v1


def _translate_paths(paths, hbv2, to3, left3):
    """TranslatePaths (GapToyTools4.cc:164): map every read path through
    the old-edge -> new-edge-path table; output paths have <= 1 edge.

    The common case (start lands on the first new edge) is resolved by
    batched gathers; only boundary-crossing reads walk the
    OverlapAppend chain in Python.
    """
    from ..paths.read_paths import ReadPathVec

    n = paths.n_reads
    elens2 = np.asarray(hbv2.edge_len())
    kmers2 = elens2 - hbv2.k + 1
    plens = paths.path_len()
    off_arr = np.asarray(paths.offsets)
    pe = np.asarray(paths.edges)

    t_len = np.array([len(t) for t in to3], dtype=np.int64)
    t_first = np.array(
        [t[0] if len(t) else -1 for t in to3], dtype=np.int64
    )

    new_edge = np.full(n, -1, dtype=np.int64)
    new_off = np.zeros(n, dtype=np.int32)
    nz = np.flatnonzero(plens > 0)
    if len(nz):
        e0 = pe[off_arr[:-1][nz]]
        start = paths.start[nz].astype(np.int64) + left3[e0]
        has = t_len[e0] > 0
        fits = has & (
            start < elens2[np.maximum(t_first[e0], 0)]
        )
        easy = nz[fits]
        new_edge[easy] = t_first[e0[fits]]
        new_off[easy] = start[fits]
        # boundary-crossing reads: walk the concatenated translation
        for i, rid in enumerate(nz[has & ~fits]):
            rid = int(rid)
            p = paths.path(rid)
            pp = list(to3[int(p[0])])
            for e in p[1:]:
                t = to3[int(e)]
                if not t:
                    break
                _overlap_append(pp, t)
            st = int(paths.start[rid]) + int(left3[int(p[0])])
            trim = 0
            while trim < len(pp) and st >= int(elens2[pp[trim]]):
                st -= int(kmers2[pp[trim]])
                trim += 1
            if trim < len(pp):
                new_edge[rid] = pp[trim]
                new_off[rid] = st

    keep = new_edge >= 0
    offsets = np.zeros(n + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(keep.astype(np.int64))
    flat = new_edge[keep].astype(np.int32)
    starts = np.where(keep, new_off, 0).astype(np.int32)
    return ReadPathVec(offsets, flat, starts)


def _extend_path_ref(p, start, hbv, g, rb, rq, n, min_gain, mode):
    """ExtendPath (GapToyTools4.cc:278): extend a path rightward to
    cover the read; accept only when the best extension's qual-mismatch
    sum beats the runner-up by >= min_gain (mode 1)."""
    K = hbv.k
    if start < 0:
        return p
    rstop = int(g.elen[p[0]]) - start
    for e in p[1:]:
        rstop += int(g.ekmers[e])
    ext = n - rstop
    if ext <= 0:
        return p
    v = int(hbv.to_right[p[-1]])
    if g.out_deg[v] == 0:
        return p
    exts = [[]]
    exts_len = [0]
    j = 0
    while j < len(exts):
        if j > 100:
            return p  # too many extensions
        if exts_len[j] < ext:
            y = int(hbv.to_right[exts[j][-1]]) if exts[j] else v
            for e2 in g.fe[g.fo[y] : g.fo[y + 1]]:
                e2 = int(e2)
                exts.append(exts[j] + [e2])
                exts_len.append(exts_len[j] + int(g.ekmers[e2]))
        j += 1
    cand = [
        (e, el) for e, el in zip(exts, exts_len) if el >= ext
    ]
    if not cand:
        return p
    r = rb[n - ext : n]
    qtail = rq[n - ext : n].astype(np.int64)
    scored = []
    for e, _el in cand:
        bs = np.concatenate(
            [hbv.edge_seq(x)[K - 1 :] for x in e]
        )
        qs = int(np.sum(qtail[: ext][r != bs[:ext]]))
        scored.append((qs, e))
    # SortSync(qsum, exts): lexicographic (qsum, path) like the
    # reference's pair sort
    scored.sort(key=lambda t: (t[0], t[1]))
    if mode == 1:
        if len(scored) >= 2 and scored[1][0] - scored[0][0] < min_gain:
            return p
        return p + scored[0][1]
    m = 1
    while m < len(scored) and scored[m][0] - scored[0][0] < min_gain:
        m += 1
    out = list(p)
    for j2, e2 in enumerate(scored[0][1]):
        for l in range(1, m):
            if j2 >= len(scored[l][1]) or scored[l][1][j2] != e2:
                return p
        out.append(e2)
    return out


def add_new_stuff(hbv, paths, reads, new_stuff, chunk_reads=16384,
                  min_gain=5, ext_mode=1):
    """AddNewStuff (GapToyTools4.cc:199): rebuild the global K graph
    from the old edges + new_stuff, then TRANSLATE the existing read
    paths through the old-edge -> new-path map and re-extend.

    The reference never re-paths reads here (TranslatePaths +
    ExtendPath) — at K > read length (K=260 on PE250) a read holds no
    kmer at all, so fresh re-pathing would empty every path (the
    round-4 16Mbp failure mode)."""
    from ..graph import build as gb
    from ..ops import kmer_engine as ke
    from ..paths import extend as extend_mod
    from ..paths import flat_pather

    if not new_stuff:
        return hbv, paths
    k = hbv.k
    E = hbv.n_edges
    old_seqs = [hbv.edge_seq(e) for e in range(E)]
    seqs = old_seqs + list(new_stuff)
    seqs = [s for s in seqs if len(s) >= k]
    seg = np.zeros(len(seqs) + 1, dtype=np.int64)
    seg[1:] = np.cumsum([len(s) for s in seqs])
    flat = np.concatenate(seqs)
    d = ke.count_kmers_flat(flat, seg, k, min_freq=1)
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv2, fx, rx = gb.build_hbv_from_edges(eb, es, k)

    # to3/left3: walk the OLD edges through the new graph
    # (buildBigKHBVFromReads' allx_paths for the first E entries)
    oseg = np.zeros(E + 1, dtype=np.int64)
    oseg[1:] = np.cumsum([len(s) for s in old_seqs])
    oflat = (
        np.concatenate(old_seqs) if old_seqs else np.zeros(0, np.uint8)
    )
    ipaths, starts3, _stops3 = flat_pather.path_flat_sequences(
        oflat, oseg, d, hbv2, fx, rx
    )
    to3 = [[int(x) for x in q] for q in ipaths]
    left3 = starts3.astype(np.int64)

    paths2 = _translate_paths(paths, hbv2, to3, left3)

    # ExtendPath over every translated read (single-edge paths; the
    # vectorized prefilter keeps only reads that actually extend)
    g = extend_mod._Graph(hbv2)
    n = paths2.n_reads
    plens = paths2.path_len()
    nz = np.flatnonzero(plens > 0)
    first_e = (
        np.asarray(paths2.edges)[np.asarray(paths2.offsets)[:-1][nz]]
        if len(nz)
        else np.zeros(0, np.int64)
    )
    st = paths2.start[nz].astype(np.int64)
    rl = np.asarray(reads.lengths)[nz].astype(np.int64)
    ext_amt = rl - (np.asarray(g.elen)[first_e] - st)
    candm = (
        (st >= 0)
        & (ext_amt > 0)
        & (g.out_deg[np.asarray(hbv2.to_right)[first_e]] > 0)
    )
    changed = {}
    for rid, e0 in zip(nz[candm], first_e[candm]):
        rid = int(rid)
        p2 = _extend_path_ref(
            [int(e0)], int(paths2.start[rid]), hbv2, g,
            reads.bases[rid], reads.quals[rid],
            int(reads.lengths[rid]), min_gain, ext_mode,
        )
        if len(p2) > 1:
            changed[rid] = p2
    if changed:
        from ..paths.read_paths import ReadPathVec

        new_lens = plens.copy()
        for rid, p2 in changed.items():
            new_lens[rid] = len(p2)
        offs = np.zeros(n + 1, dtype=np.int64)
        offs[1:] = np.cumsum(new_lens)
        flat2 = np.zeros(int(offs[-1]), dtype=np.int32)
        rid_all = np.repeat(np.arange(n), plens)
        local = np.arange(len(paths2.edges)) - np.repeat(
            np.asarray(paths2.offsets)[:-1], plens
        )
        unchanged = np.ones(n, dtype=bool)
        for rid in changed:
            unchanged[rid] = False
        m = unchanged[rid_all]
        flat2[(offs[rid_all] + local)[m]] = np.asarray(paths2.edges)[m]
        for rid, p2 in changed.items():
            flat2[offs[rid] : offs[rid] + len(p2)] = p2
        paths2 = ReadPathVec(offs, flat2, paths2.start.copy())
    return hbv2, paths2
