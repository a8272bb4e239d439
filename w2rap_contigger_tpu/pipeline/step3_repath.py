"""Step 3 — repath the k=60 graph to large K (default 200).

Reference: RepathInMemory (src/paths/long/large/Repath.cc:23-251):
1. read paths -> canonical unique "places" (total bases >= K2),
2. place sequences (K-1 overlap concat, first/last edge truncated to K2),
3. K2 de Bruijn graph from the place sequences (buildBigKHBVFromReads),
4. read-path translation via the place -> new-path mapping.

TPU redesign: the K2 dictionary uses exact multiword kmers (13 uint32
lanes for K=200) in the same sorted-kmer engine instead of the
reference's hashed BigKMer pointer dictionary (kmers/BigKMer.h:28), and
path translation is a dense re-pathing of place sequences rather than a
KmerPathInterval database.
"""

from __future__ import annotations

import numpy as np

from ..graph import build as gb
from ..ops import kmer_engine as ke
from ..paths import flat_pather
from ..paths.read_paths import ReadPathVec


def repath(hbv, paths, k2: int, extend_paths: bool = False):
    """Returns (hbv2, paths2, dict2).

    extend_paths mirrors the reference's EXTEND_PATHS branch
    (Repath.cc:74-97): each unique place is extended by at most one
    solo in-edge on the left and one solo out-edge on the right (the
    reference loop re-tests the same vertex, so it never walks further),
    and the extended copies join the place pool for the K2 graph.
    """
    k = hbv.k
    inv = hbv.inv
    kmers = hbv.edge_kmers()
    lens = hbv.edge_len()

    # ---- places -------------------------------------------------------
    # canonical (min of path vs rc path) unique edge sequences
    place_of_read = {}
    place_list = []
    place_rc = np.zeros(paths.n_reads, dtype=bool)
    place_idx = np.full(paths.n_reads, -1, dtype=np.int64)
    for i in range(paths.n_reads):
        p = paths.path(i)
        if len(p) == 0:
            continue
        nk = int(np.sum(kmers[p]))
        if nk + (k - 1) < k2:
            continue
        y = inv[p[::-1]]
        xb = p.astype(np.int32).tobytes()
        yb = y.astype(np.int32).tobytes()
        rc = yb < xb
        key = yb if rc else xb
        j = place_of_read.get(key)
        if j is None:
            j = len(place_list)
            place_of_read[key] = j
            place_list.append(np.frombuffer(key, dtype=np.int32))
        place_idx[i] = j
        place_rc[i] = rc

    if extend_paths and place_list:
        fo, fe, to, te = hbv.vertex_csr()
        seen = set(place_of_read.keys())
        for si in range(len(place_list)):
            pl = [int(x) for x in place_list[si]]
            pset = set(pl)
            v = int(hbv.to_left[pl[0]])
            if to[v + 1] - to[v] == 1:
                e = int(te[to[v]])
                if e not in pset:
                    pl.insert(0, e)
                    pset.add(e)
            w = int(hbv.to_right[pl[-1]])
            if fo[w + 1] - fo[w] == 1:
                e = int(fe[fo[w]])
                if e not in pset:
                    pl.append(e)
            if len(pl) > len(place_list[si]):
                key = np.asarray(pl, np.int32).tobytes()
                if key not in seen:
                    seen.add(key)
                    place_list.append(np.asarray(pl, np.int32))

    S = len(place_list)
    if S == 0:
        from ..graph.hbv import HyperBasevector

        empty = HyperBasevector(
            k2,
            np.zeros(0, np.uint8),
            np.zeros(1, np.int64),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            0,
        )
        return empty, ReadPathVec(
            np.zeros(paths.n_reads + 1, np.int64),
            np.zeros(0, np.int32),
            np.zeros(paths.n_reads, np.int32),
        ), None

    # ---- place sequences (with K2 truncation of first/last edges) -----
    seq_list = []
    left_trunc = np.zeros(S, dtype=np.int64)
    right_trunc = np.zeros(S, dtype=np.int64)
    for si, pl in enumerate(place_list):
        b = hbv.edge_seq(int(pl[0])).copy()
        for e in pl[1:]:
            b = np.concatenate([b[: -(k - 1)], hbv.edge_seq(int(e))])
        if len(pl) > 1:
            last = int(pl[-1])
            if lens[last] > k2:
                cut = int(lens[last] - k2)
                b = b[:-cut]
                right_trunc[si] = cut
            first = int(pl[0])
            if lens[first] > k2:
                cut = int(lens[first] - k2)
                b = b[cut:]
                left_trunc[si] = cut
        seq_list.append(b)

    seg_offsets = np.zeros(S + 1, dtype=np.int64)
    seg_offsets[1:] = np.cumsum([len(s) for s in seq_list])
    flat = np.concatenate(seq_list) if seq_list else np.zeros(0, np.uint8)

    # ---- K2 graph -----------------------------------------------------
    d2 = ke.count_kmers_flat(flat, seg_offsets, k2, min_freq=1)
    gb.recompute_adjacencies(d2)
    eb, es = gb.build_unitigs(d2)
    hbv2, fx2, rx2 = gb.build_hbv_from_edges(eb, es, k2)

    # ---- place walks in the new graph ---------------------------------
    ipaths2, starts, stops = flat_pather.path_flat_sequences(
        flat, seg_offsets, d2, hbv2, fx2, rx2
    )
    inv2 = hbv2.inv

    # ---- translate read paths -----------------------------------------
    n = paths.n_reads
    new_lens = np.zeros(n, dtype=np.int64)
    ok = place_idx >= 0
    for i in np.flatnonzero(ok):
        new_lens[i] = len(ipaths2[place_idx[i]])
    offsets = np.zeros(n + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(new_lens)
    flat_edges = np.zeros(int(offsets[-1]), dtype=np.int32)
    start_off = np.zeros(n, dtype=np.int32)
    for i in np.flatnonzero(ok):
        si = place_idx[i]
        u = ipaths2[si]
        if len(u) == 0:
            continue
        if not place_rc[i]:
            flat_edges[offsets[i] : offsets[i + 1]] = u
            start_off[i] = paths.start[i] + starts[si] - left_trunc[si]
        else:
            flat_edges[offsets[i] : offsets[i + 1]] = inv2[u[::-1]]
            start_off[i] = paths.start[i] + stops[si] - right_trunc[si]
    paths2 = ReadPathVec(offsets, flat_edges, start_off)
    return hbv2, paths2, d2
