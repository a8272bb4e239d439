"""Friend (overlap) alignment finding for the correction suite.

Reference: FriendAligner / FriendAlignFinder<K>
(src/paths/long/FriendAligns.{h,cc}, src/paths/long/FriendAlignFinder.h)
— reads are located on a K-mer unipath graph of the local read set
(dictionary cleaned to count>=2, FriendAlignFinder.h:118), reads placed
on a common unipath with overlapping spans become friend candidates, and
every candidate is validated by requiring a >=K-base exact match run at
the implied offset (ValidateAlign, FriendAlignFinder.h:29-60).

TPU-native redesign: sorting replaces the unipath-graph indirection.  A
validated friend alignment at offset o exists iff the two reads share an
exact K-mer at that offset, so we kmerize + canonicalize every read
(dense numpy bit-ops), sort the (kmer, read, pos, rc) records, and emit
deduplicated (id2, offset, rc) pairs per kmer group with multiplicity
in [2, max_freq] (the dictionary clean + the reference's repeat-locs
cap, FriendAlignFinder.h:150-155).  Validation is then by construction.

A `Friend` is (id2, offset, rc): place read id2 (rc'd first when rc) at
column `offset` of the founder read (Friend semantics doc,
FriendAligns.h:20-27).
"""

from __future__ import annotations

import numpy as np

# guard against quadratic blowup in pathological all-repeat blobs
MAX_GROUP_PAIRS = 5_000_000


def _kmer_keys(bases, lengths, K):
    """Canonical K-mer key rows for every window of every read.

    Returns (keys (M, K) uint8 canonical codes, read (M,), pos (M,),
    rcflag (M,) — True when the canonical form is the rc of the window).
    """
    n, L = bases.shape
    P = L - K + 1
    if P <= 0:
        return (np.zeros((0, K), np.uint8),) + tuple(
            np.zeros(0, np.int64) for _ in range(3)
        )
    win = np.lib.stride_tricks.sliding_window_view(bases, K, axis=1)
    # valid windows only
    pos = np.arange(P)
    valid = pos[None, :] <= (lengths[:, None] - K)
    rid, p = np.nonzero(valid)
    fwd = win[rid, p]  # (M, K) uint8
    rc = (3 - fwd)[:, ::-1]
    # lexicographic canonical pick
    diff = fwd != rc
    first = np.where(diff.any(axis=1), np.argmax(diff, axis=1), 0)
    take_rc = fwd[np.arange(len(fwd)), first] > rc[np.arange(len(rc)), first]
    keys = np.where(take_rc[:, None], rc, fwd)
    return keys, rid.astype(np.int64), p.astype(np.int64), take_rc


def rows_order(keys):
    """Stable argsort of (M, K) uint8 rows in lexicographic order, via
    uint64-packed np.lexsort.  np.sort/argsort on void dtypes runs one
    memcmp per comparison (~50x slower at typical blob sizes)."""
    M, K = keys.shape
    C = -(-K // 8)
    pad = np.zeros((M, C * 8), dtype=np.uint8)
    pad[:, :K] = keys
    cols = pad.view(">u8").astype(np.uint64)
    return np.lexsort(tuple(cols[:, c] for c in range(C - 1, -1, -1)))


def find_friends(bases, lengths, K, max_freq=1000):
    """All validated friend alignments for a dense read matrix.

    Returns dict: read id -> sorted list of (id2, offset, rc).
    """
    keys, rid, pos, rcf = _kmer_keys(bases, lengths, K)
    if len(rid) == 0:
        return {}
    void = np.ascontiguousarray(keys).view(
        np.dtype((np.void, keys.shape[1]))
    ).ravel()
    order = rows_order(keys)
    void = void[order]
    rid, pos, rcf = rid[order], pos[order], rcf[order]
    # group boundaries
    bound = np.concatenate(
        [[True], void[1:] != void[:-1]]
    )
    starts = np.flatnonzero(bound)
    ends = np.concatenate([starts[1:], [len(void)]])
    sizes = ends - starts

    out_id1 = []
    out_id2 = []
    out_off = []
    out_rc = []
    budget = MAX_GROUP_PAIRS
    for s, e, c in zip(starts, ends, sizes):
        if c < 2 or c > max_freq:
            continue
        if budget <= 0:
            break
        g_r = rid[s:e]
        g_p = pos[s:e]
        g_o = rcf[s:e]
        # all ordered pairs a != b
        a = np.repeat(np.arange(c), c)
        b = np.tile(np.arange(c), c)
        m = g_r[a] != g_r[b]
        a, b = a[m], b[m]
        if len(a) > budget:
            a, b = a[:budget], b[:budget]
        budget -= len(a)
        same = g_o[a] == g_o[b]
        len2 = lengths[g_r[b]]
        off_same = g_p[a] - g_p[b]
        off_diff = g_p[a] - (len2 - K - g_p[b])
        out_id1.append(g_r[a])
        out_id2.append(g_r[b])
        out_off.append(np.where(same, off_same, off_diff))
        out_rc.append(~same)
    if not out_id1:
        return {}
    id1 = np.concatenate(out_id1)
    id2 = np.concatenate(out_id2)
    off = np.concatenate(out_off)
    rc = np.concatenate(out_rc)
    rec = np.stack([id1, id2, off, rc.astype(np.int64)], axis=1)
    # row-unique via lexsort + consecutive-dedup: np.unique(axis=0)
    # views rows as a void dtype and sorts with one memcmp per compare
    order = np.lexsort((rec[:, 3], rec[:, 2], rec[:, 1], rec[:, 0]))
    rec = rec[order]
    keep = np.ones(len(rec), dtype=bool)
    keep[1:] = (rec[1:] != rec[:-1]).any(axis=1)
    rec = rec[keep]
    friends = {}
    cut = np.concatenate(
        [[0], np.flatnonzero(rec[1:, 0] != rec[:-1, 0]) + 1, [len(rec)]]
    )
    for i in range(len(cut) - 1):
        rows = rec[cut[i] : cut[i + 1]]
        friends[int(rows[0, 0])] = [
            (int(r[1]), int(r[2]), bool(r[3])) for r in rows
        ]
    return friends
