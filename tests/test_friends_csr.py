"""Friends CSR (vectorized group-pair enumeration) vs a brute-force
per-group oracle mirroring FriendAlignFinder semantics
(FriendAlignFinder.h:118-155)."""

import numpy as np

from w2rap_contigger_tpu.ops import friends as fm


def _oracle(bases, lengths, K, max_freq=1000):
    """Sequential per-group loop (the pre-round-5 implementation)."""
    keys, rid, pos, rcf = fm._kmer_keys(bases, lengths, K)
    if len(rid) == 0:
        return {}
    void = np.ascontiguousarray(keys).view(
        np.dtype((np.void, keys.shape[1]))
    ).ravel()
    order = fm.rows_order(keys)
    void = void[order]
    rid, pos, rcf = rid[order], pos[order], rcf[order]
    bound = np.concatenate([[True], void[1:] != void[:-1]])
    starts = np.flatnonzero(bound)
    ends = np.concatenate([starts[1:], [len(void)]])
    recs = set()
    for s, e in zip(starts, ends):
        c = e - s
        if c < 2 or c > max_freq:
            continue
        for a in range(s, e):
            for b in range(s, e):
                if rid[a] == rid[b]:
                    continue
                same = rcf[a] == rcf[b]
                if same:
                    off = pos[a] - pos[b]
                else:
                    off = pos[a] - (lengths[rid[b]] - K - pos[b])
                recs.add((int(rid[a]), int(rid[b]), int(off), not same))
    out = {}
    for r in sorted(recs):
        out.setdefault(r[0], []).append(r[1:])
    return out


def test_find_friends_matches_oracle(rng):
    n, L, K = 24, 60, 16
    genome = rng.integers(0, 4, size=300).astype(np.uint8)
    starts = rng.integers(0, len(genome) - L, size=n)
    bases = genome[starts[:, None] + np.arange(L)[None, :]].astype(np.uint8)
    # a few rc reads to exercise orientation
    for i in range(0, n, 3):
        bases[i] = (3 - bases[i])[::-1]
    lengths = rng.integers(L - 10, L + 1, size=n).astype(np.int32)

    fr = fm.find_friends(bases, lengths, K)
    want = _oracle(bases, lengths, K)
    for id1 in range(n):
        got = list(zip(*(x.tolist() for x in fr.slice(id1)))) or []
        got = [(a, b, bool(c)) for a, b, c in got]
        assert got == want.get(id1, []), f"read {id1}"


def test_find_friends_empty():
    fr = fm.find_friends(
        np.zeros((4, 10), np.uint8), np.full(4, 10, np.int32), 16
    )
    assert fr.count(0) == 0 and len(fr.id2) == 0
