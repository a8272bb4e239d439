"""Pairwise-aligner tests: banded / free / affine vs brute-force DP
(penalty conventions per src/pairwise_aligners/SmithWat{BandedA,Free,
Affine}.h)."""

import numpy as np
import pytest

from w2rap_contigger_tpu.ops import align


def brute_fit(S, T, mis=2, gap=3, left_pen=0, right_pen=0):
    """Full-matrix fitting DP: S consumed fully, T ends cost *_pen/base."""
    n, m = len(S), len(T)
    D = np.full((n + 1, m + 1), 1 << 30, dtype=np.int64)
    D[0] = np.arange(m + 1) * left_pen
    for i in range(1, n + 1):
        D[i, 0] = i * gap
        for j in range(1, m + 1):
            D[i, j] = min(D[i - 1, j - 1] + (0 if S[i - 1] == T[j - 1] else mis),
                          D[i - 1, j] + gap, D[i, j - 1] + gap)
    return int(np.min(D[n] + np.arange(m, -1, -1) * right_pen))


def _replay_cost(S, T, j0, ops, mis, gap):
    i, j, c = 0, 0, 0
    for op, l in ops:
        if op == "M":
            c += mis * int(np.sum(S[i:i + l] != T[j0 + j:j0 + j + l]))
            i += l
            j += l
        elif op == "I":
            c += gap * l
            i += l
        else:
            c += gap * l
            j += l
    assert i == len(S)
    return c


def test_sw_banded_matches_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(25):
        n = int(rng.integers(5, 40))
        m = n + int(rng.integers(0, 20))
        S = rng.integers(0, 4, n).astype(np.int8)
        T = rng.integers(0, 4, m).astype(np.int8)
        bw = max(n, m)  # full band -> must equal unbanded fitting DP
        best, errors, _, pos_t, ops = align.sw_banded(S, T, 0, bw)
        assert best == brute_fit(S, T)
        assert _replay_cost(S, T, pos_t, ops, 2, 3) == best


def test_sw_banded_finds_offset_placement():
    rng = np.random.default_rng(1)
    T = rng.integers(0, 4, 200).astype(np.int8)
    S = T[80:140].copy()
    S[10] = (S[10] + 1) % 4  # one mismatch
    best, errors, _, pos_t, ops = align.sw_banded(S, T, 80, 10)
    assert best == 2 and errors == 1 and pos_t == 80
    assert ops == [("M", 60)]


def test_banded_costs_batch_matches_host():
    rng = np.random.default_rng(2)
    B, Ls, Lt, bw = 4, 24, 40, 6
    Ss = rng.integers(0, 4, (B, Ls)).astype(np.int8)
    Ts = rng.integers(0, 4, (B, Lt)).astype(np.int8)
    lens_s = np.full(B, Ls, dtype=np.int32)
    lens_t = np.full(B, Lt, dtype=np.int32)
    out = np.asarray(align.banded_costs_batch(Ss, Ts, lens_s, lens_t, 8, bw))
    for b in range(B):
        D, _ = align._banded_matrix(Ss[b], Ts[b], 8, bw, 2, 3)
        np.testing.assert_array_equal(
            np.minimum(out[b], align.BIG), np.minimum(D, align.BIG))


def test_sw_free_matches_bruteforce():
    rng = np.random.default_rng(3)
    for pl in (False, True):
        for pr in (False, True):
            for _ in range(10):
                n = int(rng.integers(3, 25))
                m = n + int(rng.integers(0, 30))
                S = rng.integers(0, 4, n).astype(np.int8)
                T = rng.integers(0, 4, m).astype(np.int8)
                best, pos, ops = align.sw_free(S, T, pl, pr)
                want = brute_fit(S, T, left_pen=3 if pl else 0,
                                 right_pen=3 if pr else 0)
                assert best == want


def brute_affine(S, T, mis=3, go=12, ge=1):
    n, m = len(S), len(T)
    INF = 1 << 30
    M = np.full((n + 1, m + 1), INF, dtype=np.int64)
    X = np.full((n + 1, m + 1), INF, dtype=np.int64)
    Y = np.full((n + 1, m + 1), INF, dtype=np.int64)
    M[0, 0] = 0
    for i in range(1, n + 1):
        X[i, 0] = go + (i - 1) * ge
    for j in range(1, m + 1):
        Y[0, j] = go + (j - 1) * ge
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = 0 if S[i - 1] == T[j - 1] else mis
            M[i, j] = min(M[i - 1, j - 1], X[i - 1, j - 1],
                          Y[i - 1, j - 1]) + s
            X[i, j] = min(M[i - 1, j] + go, X[i - 1, j] + ge,
                          Y[i - 1, j] + go)
            Y[i, j] = min(M[i, j - 1] + go, X[i, j - 1] + go,
                          Y[i, j - 1] + ge)
    return int(min(M[n, m], X[n, m], Y[n, m]))


def test_sw_affine_matches_bruteforce():
    rng = np.random.default_rng(4)
    for _ in range(15):
        n = int(rng.integers(2, 25))
        m = int(rng.integers(2, 25))
        S = rng.integers(0, 4, n).astype(np.int8)
        T = rng.integers(0, 4, m).astype(np.int8)
        best, ops = align.sw_affine(S, T)
        assert best == brute_affine(S, T)
        # ops must consume exactly S and T
        assert sum(l for o, l in ops if o in "MI") == n
        assert sum(l for o, l in ops if o in "MD") == m


def test_sw_affine_prefers_one_long_gap():
    # affine costs should produce a single 6-gap, not interleaved gaps
    S = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.int8)
    T = np.concatenate([S[:4], np.array([2, 2, 2, 2, 2, 2], dtype=np.int8),
                        S[4:]]).astype(np.int8)
    best, ops = align.sw_affine(S, T)
    assert ("D", 6) in [tuple(o) for o in ops]
    assert best == 12 + 5 * 1
