"""Batched (B, R, C) Correct1Pre vs the sequential per-read oracle —
outputs (bases, quals, trim_to) must be bit-identical
(Correct1Pre.cc:50-176)."""

import numpy as np

from w2rap_contigger_tpu.ops import correction


def _mk_reads(rng, n=60, L=90, err=0.02):
    genome = rng.integers(0, 4, size=400).astype(np.uint8)
    starts = rng.integers(0, len(genome) - L, size=n)
    bases = genome[starts[:, None] + np.arange(L)[None, :]].astype(np.uint8)
    m = rng.random((n, L)) < err
    bases[m] = (bases[m] + rng.integers(1, 4, size=int(m.sum()))) % 4
    for i in range(0, n, 4):
        bases[i] = (3 - bases[i])[::-1]
    lengths = np.full(n, L, dtype=np.int32)
    # a few shorter reads exercise the per-length bucketing
    lengths[::7] = L - 13
    quals = rng.integers(3, 45, size=(n, L)).astype(np.int16)
    return bases, lengths, quals


def test_correct1pre_batched_matches_seq(rng):
    for K in (16, 24):
        bases, lengths, quals = _mk_reads(rng)
        to_edit = np.ones(len(lengths), dtype=bool)
        to_edit[5] = False
        lengths[9] = 0

        t1 = lengths.astype(np.int64).copy()
        b1, q1 = correction.correct1pre_seq(
            K, bases, lengths, quals, to_edit, t1
        )
        t2 = lengths.astype(np.int64).copy()
        b2, q2 = correction.correct1pre(
            K, bases, lengths, quals, to_edit, t2
        )
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(q1, q2)
        np.testing.assert_array_equal(t1, t2)


def test_correct1pre_batched_max_stack(rng):
    """Reads whose friend pile exceeds max_stack are skipped in both."""
    bases, lengths, quals = _mk_reads(rng, n=30, L=60)
    to_edit = np.ones(len(lengths), dtype=bool)
    t1 = lengths.astype(np.int64).copy()
    b1, q1 = correction.correct1pre_seq(
        16, bases, lengths, quals, to_edit, t1, max_stack=4
    )
    t2 = lengths.astype(np.int64).copy()
    b2, q2 = correction.correct1pre(
        16, bases, lengths, quals, to_edit, t2, max_stack=4
    )
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(q1, q2)
    np.testing.assert_array_equal(t1, t2)
