"""Brute-force parity tests for the packed k-mer word ops."""

import numpy as np
import pytest

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.ops import bitkmer as bk


def brute_pack(codes, k):
    """Reference big-endian packing via python ints."""
    v = 0
    for c in codes[:k]:
        v = (v << 2) | int(c)
    W = bk.nwords(k)
    v <<= 2 * (16 * W - k)
    words = []
    for i in range(W):
        words.append((v >> (32 * (W - 1 - i))) & 0xFFFFFFFF)
    return np.array(words, dtype=np.uint32)


@pytest.mark.parametrize("k", [7, 16, 21, 32, 48, 60, 64])
def test_pack_unpack_roundtrip(rng, k):
    codes = rng.integers(0, 4, size=(50, k)).astype(np.uint8)
    words = bk.pack_codes(codes, k)
    assert words.dtype == np.uint32
    for i in range(50):
        np.testing.assert_array_equal(words[i], brute_pack(codes[i], k))
    back = bk.unpack_words(words, k)
    np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("k", [7, 16, 31, 60, 64])
def test_rc_words(rng, k):
    codes = rng.integers(0, 4, size=(40, k)).astype(np.uint8)
    words = bk.pack_codes(codes, k)
    rc = bk.rc_words(words, k)
    for i in range(40):
        expect = bk.pack_codes(dna.revcomp_codes(codes[i])[None], k)[0]
        np.testing.assert_array_equal(rc[i], expect)


@pytest.mark.parametrize("k", [12, 60])
def test_canonicalize_matches_string_compare(rng, k):
    codes = rng.integers(0, 4, size=(100, k)).astype(np.uint8)
    words = bk.pack_codes(codes, k)
    canon, is_rev = bk.canonicalize(words, k)
    for i in range(100):
        cexp, was_rc = dna.canonical_codes(codes[i])
        assert bool(is_rev[i]) == was_rc
        np.testing.assert_array_equal(canon[i], bk.pack_codes(cexp[None], k)[0])


def test_palindrome():
    k = 6
    pal = dna.seq_to_codes("ACGCGT")  # rc == self
    notpal = dna.seq_to_codes("ACGTAA")
    w = bk.pack_codes(np.stack([pal, notpal]), k)
    assert bool(bk.is_palindrome(w, k)[0])
    assert not bool(bk.is_palindrome(w, k)[1])


@pytest.mark.parametrize("k", [13, 60])
def test_successor_predecessor(rng, k):
    codes = rng.integers(0, 4, size=(30, k)).astype(np.uint8)
    words = bk.pack_codes(codes, k)
    nxt = rng.integers(0, 4, size=30).astype(np.uint32)
    succ = bk.to_successor(words, nxt, k)
    pred = bk.to_predecessor(words, nxt, k)
    for i in range(30):
        sexp = np.concatenate([codes[i][1:], [nxt[i]]]).astype(np.uint8)
        pexp = np.concatenate([[nxt[i]], codes[i][:-1]]).astype(np.uint8)
        np.testing.assert_array_equal(succ[i], bk.pack_codes(sexp[None], k)[0])
        np.testing.assert_array_equal(pred[i], bk.pack_codes(pexp[None], k)[0])
    np.testing.assert_array_equal(bk.first_base(words, k), codes[:, 0])
    np.testing.assert_array_equal(bk.last_base(words, k), codes[:, -1])


@pytest.mark.parametrize("k", [60])
def test_ops_work_on_jax_arrays(rng, k):
    import jax.numpy as jnp

    codes = rng.integers(0, 4, size=(20, k)).astype(np.uint8)
    words_np = bk.pack_codes(codes, k)
    words_j = jnp.asarray(words_np)
    rc_j = np.asarray(bk.rc_words(words_j, k))
    np.testing.assert_array_equal(rc_j, bk.rc_words(words_np, k))
    canon_j, rev_j = bk.canonicalize(words_j, k)
    canon_n, rev_n = bk.canonicalize(words_np, k)
    np.testing.assert_array_equal(np.asarray(canon_j), canon_n)
    np.testing.assert_array_equal(np.asarray(rev_j), rev_n)


def test_words_lt_eq(rng):
    k = 60
    codes = rng.integers(0, 4, size=(60, k)).astype(np.uint8)
    w = bk.pack_codes(codes, k)
    a, b = w[:30], w[30:]
    lt = bk.words_lt(a, b)
    eq = bk.words_eq(a, b)
    for i in range(30):
        sa = codes[i].tobytes()
        sb = codes[30 + i].tobytes()
        assert bool(lt[i]) == (sa < sb)
        assert bool(eq[i]) == (sa == sb)
