"""Parity test: the fused Pallas kmerize+canonicalize kernel must produce
the same multiset of (canonical kmer, context) rows as the XLA reference
implementation (ops/kmer_engine.kmerize_chunk).  Row order differs (the
Pallas kernel emits a fixed position permutation), so compare after
sort+collapse."""

import numpy as np
import pytest

from w2rap_contigger_tpu.ops import bitkmer as bk
from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.ops import pallas_kmer as pk


def _collapsed(words, ctx, w):
    ow, octx, ocnt, nu = ke.sort_collapse_leaf(words, ctx, w)
    nu = int(nu)
    return (
        np.asarray(ow)[:nu],
        np.asarray(octx)[:nu],
        np.asarray(ocnt)[:nu],
    )


@pytest.mark.parametrize("k,L", [(25, 60), (60, 250), (200, 250)])
def test_pallas_kmerize_matches_xla(rng, k, L):
    if L <= k:
        pytest.skip("no kmers")
    n = 1024  # multiple + non-multiple of TILE_N both covered below
    bases = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=n).astype(np.int32)
    quals = rng.integers(0, 41, size=(n, L)).astype(np.uint8)
    quals = np.where(rng.random((n, L)) < 0.2, 3, quals).astype(np.uint8)

    import jax.numpy as jnp

    W = bk.nwords(k)
    rw, rctx, rvalid = ke.kmerize_chunk(
        jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(quals), k, 7
    )
    pw, pctx, pvalid = pk.kmerize_chunk_pallas(
        jnp.asarray(bases),
        jnp.asarray(lengths),
        jnp.asarray(quals),
        k,
        7,
        interpret=True,
    )
    assert int(jnp.sum(rvalid)) == int(jnp.sum(pvalid))

    ow_r, octx_r, ocnt_r = _collapsed(rw, rctx, W)
    ow_p, octx_p, ocnt_p = _collapsed(pw, pctx, W)
    np.testing.assert_array_equal(ow_r, ow_p)
    np.testing.assert_array_equal(octx_r, octx_p)
    np.testing.assert_array_equal(ocnt_r, ocnt_p)


def test_pallas_kmerize_ragged_tile(rng):
    """n not a multiple of TILE_N exercises the pad path."""
    import jax.numpy as jnp

    k, L, n = 31, 100, 700
    bases = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    lengths = np.full(n, L, dtype=np.int32)
    quals = np.full((n, L), 35, dtype=np.uint8)
    W = bk.nwords(k)
    rw, rctx, _ = ke.kmerize_chunk(
        jnp.asarray(bases), jnp.asarray(lengths), jnp.asarray(quals), k, 7
    )
    pw, pctx, _ = pk.kmerize_chunk_pallas(
        jnp.asarray(bases),
        jnp.asarray(lengths),
        jnp.asarray(quals),
        k,
        7,
        interpret=True,
    )
    r = _collapsed(rw, rctx, W)
    p = _collapsed(pw, pctx, W)
    for a, b in zip(r, p):
        np.testing.assert_array_equal(a, b)


def test_pack_and_glen_native_matches_numpy(rng):
    # the C++ pack+glen pass must match the numpy mirrors (and the jax
    # good_lengths) bit for bit, including short final words and
    # truncated lengths
    for n, L in [(7, 250), (256, 250), (64, 37)]:
        bases = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
        quals = rng.integers(0, 40, size=(n, L)).astype(np.uint8)
        lengths = rng.integers(0, L + 1, size=n).astype(np.int32)
        for k, mq in [(60, 7), (21, 20)]:
            p1, g1 = pk.pack_and_glen_host(bases, quals, lengths, k, mq)
            assert np.array_equal(p1, pk.pack_rows_host(bases))
            assert np.array_equal(
                g1, pk.good_lengths_host(quals, lengths, k, mq)
            )
            import jax.numpy as jnp

            g_jax = np.asarray(
                ke.good_lengths(
                    jnp.asarray(quals), jnp.asarray(lengths), k, mq
                )
            )
            assert np.array_equal(g1, g_jax)
