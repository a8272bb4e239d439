"""Correctness tests for the Pallas bitonic sort (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from w2rap_contigger_tpu.ops import pallas_sort as ps


def _ref_sort(ops_np, num_keys):
    """numpy lexsort reference (least-significant key last in lexsort)."""
    order = np.lexsort(tuple(ops_np[j] for j in range(num_keys - 1, -1, -1)))
    return [o[order] for o in ops_np]


@pytest.mark.parametrize("n,tile_rows", [(256, 1), (1024, 2), (4096, 8)])
def test_sort_random_multiword(n, tile_rows):
    rng = np.random.default_rng(n)
    # small value range forces many duplicate keys
    ops = [
        rng.integers(0, 7, size=n, dtype=np.uint32),
        rng.integers(0, 5, size=n, dtype=np.uint32),
        rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32),
    ]
    out = ps.bitonic_sort(
        [jnp.asarray(o) for o in ops], num_keys=3,
        tile_rows=tile_rows, interpret=True,
    )
    ref = _ref_sort(ops, 3)
    for got, want in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(got), want)


def test_sort_with_payload():
    rng = np.random.default_rng(7)
    n = 1024
    keys = rng.integers(0, 50, size=n, dtype=np.uint32)
    payload = np.arange(n, dtype=np.uint32)
    out_k, out_p = ps.bitonic_sort(
        [jnp.asarray(keys), jnp.asarray(payload)], num_keys=1,
        tile_rows=2, interpret=True,
    )
    out_k, out_p = np.asarray(out_k), np.asarray(out_p)
    assert np.all(np.diff(out_k.astype(np.int64)) >= 0)
    # payload stays attached to its key
    np.testing.assert_array_equal(keys[out_p], out_k)


def test_sort_with_sentinels():
    rng = np.random.default_rng(3)
    n = 2048
    valid = 1500
    w0 = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    w1 = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    w0[:valid] = rng.integers(0, 100, size=valid, dtype=np.uint32)
    w1[:valid] = rng.integers(0, 100, size=valid, dtype=np.uint32)
    perm = rng.permutation(n)
    w0, w1 = w0[perm], w1[perm]
    out = ps.bitonic_sort(
        [jnp.asarray(w0), jnp.asarray(w1)], num_keys=2,
        tile_rows=4, interpret=True,
    )
    o0, o1 = np.asarray(out[0]), np.asarray(out[1])
    # sentinels all at the tail
    assert np.all(o0[valid:] == 0xFFFFFFFF)
    ref = _ref_sort([w0, w1], 2)
    np.testing.assert_array_equal(o0, ref[0])
    np.testing.assert_array_equal(o1, ref[1])


def test_sort_single_tile():
    rng = np.random.default_rng(11)
    n = 128
    keys = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    out = ps.bitonic_sort([jnp.asarray(keys)], num_keys=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0]), np.sort(keys))
