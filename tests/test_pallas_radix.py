"""Partition (sample) sort tests — interpret mode.

The contract (ops/pallas_radix.py): valid rows come out grouped (equal
keys adjacent), bins ascending, each bin internally sorted by the
comparator words, sentinel runs only at bin tails; slot overflow must
raise the overflow flag; 64-bit collisions must raise collision_flag.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from w2rap_contigger_tpu.ops import pallas_radix as prad  # noqa: E402

FULL = np.uint32(0xFFFFFFFF)


def _make_stream(rng, n, n_unique, w=4, sentinel_frac=0.1):
    """Random key stream with duplicates; (w0, w1) uniquely identifies
    each full key so the 2-word comparator is exact by construction."""
    uniq = rng.integers(0, 1 << 32, size=(n_unique, w), dtype=np.uint32)
    uniq[:, 0] &= np.uint32(0xFFFFFFF0)  # leave room so FULL can't occur
    # make (w0,w1) unique
    uniq[:, 1] = np.arange(n_unique, dtype=np.uint32)
    pick = rng.integers(0, n_unique, size=n)
    rows = uniq[pick]
    sent = rng.random(n) < sentinel_frac
    rows[sent] = FULL
    # payload is a function of the key so duplicate-group internal
    # order cannot affect equality checks
    payload = np.where(sent, 0, rows[:, 1] ^ np.uint32(0xABCD1234))
    planes = [rows[:, j].copy() for j in range(w)] + [payload]
    return planes, sent


def _valid_rows(planes, w):
    arr = np.stack([np.asarray(p) for p in planes], axis=1)
    sent = np.all(arr[:, :w] == FULL, axis=1)
    return arr[~sent]


def test_partition_sort_groups_and_orders(rng):
    w = 4
    n = 64 * 128  # tile_rows=16 -> 4 tiles
    planes, _ = _make_stream(rng, n, n_unique=700, w=w)
    out, overflow = prad.partition_sort(
        [jnp.asarray(p) for p in planes], num_keys=w, cmp_keys=2,
        tile_rows=16, n_bins=8, interpret=True,
    )
    assert int(overflow) == 0
    got = _valid_rows(out, w)
    ref = _valid_rows(
        jax.lax.sort([jnp.asarray(p) for p in planes], num_keys=w), w
    )
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)
    # no 64-bit collisions by construction
    stripped = [jnp.asarray(np.asarray(p)) for p in out]
    assert int(prad.collision_flag(stripped, num_keys=w, cmp_keys=2)) == 0


def test_partition_sort_overflow_flag(rng):
    w = 2
    n = 32 * 128
    # every row identical: one slot must overflow its capacity
    rows = np.full((n, w), 7, dtype=np.uint32)
    payload = np.ones(n, dtype=np.uint32)
    planes = [rows[:, j].copy() for j in range(w)] + [payload]
    out, overflow = prad.partition_sort(
        [jnp.asarray(p) for p in planes], num_keys=w, cmp_keys=2,
        tile_rows=8, n_bins=8, interpret=True,
    )
    assert int(overflow) > 0


def test_collision_flag_detects_interleaving(rng):
    w = 4
    # adjacent rows equal in (w0, w1) but differing in w2: must flag
    a = np.array([[1, 2, 3, 4], [1, 2, 9, 4], [5, 6, 7, 8]], dtype=np.uint32)
    planes = [jnp.asarray(a[:, j]) for j in range(w)]
    assert int(prad.collision_flag(planes, num_keys=w, cmp_keys=2)) == 1
    b = np.array([[1, 2, 3, 4], [1, 2, 3, 4], [5, 6, 7, 8]], dtype=np.uint32)
    planes = [jnp.asarray(b[:, j]) for j in range(w)]
    assert int(prad.collision_flag(planes, num_keys=w, cmp_keys=2)) == 0


def test_partition_sort_skewed_but_fitting(rng):
    # skewed multiplicities (zipf-ish) that still fit slot capacity:
    # exactness must hold — sample splitters absorb the skew
    w = 3
    n = 64 * 128
    n_unique = 50
    uniq = rng.integers(0, 1 << 31, size=(n_unique, w), dtype=np.uint32)
    uniq[:, 1] = np.arange(n_unique, dtype=np.uint32)
    weights = 1.0 / np.arange(1, n_unique + 1)
    weights /= weights.sum()
    pick = rng.choice(n_unique, size=n, p=weights)
    rows = uniq[np.sort(pick)]
    rng.shuffle(rows)
    payload = rows[:, 1] ^ np.uint32(0x55AA55AA)
    planes = [jnp.asarray(rows[:, j].copy()) for j in range(w)] + [
        jnp.asarray(payload)
    ]
    out, overflow = prad.partition_sort(
        planes, num_keys=w, cmp_keys=2, tile_rows=16, n_bins=4,
        interpret=True,
    )
    if int(overflow) == 0:
        got = _valid_rows(out, w)
        ref = _valid_rows(jax.lax.sort(list(planes), num_keys=w), w)
        np.testing.assert_array_equal(got, ref)
