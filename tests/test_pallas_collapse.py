"""Correctness tests for the Pallas collapse+compact kernel (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from w2rap_contigger_tpu.ops import pallas_collapse as pc

FULL = np.uint32(0xFFFFFFFF)


def _ref_collapse(words, payload):
    """numpy reference: group sorted rows, OR ctx, saturate counts."""
    n = words.shape[0]
    sent = np.all(words == FULL, axis=1)
    w = words[~sent]
    p = payload[~sent]
    if w.shape[0] == 0:
        return np.zeros((0, words.shape[1]), np.uint32), np.zeros(0, np.uint32), np.zeros(0, np.int32)
    boundary = np.ones(w.shape[0], bool)
    boundary[1:] = np.any(w[1:] != w[:-1], axis=1)
    seg = np.cumsum(boundary) - 1
    nseg = seg[-1] + 1
    uw = w[boundary]
    cnt = np.zeros(nseg, np.int64)
    np.add.at(cnt, seg, p & 0xFF)
    cnt = np.minimum(cnt, 255).astype(np.int32)
    ctx = np.zeros(nseg, np.uint32)
    np.bitwise_or.at(ctx, seg, (p >> 8) & 0xFF)
    return uw, ctx, cnt


def _make_sorted(rng, n, n_valid, W, key_range):
    words = np.full((n, W), FULL, dtype=np.uint32)
    words[:n_valid] = rng.integers(0, key_range, size=(n_valid, W)).astype(np.uint32)
    # sort rows lexicographically
    order = np.lexsort(tuple(words[:, j] for j in range(W - 1, -1, -1)))
    words = words[order]
    ctx = rng.integers(0, 256, size=n).astype(np.uint32)
    ctx[np.all(words == FULL, axis=1)] = 0
    payload = (ctx << 8) | 1
    payload[np.all(words == FULL, axis=1)] = 0
    return words, payload


@pytest.mark.parametrize("n,n_valid,tile_rows,key_range", [
    (1024, 900, 2, 4),      # heavy duplication, segments span tiles
    (2048, 1919, 4, 1 << 30),  # mostly unique
    (512, 300, 1, 2),       # very long segments (saturation)
    (512, 0, 2, 4),         # all sentinels
])
def test_collapse_compact(n, n_valid, tile_rows, key_range):
    rng = np.random.default_rng(n + n_valid)
    W = 3
    words, payload = _make_sorted(rng, n, n_valid, W, key_range)
    planes = [jnp.asarray(words[:, j]) for j in range(W)] + [jnp.asarray(payload)]
    out_planes, counts, _lb = pc.collapse_compact(planes, tile_rows=tile_rows, interpret=True)
    got_w, got_ctx, got_cnt = pc.gather_unique(out_planes, counts)
    ref_w, ref_ctx, ref_cnt = _ref_collapse(words, payload)
    np.testing.assert_array_equal(got_w, ref_w)
    np.testing.assert_array_equal(got_ctx, ref_ctx)
    np.testing.assert_array_equal(got_cnt, ref_cnt)
    assert int(counts.sum()) == ref_w.shape[0]


def test_collapse_merged_counts():
    """Pre-counted payloads (counts > 1) combine with saturation."""
    rng = np.random.default_rng(5)
    W = 2
    n = 512
    words = np.zeros((n, W), np.uint32)
    words[:480, 1] = np.repeat(np.arange(4, dtype=np.uint32), 120)
    words[480:] = FULL
    order = np.lexsort((words[:, 1], words[:, 0]))
    words = words[order]
    cnt = rng.integers(1, 10, size=n).astype(np.uint32)
    ctx = rng.integers(0, 256, size=n).astype(np.uint32)
    payload = (ctx << 8) | cnt
    sent = np.all(words == FULL, axis=1)
    payload[sent] = 0
    planes = [jnp.asarray(words[:, j]) for j in range(W)] + [jnp.asarray(payload)]
    out_planes, counts, _lb = pc.collapse_compact(planes, tile_rows=1, interpret=True)
    got_w, got_ctx, got_cnt = pc.gather_unique(out_planes, counts)
    ref_w, ref_ctx, ref_cnt = _ref_collapse(words, payload)
    np.testing.assert_array_equal(got_w, ref_w)
    np.testing.assert_array_equal(got_ctx, ref_ctx)
    np.testing.assert_array_equal(got_cnt, ref_cnt)
