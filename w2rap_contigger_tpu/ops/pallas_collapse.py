"""Pallas TPU collapse+compact kernel for sorted kmer runs.

After the bitonic sort (ops/pallas_sort.py) leaves equal canonical kmers
adjacent, this kernel — in ONE pass over HBM — turns the sorted stream
into per-tile compacted (kmer, ctx|count) rows:

  1. segment boundaries: compare each element with its predecessor
     (cross-tile via an SMEM carry; the TPU grid runs sequentially);
  2. per-segment (count, ctx) totals: a segmented Hillis-Steele scan in
     VMEM (count saturates at 255 like the reference's uint8
     KMerNodeFreq::count, BuildReadQGraph.cc:948-952; contexts OR);
  3. one element per segment is kept (the segment's last, recognised as
     the predecessor of the next segment's first element — the stream is
     processed shifted by one so no lookahead is needed; the global last
     element is always a padding sentinel);
  4. kept elements are compacted to the front of each tile with the
     log-shift monotone-displacement moves (collision-free because kept
     ranks are unique), dead slots refilled with all-ones sentinels.

The caller gathers each tile's kept rows (a tiny row-level gather) and
drops the (< 128/tile) sentinel slack.  Equivalent reference semantics:
collapse_entries + the root count filter of createDictOMPRecursive
(src/paths/long/BuildReadQGraph.cc:935-960,1095-1110).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
FULL = np.uint32(0xFFFFFFFF)
DEFAULT_TILE_ROWS = 256


def _comb(a, b):
    """Combine packed payloads (ctx<<8 | cnt): ctx ORs, cnt saturates.

    The saturating min runs in int32 — Mosaic cannot legalize unsigned
    vector min (arith.minui)."""
    cnt = jnp.minimum(
        ((a & 0xFF) + (b & 0xFF)).astype(jnp.int32), 255
    ).astype(jnp.uint32)
    return ((a | b) & np.uint32(0xFFFFFF00)) | cnt


def _shift_fwd(x, step, tile_rows, fill):
    """value at flat index e <- x[e - step] (within tile); e < step -> fill."""
    if step < LANES:
        a = pltpu.roll(x, step, 1)
        b = pltpu.roll(a, 1, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        v = jnp.where(lane < step, b, a)
    else:
        v = pltpu.roll(x, step // LANES, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    e = row * LANES + lane
    return jnp.where(e >= step, v, fill)


def _shift_back(x, step, tile_rows, fill):
    """value at flat index e <- x[e + step] (within tile); overflow -> fill."""
    if step < LANES:
        a = pltpu.roll(x, LANES - step, 1)
        b = pltpu.roll(a, tile_rows - 1, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        v = jnp.where(lane >= LANES - step, b, a)
    else:
        v = pltpu.roll(x, tile_rows - step // LANES, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    e = row * LANES + lane
    T = tile_rows * LANES
    return jnp.where(e + step < T, v, fill)


def _collapse_kernel(num_words, tile_rows, min_count, *refs):
    W = num_words
    in_refs = refs[: W + 1]
    out_words = refs[W + 1 : 2 * W + 1]
    out_payload = refs[2 * W + 1]
    out_count = refs[2 * W + 2]
    carry = refs[2 * W + 3]  # SMEM (W+1,): prev words + prev scanned payload

    T = tile_rows * LANES
    shape = (tile_rows, LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    e = row * LANES + lane
    first = (e == 0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for j in range(W):
            carry[j] = FULL
        carry[W] = jnp.uint32(0)

    x = [in_refs[j][:] for j in range(W)]
    p = in_refs[W][:]

    # previous element's words (carry word at the tile's first element)
    prev = [
        jnp.where(first, carry[j], _shift_fwd(x[j], 1, tile_rows, x[j]))
        for j in range(W)
    ]
    neq = x[0] != prev[0]
    for j in range(1, W):
        neq = neq | (x[j] != prev[j])
    is_start = neq.astype(jnp.uint32)  # u32 0/1 mask (rolls need ints)

    # segmented inclusive scan of payload over the flat order
    v, f = p, is_start
    step = 1
    while step < T:
        sv = _shift_fwd(v, step, tile_rows, jnp.uint32(0))
        sf = _shift_fwd(f, step, tile_rows, jnp.uint32(0))
        v = jnp.where(f != 0, v, _comb(sv, v))
        f = f | sf
        step *= 2
    carry_scan = carry[W]
    v = jnp.where(f != 0, v, _comb(carry_scan, v))

    # scanned payload of the previous element
    scanned_prev = jnp.where(
        first, carry_scan, _shift_fwd(v, 1, tile_rows, v)
    )

    # previous element is a sentinel iff all its words are FULL
    sent = prev[0] == FULL
    for j in range(1, W):
        sent = sent & (prev[j] == FULL)
    keep0 = is_start & (~sent).astype(jnp.uint32)  # u32 0/1, pre-filter
    keep = keep0
    if min_count > 1:
        # device-side min_freq filter (reference root filter,
        # BuildReadQGraph.cc:1095): only kmers meeting the count
        # threshold are kept for download
        keep = keep0 & (
            (scanned_prev & 0xFF) >= np.uint32(min_count)
        ).astype(jnp.uint32)

    # update carries for the next tile (last element of this tile)
    for j in range(W):
        carry[j] = x[j][tile_rows - 1, LANES - 1]
    carry[W] = v[tile_rows - 1, LANES - 1]

    # displacement = # dropped before e = e - rank(e)
    drop = jnp.uint32(1) - keep
    d = drop
    step = 1
    while step < T:
        d = d + _shift_fwd(d, step, tile_rows, jnp.uint32(0))
        step *= 2
    d = d - drop  # exclusive

    # log-shift compaction of (prev words, scanned_prev) by keep
    ops = list(prev) + [scanned_prev]
    alive = keep
    nbits = max(1, T.bit_length() - 1)
    for b in range(nbits):
        step = 1 << b
        src_ops = [_shift_back(o, step, tile_rows, o) for o in ops]
        src_d = _shift_back(d, step, tile_rows, jnp.uint32(0))
        src_alive = _shift_back(alive, step, tile_rows, jnp.uint32(0))
        take = (src_alive & ((src_d >> b) & 1)) != 0
        lose = (alive & ((d >> b) & 1)) != 0
        ops = [jnp.where(take, s, o) for s, o in zip(src_ops, ops)]
        alive = jnp.where(take, jnp.uint32(1),
                          jnp.where(lose, jnp.uint32(0), alive))
        d = jnp.where(take, src_d - step, d)

    alive_b = alive != 0
    for j in range(W):
        out_words[j][:] = jnp.where(alive_b, ops[j], FULL)
    out_payload[:] = jnp.where(alive_b, ops[W], jnp.uint32(0))
    # per-tile stats block (8, 128) int32 (Mosaic requires the sublane
    # dim divisible by 8; unsigned reductions are unimplemented, so all
    # reductions run in int32): row 0 = kept count; row 1 lanes
    # 1..min_count-1 = counts of segments dropped by the min_count
    # filter at each total (the histogram's low bins).
    stats = jnp.full((8, LANES), jnp.sum(keep.astype(jnp.int32)),
                     dtype=jnp.int32)
    if min_count > 1:
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        low = jnp.zeros((8, LANES), dtype=jnp.int32)
        segc = scanned_prev & 0xFF
        for b_ in range(1, min_count):
            nb = jnp.sum((keep0 & (segc == b_).astype(jnp.uint32))
                         .astype(jnp.int32))
            low = low + jnp.where((row8 == 1) & (lane8 == b_), nb, 0)
        stats = jnp.where(row8 == 1, low, stats)
    out_count[:, :] = stats


@functools.partial(
    jax.jit, static_argnames=("tile_rows", "min_count", "interpret")
)
def _collapse_planes(planes, tile_rows, min_count, interpret):
    W = len(planes) - 1
    rows = planes[0].shape[0]
    grid = (rows // tile_rows,)
    spec = pl.BlockSpec(
        (tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    cnt_spec = pl.BlockSpec(
        (8, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((rows, LANES), jnp.uint32) for _ in range(W + 1)
    ) + (jax.ShapeDtypeStruct((grid[0] * 8, LANES), jnp.int32),)
    outs = pl.pallas_call(
        functools.partial(_collapse_kernel, W, tile_rows, min_count),
        grid=grid,
        in_specs=[spec] * (W + 1),
        out_specs=(spec,) * (W + 1) + (cnt_spec,),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((W + 1,), jnp.uint32)],
        interpret=interpret,
    )(*planes)
    return outs


def collapse_compact(operands, tile_rows=None, interpret=False, min_count=1):
    """Collapse a SORTED stream of (W key words, payload) flat u32 arrays.

    payload packs (ctx << 8) | count (count saturates at 255).  Returns
    (out_planes list of W+1 flat arrays with each tile's kept elements
    compacted to the tile front, tile_counts (n_tiles,) int32).
    min_count > 1 drops kmers below the count threshold on device (the
    histogram's low bins must then be recovered separately).
    """
    n = operands[0].shape[0]
    assert n % LANES == 0
    rows = n // LANES
    if tile_rows is None:
        tile_rows = min(DEFAULT_TILE_ROWS, rows)
    tile_rows = min(tile_rows, rows)
    assert rows % tile_rows == 0
    planes = tuple(x.reshape(rows, LANES) for x in operands)
    outs = _collapse_planes(planes, tile_rows, min_count, interpret)
    W = len(operands) - 1
    out_planes = [o.reshape(n) for o in outs[: W + 1]]
    counts = outs[W + 1][::8, 0]
    low_bins = jnp.sum(outs[W + 1][1::8, :], axis=0)  # (LANES,) int32
    return out_planes, counts, low_bins


def gather_unique(out_planes, counts, tile_rows=None):
    """Host epilogue: gather each tile's kept rows and drop sentinels.

    Returns (words (M, W) u32, ctx (M,) u32, cnt (M,) i32) host arrays,
    in globally sorted kmer order.
    """
    counts = np.asarray(counts)
    W = len(out_planes) - 1
    n = out_planes[0].shape[0]
    n_tiles = counts.shape[0]
    tr = (n // LANES) // n_tiles
    kept_rows = -(-counts // LANES)  # ceil
    src = np.concatenate(
        [t * tr + np.arange(kr) for t, kr in enumerate(kept_rows)]
    ).astype(np.int32)
    if src.size == 0:
        return (
            np.zeros((0, W), np.uint32),
            np.zeros(0, np.uint32),
            np.zeros(0, np.int32),
        )
    # pad the gather index onto a coarse grid (8 steps/octave) so the
    # take program's shape is dataset-independent (compile-cache hits);
    # the padded rows are trimmed by count before the sentinel filter
    n_real = src.size
    from ..ops.kmer_engine import _quantize_octave

    n_q = min(_quantize_octave(n_real, 128), n // LANES)
    if n_q > n_real:
        src = np.concatenate([src, np.zeros(n_q - n_real, np.int32)])
    src_d = jnp.asarray(src)
    taken = [
        jnp.take(p.reshape(-1, LANES), src_d, axis=0) for p in out_planes[:W]
    ]
    # payload uses only the low 16 bits (ctx<<8 | cnt): truncate on
    # device so half as many payload bytes cross the link
    taken.append(
        jnp.take(out_planes[W].reshape(-1, LANES), src_d, axis=0).astype(
            jnp.uint16
        )
    )
    # one device_get fetches all planes (transfers overlap instead of
    # paying one link round trip per plane)
    hosts = jax.device_get(taken)
    rowsets = [h.reshape(-1)[: n_real * LANES] for h in hosts]
    words = np.stack(rowsets[:W], axis=-1)
    payload = rowsets[W].astype(np.uint32)
    sent = np.all(words == FULL, axis=-1)
    words = words[~sent]
    payload = payload[~sent]
    return (
        words,
        (payload >> 8) & 0xFF,
        (payload & 0xFF).astype(np.int32),
    )
