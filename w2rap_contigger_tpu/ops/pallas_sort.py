"""Pallas TPU bitonic sort over multi-word uint32 keys.

This is the round-2 performance kernel for step 2's kmer dictionary
build (reference hot loop: std::sort of KMerNodeFreq vectors inside
createDictOMPRecursive, src/paths/long/BuildReadQGraph.cc:1015-1110).
XLA's generic ``lax.sort`` on TPU runs at ~13M rows/s for 4-word keys —
far below HBM speed-of-light.  This module implements the full sorting
network with VMEM-fused stages:

  * elements live in ``(rows, 128)`` uint32 planes, element ``e`` at
    ``(e // 128, e % 128)``;
  * a *tile kernel* sorts tiles of ``tile_rows * 128`` elements entirely
    in VMEM (all ``log^2(T)/2`` stages in one HBM round trip), producing
    ascending/descending runs that alternate by tile — exactly the
    prefix of the global bitonic network;
  * per merge level, the strides ``>= tile`` are single-pass
    compare-exchanges (implemented with row rolls); the remaining
    ``log2(T)`` strides are fused into one *merge kernel* pass;
  * compare-exchange partners are found with circular rolls instead of
    gathers: for the XOR-partner network, ``roll(x, -s)`` is correct on
    the low side of every 2s group and ``roll(x, +s)`` on the high side,
    and the wrapped lanes always fall on the side that uses the other
    roll.

HBM traffic is ~``(log2(n/T)^2/2 + log2(n/T) + 1)`` passes instead of
XLA sort's per-stage materialization, and all in-tile stages are pure
VPU work.  Keys compare lexicographically over the first ``num_keys``
operands (big-endian packed kmers, ops/bitkmer.py); remaining operands
ride along as payload.  The sort is not stable (counting collapses
equal keys, so stability is irrelevant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_TILE_ROWS = 512


def _roll(x, shift, axis, *, pallas: bool):
    """Circular roll; inside kernels use the TPU-native pltpu.roll."""
    size = x.shape[axis]
    shift = shift % size
    if pallas:
        return pltpu.roll(x, shift, axis)
    return jnp.roll(x, shift, axis)


def _cmp_take(xs, ps, num_keys, is_low, desc):
    """Compare-exchange core.

    xs/ps: lists of operand slabs (mine / partner's).  Returns the new
    operand list.  ``is_low``: mask, True where this element is the low
    index of its pair; ``desc``: mask or scalar bool, True where the
    enclosing block sorts descending.
    """
    gt = None
    lt = None
    eq = None
    for j in range(num_keys):
        gw = xs[j] > ps[j]
        lw = xs[j] < ps[j]
        if gt is None:
            gt, lt = gw, lw
            eq = ~(gw | lw)
        else:
            gt = gt | (eq & gw)
            lt = lt | (eq & lw)
            if j + 1 < num_keys:
                eq = eq & ~(gw | lw)
    # mask arithmetic in uint32: Mosaic cannot select between i1 vectors
    il = is_low.astype(jnp.uint32)
    dc = desc.astype(jnp.uint32)
    take = (
        (il & gt.astype(jnp.uint32))
        | ((jnp.uint32(1) - il) & lt.astype(jnp.uint32))
    ) ^ dc
    take = take != 0
    return [jnp.where(take, p, x) for x, p in zip(xs, ps)]


def _cmp_swap(a_ops, b_ops, num_keys, desc):
    """Compare-exchange between paired halves: a is the low index.
    Returns (new_a, new_b)."""
    gt = None
    eq = None
    for j in range(num_keys):
        gw = a_ops[j] > b_ops[j]
        if gt is None:
            gt = gw
            eq = a_ops[j] == b_ops[j]
        else:
            gt = gt | (eq & gw)
            if j + 1 < num_keys:
                eq = eq & (a_ops[j] == b_ops[j])
    swap = (
        (gt.astype(jnp.uint32) ^ desc.astype(jnp.uint32)) != 0
    )
    na = [jnp.where(swap, b, a) for a, b in zip(a_ops, b_ops)]
    nb = [jnp.where(swap, a, b) for a, b in zip(a_ops, b_ops)]
    return na, nb


def _stage(ops, num_keys, e, s, size, *, pallas):
    """One compare-exchange stage at element stride ``s``.

    e: (rows, 128) int32 global element ids; size may be a traced scalar.
    Row strides use reshape-halves (each pair computed once); lane
    strides use the roll-based XOR-partner form.
    """
    if s >= LANES:
        sr = s // LANES
        R = ops[0].shape[0]
        g = R // (2 * sr)
        shaped = [x.reshape(g, 2, sr, LANES) for x in ops]
        a_ops = [x[:, 0] for x in shaped]
        b_ops = [x[:, 1] for x in shaped]
        ea = e.reshape(g, 2, sr, LANES)[:, 0]
        desc = (ea & size) != 0
        na, nb = _cmp_swap(a_ops, b_ops, num_keys, desc)
        return [
            jnp.stack([x, y], axis=1).reshape(R, LANES)
            for x, y in zip(na, nb)
        ]
    lo = [_roll(x, -s, 1, pallas=pallas) for x in ops]
    hi = [_roll(x, s, 1, pallas=pallas) for x in ops]
    is_low = (e & s) == 0
    ps = [jnp.where(is_low, a, b) for a, b in zip(lo, hi)]
    desc = (e & size) != 0
    return _cmp_take(ops, ps, num_keys, is_low, desc)


def _tile_sort_kernel(num_ops, num_keys, tile_rows, *refs):
    """Sort one tile in VMEM: the global network's levels 2..T, where the
    direction of every level follows the global element index (so tiles
    come out alternating ascending/descending, ready for merge levels)."""
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops:]
    T = tile_rows * LANES
    base = pl.program_id(0) * T
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    e = base + row * LANES + lane
    ops = [r[:] for r in in_refs]
    size = 2
    while size <= T:
        s = size // 2
        while s >= 1:
            ops = _stage(ops, num_keys, e, s, size, pallas=True)
            s //= 2
        size *= 2
    for r, x in zip(out_refs, ops):
        r[:] = x


def _tile_merge_kernel(num_ops, num_keys, tile_rows, size_ref, *refs):
    """Fused strides T/2..1 of one merge level (level size is dynamic,
    read from SMEM, so one compile serves every level)."""
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops:]
    T = tile_rows * LANES
    size = size_ref[0, 0]
    base = pl.program_id(0) * T
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    e = base + row * LANES + lane
    ops = [r[:] for r in in_refs]
    s = T // 2
    while s >= 1:
        ops = _stage(ops, num_keys, e, s, size, pallas=True)
        s //= 2
    for r, x in zip(out_refs, ops):
        r[:] = x


def _cross_stage(ops, num_keys, s, size, n):
    """One compare-exchange stage with stride >= tile, in plain XLA
    (single elementwise pass over reshape-halves)."""
    rows = n // LANES
    sr = s // LANES
    g = rows // (2 * sr)
    shaped = [x.reshape(g, 2, sr, LANES) for x in ops]
    a_ops = [x[:, 0] for x in shaped]
    b_ops = [x[:, 1] for x in shaped]
    e_a = (
        jnp.arange(g, dtype=jnp.int32)[:, None, None] * (2 * s)
    )
    desc = ((e_a & size) != 0)
    na, nb = _cmp_swap(a_ops, b_ops, num_keys, desc)
    return [
        jnp.stack([x, y], axis=1).reshape(rows, LANES)
        for x, y in zip(na, nb)
    ]


@functools.partial(
    jax.jit, static_argnames=("num_keys", "tile_rows", "interpret")
)
def _sort_planes(operands, num_keys, tile_rows, interpret):
    planes = list(operands)
    rows = planes[0].shape[0]
    n = rows * LANES
    T = tile_rows * LANES
    grid = (rows // tile_rows,)
    num_ops = len(planes)

    spec = pl.BlockSpec(
        (tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((rows, LANES), jnp.uint32) for _ in planes
    )
    planes = pl.pallas_call(
        functools.partial(_tile_sort_kernel, num_ops, num_keys, tile_rows),
        grid=grid,
        in_specs=[spec] * num_ops,
        out_specs=(spec,) * num_ops,
        out_shape=out_shapes,
        interpret=interpret,
    )(*planes)
    planes = list(planes)

    if n <= T:
        return planes

    smem_spec = pl.BlockSpec(
        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    merge = pl.pallas_call(
        functools.partial(_tile_merge_kernel, num_ops, num_keys, tile_rows),
        grid=grid,
        in_specs=[smem_spec] + [spec] * num_ops,
        out_specs=(spec,) * num_ops,
        out_shape=out_shapes,
        interpret=interpret,
    )

    size = 2 * T
    while size <= n:
        s = size // 2
        while s >= T:
            planes = _cross_stage(planes, num_keys, s, size, n)
            s //= 2
        planes = list(
            merge(jnp.array([[size]], dtype=jnp.int32), *planes)
        )
        size *= 2
    return planes


def bitonic_sort(operands, num_keys, tile_rows=None, interpret=False):
    """Sort flat uint32 operand arrays by lexicographic multi-word key.

    operands: list of (n,) uint32 arrays; the first ``num_keys`` are key
    words (most significant first), the rest payload.  n must be a
    multiple of 128 and a power of two times 128... in practice: n must
    be a power of two >= 128 (pad with all-ones sentinel keys — they
    sort to the end).  Returns the sorted operand list (same shapes).
    """
    n = operands[0].shape[0]
    assert n & (n - 1) == 0 and n >= LANES, f"n={n} must be a power of two >= 128"
    rows = n // LANES
    if tile_rows is None:
        tile_rows = min(DEFAULT_TILE_ROWS, rows)
    else:
        tile_rows = min(tile_rows, rows)
    assert rows % tile_rows == 0
    planes = [x.reshape(rows, LANES) for x in operands]
    planes = _sort_planes(tuple(planes), num_keys, tile_rows, interpret)
    return [p.reshape(n) for p in planes]
