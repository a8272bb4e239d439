"""Pallas TPU partition (sample) sort for kmer counting streams.

Round-3 performance kernel replacing the global ``lax.sort`` of the
counting pipeline (reference hot loop: the std::sort inside
createDictOMPRecursive, src/paths/long/BuildReadQGraph.cc:1015-1110).
``lax.sort`` on TPU is operand-movement-bound (~150 Mrows/s for 4-word
rows regardless of comparator width); a partition sort does O(1) full
passes over HBM instead of O(log n):

  1. **tile sort** — each VMEM-sized tile is sorted independently
     (bitonic network, one HBM round trip);
  2. **splitters** — classic sample-sort splitter selection, fully on
     device: every sorted tile contributes ``n_bins`` evenly spaced
     keys, the sample is sorted, and every ``n_tiles``-th key becomes a
     bin splitter (so expected bin load is balanced for ANY input
     distribution, including the non-uniform canonical-kmer space);
  3. **partition** — each sorted tile's rows are moved to per-(tile,
     bin) slots of fixed capacity (bins are contiguous ranges of the
     sorted tile, so the move is a monotone forward displacement —
     log-shift moves in VMEM, no DMA scatter); slot slack is filled
     with all-ones sentinels;
  4. **bin sort** — each bin (n_tiles slots, a VMEM-sized region) is
     sorted in one round trip; sentinels sort to the bin tail.

The result is the concatenation of sorted bins: every group of equal
keys is adjacent and bins are in ascending key order, with sentinel
runs interleaved at bin tails — exactly what the one-pass collapse
kernel (ops/pallas_collapse.py) consumes (its segmented logic treats a
sentinel→valid boundary as a segment start and emits each segment at
its valid→sentinel/next-key boundary, so mid-stream sentinel runs are
harmless).

Exactness: sorts compare only the first ``cmp_keys`` (default 2) key
words — 64 bits.  Distinct keys that collide in 64 bits could
interleave inside a bin (probability ~1e-7 per dataset at counting
scale).  The caller must therefore run ``collision_flag`` over the
output and fall back to the exact path when it fires; a fired flag
never produces a wrong dictionary, only a recount.  Skewed inputs
(a single kmer with enormous multiplicity, or an adversarial key
distribution between two splitters) can overflow a slot; the partition
kernel detects this (``overflow`` output) and the caller falls back.
Both checks ride back with the result — no extra synchronization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_sort as psort

LANES = 128
FULL = np.uint32(0xFFFFFFFF)

# VMEM budget: the roll-based sort holds ~5x the plane bytes live (ops
# + both roll directions + partner/select temporaries); 512-row tiles
# keep a 4-operand sort within the 16MB scoped-vmem limit (1024 rows
# measured 18.2MB — over).
DEFAULT_TILE_ROWS = 512       # 65536 elements per tile
DEFAULT_REGION_ROWS = 1024    # target bin-region elements / LANES
CAP_FACTOR = 2                # slot capacity = CAP_FACTOR * tile/bins


def _flat_roll_fwd(x, s, tile_rows):
    """Circular roll of the flat element order by +s (value at e comes
    from (e - s) mod T); s is a TRACED power of two — either < LANES or
    a multiple of LANES.  Both forms are computed and selected (the
    lane form's carry crosses rows; the row form is a plain sublane
    rotate)."""
    rr = pltpu.roll(x, s // LANES, 0)
    a = pltpu.roll(x, jnp.where(s < LANES, s, 0), 1)
    b = pltpu.roll(a, 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    lr = jnp.where(lane < s, b, a)
    return jnp.where(s < LANES, lr, rr)


def _flat_roll_back(x, s, tile_rows):
    """Circular roll of the flat order by -s (value at e comes from
    (e + s) mod T); same s contract as _flat_roll_fwd."""
    rr = pltpu.roll(x, tile_rows - s // LANES, 0)
    a = pltpu.roll(x, jnp.where(s < LANES, LANES - s, 0), 1)
    b = pltpu.roll(a, tile_rows - 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    lr = jnp.where(lane >= LANES - s, b, a)
    return jnp.where(s < LANES, lr, rr)


def _dyn_stage(ops, num_keys, e, s, size, tile_rows, ascend_at):
    """One compare-exchange stage with TRACED stride s and level size.

    Direction follows the global bitonic pattern (e & size) except for
    levels >= ascend_at, which force ascending (used to make every
    region come out ascending instead of alternating)."""
    is_low = (e & s) == 0
    lo = [_flat_roll_back(o, s, tile_rows) for o in ops]
    hi = [_flat_roll_fwd(o, s, tile_rows) for o in ops]
    ps = [jnp.where(is_low, a, b) for a, b in zip(lo, hi)]
    desc = ((e & size) != 0) & (size < ascend_at)
    return psort._cmp_take(list(ops), ps, num_keys, is_low, desc)


def _tile_sort_dyn_kernel(num_ops, num_keys, tile_rows, ascend_at,
                          global_e, *refs):
    """Sort one VMEM tile (levels 1..T of the bitonic network).

    The network runs as a doubly-nested fori_loop over (level, stride)
    with DYNAMIC-shift rolls — a ~40-instruction body executed
    log^2(T)/2 times — instead of a fully unrolled stage list, which
    OOM-kills the Mosaic compiler beyond ~2^16-element tiles.

    global_e=False: every tile sorts ascending independently (phase A —
    the partition step needs ascending tiles).  global_e=True: the
    direction pattern follows the tile's position in the flat array
    (the prefix of a larger network whose merge levels the caller
    continues), with levels >= ascend_at forced ascending.
    """
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops:]
    T = tile_rows * LANES
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    e = row * LANES + lane
    if global_e:
        e = e + pl.program_id(0) * T
    ops = tuple(r[:] for r in in_refs)
    n_levels = max(1, T.bit_length() - 1)  # T = 2^n_levels

    def stride_body(si, carry):
        size, ops = carry
        s = size >> (si + 1)
        ops = tuple(
            _dyn_stage(list(ops), num_keys, e, s, size, tile_rows, ascend_at)
        )
        return size, ops

    def level_body(li, ops):
        size = jnp.int32(2) << li
        _, ops = jax.lax.fori_loop(0, li + 1, stride_body, (size, ops))
        return ops

    ops = jax.lax.fori_loop(0, n_levels, level_body, ops)
    for r, x in zip(out_refs, ops):
        r[:] = x


def _tile_sort_ascending_kernel(num_ops, num_keys, tile_rows, *refs):
    """Back-compat wrapper: independent ascending tile sorts.  With
    local element ids the final level's (e & T) is 0 everywhere, so
    every tile comes out ascending; ascend_at is just "never" (int32-
    safe sentinel)."""
    _tile_sort_dyn_kernel(
        num_ops, num_keys, tile_rows, 1 << 30, False, *refs
    )


def _descend_kernel(num_ops, num_keys, tile_rows, size, ascend_at, *refs):
    """Strides T/2..1 of one merge level (size static; the caller runs
    the >=T strides as XLA cross passes)."""
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops:]
    T = tile_rows * LANES
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    e = row * LANES + lane + pl.program_id(0) * T
    ops = tuple(r[:] for r in in_refs)
    n_strides = max(1, T.bit_length() - 1)

    def stride_body(si, ops):
        s = jnp.int32(T) >> (si + 1)
        return tuple(
            _dyn_stage(
                list(ops), num_keys, e, s, jnp.int32(size), tile_rows,
                ascend_at,
            )
        )

    ops = jax.lax.fori_loop(0, n_strides, stride_body, ops)
    for r, x in zip(out_refs, ops):
        r[:] = x


def _cross_stage_region(ops, num_keys, s, size, n, ascend_at):
    """One XLA compare-exchange at element stride s >= LANES*8 (pairs
    via reshape halves), with the region-ascending direction rule."""
    rows = n // LANES
    sr = s // LANES
    g = rows // (2 * sr)
    shaped = [x.reshape(g, 2, sr, LANES) for x in ops]
    a_ops = [x[:, 0] for x in shaped]
    b_ops = [x[:, 1] for x in shaped]
    e_a = jnp.arange(g, dtype=jnp.int32)[:, None, None] * (2 * s)
    desc = ((e_a & size) != 0) & (size < ascend_at)
    na, nb = psort._cmp_swap(a_ops, b_ops, num_keys, desc)
    return [
        jnp.stack([x, y], axis=1).reshape(rows, LANES)
        for x, y in zip(na, nb)
    ]


def _shift_fwd(x, step, rows, fill):
    """value at flat index e <- x[e - step]; e < step -> fill."""
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


def _partition_kernel(num_ops, cmp_keys, real_keys, tile_rows, n_bins, cap,
                      split_ref, *refs):
    """Copy one sorted tile's per-bin ranges into fixed-capacity slots.

    Inputs: splitters (SMEM (n_bins-1, cmp_keys) u32), then num_ops
    planes of (tile_rows, LANES).  Outputs: num_ops planes of
    (n_bins, cap_rows, LANES) — slot b holds this tile's rows for bin
    b (ascending, sentinel-padded) — plus an (8, LANES) i32 stats
    block whose row 0 is the overflow indicator.

    Because the tile is sorted, bin b's elements form the contiguous
    range [s_b, s_{b+1}) where s_b = #elements < splitter_b.  Each
    slot is filled by ONE fixed-size row-aligned load at the dynamic
    row offset s_b//LANES, with elements outside [s_b, s_{b+1}) masked
    to sentinels — boundary rows are simply read into both adjacent
    slots and each element is valid in exactly one of them.  No
    element-level data movement at all (an earlier log-shift push
    formulation lost rows to transient target collisions — monotone
    displacements do NOT make bitwise moves collision-free).

    A slot must therefore hold up to cap-LANES elements plus one
    boundary row; counts above cap-LANES raise the overflow flag.
    """
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops : 2 * num_ops]
    flag_ref = refs[2 * num_ops]
    starts_ref = refs[2 * num_ops + 1]  # SMEM scratch (n_bins + 1,)
    cap_rows = cap // LANES

    x = [r[:] for r in in_refs]

    # sentinel rows are dropped.  The test spans ALL real key words: a
    # canonical kmer can begin with 64 one-bits (rc-palindromic
    # monsters at K>=64) but can never be all-ones in every word
    # (an all-T kmer canonicalizes to all-A).
    sent = x[0] == FULL
    for j in range(1, real_keys):
        sent = sent & (x[j] == FULL)
    n_valid = jnp.sum((~sent).astype(jnp.int32))

    # Phase A sorted this tile on only the first cmp_keys words, so a
    # REAL row whose first cmp_keys words are all-FULL (possible for
    # rc-palindromic monsters at K>=64) ties with the sentinel rows and
    # may be ordered after them — breaking the [0, n_valid) contiguity
    # this kernel's positional mask relies on and silently dropping the
    # row.  Raise the overflow flag for that input class so the caller
    # takes the exact lax fallback (a fired flag must never produce a
    # wrong dictionary, only a recount).
    if cmp_keys < real_keys:
        ambig = x[0] == FULL
        for j in range(1, cmp_keys):
            ambig = ambig & (x[j] == FULL)
        ambig_rows = jnp.sum((ambig & ~sent).astype(jnp.int32))
    else:
        ambig_rows = jnp.int32(0)

    # s_b = #elements with key < splitter_b (lexicographic over the
    # first cmp_keys words) into SMEM scratch; s_0 = 0, s_B = n_valid.
    # fori_loop, not a static unroll: a fully unrolled n_bins-iteration
    # body OOMs the Mosaic compiler at production bin counts.
    starts_ref[0] = jnp.int32(0)
    starts_ref[n_bins] = n_valid

    def _count_lt(b, carry):
        lt = None
        eq = None
        for j in range(cmp_keys):
            sj = split_ref[b, j]
            lw = x[j] < sj
            ew = x[j] == sj
            if lt is None:
                lt, eq = lw, ew
            else:
                lt = lt | (eq & lw)
                eq = eq & ew
        starts_ref[b + 1] = jnp.sum(lt.astype(jnp.int32))
        return carry

    jax.lax.fori_loop(0, n_bins - 1, _count_lt, jnp.int32(0))

    chunk_shape = (cap_rows, LANES)
    crow = jax.lax.broadcasted_iota(jnp.int32, chunk_shape, 0)
    clane = jax.lax.broadcasted_iota(jnp.int32, chunk_shape, 1)
    max_row0 = tile_rows - cap_rows

    def _fill_slot(b, overflow):
        s_b = starts_ref[b]
        s_b1 = starts_ref[b + 1]
        overflow = overflow + jnp.where(
            s_b1 - s_b > cap - LANES, jnp.int32(1), jnp.int32(0)
        )
        row0 = jnp.minimum(s_b // LANES, max_row0)
        e = (row0 * LANES) + crow * LANES + clane
        valid = (e >= s_b) & (e < s_b1)
        for j in range(num_ops):
            chunk = in_refs[j][pl.ds(row0, cap_rows), :]
            fill = FULL if j < real_keys else np.uint32(0)
            out_refs[j][b] = jnp.where(valid, chunk, fill)
        return overflow

    overflow = jax.lax.fori_loop(0, n_bins, _fill_slot, ambig_rows)
    flag_ref[:, :] = jnp.full((8, LANES), overflow, dtype=jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("num_keys", "cmp_keys", "tile_rows", "n_bins",
                     "interpret"),
)
def _partition_sort_planes(operands, num_keys, cmp_keys, tile_rows, n_bins,
                           interpret):
    planes = [x.reshape(-1, LANES) for x in operands]
    rows = planes[0].shape[0]
    n = rows * LANES
    T = tile_rows * LANES
    n_tiles = rows // tile_rows
    num_ops = len(planes)
    cap = CAP_FACTOR * T // n_bins
    cap_rows = cap // LANES
    region_rows = n_tiles * cap_rows

    spec = pl.BlockSpec(
        (tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((rows, LANES), jnp.uint32) for _ in planes
    )
    # 1. independent ascending tile sorts
    planes = list(
        pl.pallas_call(
            functools.partial(
                _tile_sort_ascending_kernel, num_ops, cmp_keys, tile_rows
            ),
            grid=(n_tiles,),
            in_specs=[spec] * num_ops,
            out_specs=(spec,) * num_ops,
            out_shape=out_shapes,
            interpret=interpret,
        )(*planes)
    )

    # 2. splitters: n_bins evenly spaced samples per sorted tile,
    # sorted, every n_tiles-th taken (equal-rank estimates)
    samp_pos = (
        np.arange(n_tiles)[:, None] * T
        + (np.arange(1, n_bins) * (T // n_bins))[None, :]
        - 1
    ).reshape(-1)
    samples = [p.reshape(-1)[samp_pos] for p in planes[:cmp_keys]]
    ssorted = jax.lax.sort(samples, num_keys=cmp_keys)
    sel = np.arange(1, n_bins) * n_tiles - 1
    splitters = jnp.stack([s[sel] for s in ssorted], axis=1)  # (B-1, ck)

    # 3. partition into per-(tile, bin) slots
    part_out_shapes = tuple(
        jax.ShapeDtypeStruct((n_bins, region_rows, LANES), jnp.uint32)
        for _ in planes
    ) + (jax.ShapeDtypeStruct((n_tiles * 8, LANES), jnp.int32),)
    slot_spec = pl.BlockSpec(
        (n_bins, cap_rows, LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    flag_spec = pl.BlockSpec(
        (8, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(
            _partition_kernel, num_ops, cmp_keys, num_keys, tile_rows,
            n_bins, cap
        ),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * num_ops,
        out_specs=(slot_spec,) * num_ops + (flag_spec,),
        out_shape=part_out_shapes,
        scratch_shapes=[pltpu.SMEM((n_bins + 1,), jnp.int32)],
        interpret=interpret,
    )(splitters, *planes)
    slotted = list(outs[:num_ops])
    overflow = jnp.sum(outs[num_ops][::8, 0])

    # 4. per-bin sorts.  A bin region exceeds what one VMEM sort can
    # hold, so this is a bitonic network truncated at region size: the
    # in-VMEM tile pass runs the global direction pattern (prefix of
    # the region network), then per merge level the >=T strides are XLA
    # reshape-halves passes and the <T strides one descend kernel.
    # Levels at region size force ascending so every bin comes out
    # ascending (the merge direction of the final level is free — its
    # input is already bitonic).
    region_el = region_rows * LANES
    total = n_bins * region_el
    sort_tile_rows = min(tile_rows, region_rows)
    T_s = sort_tile_rows * LANES
    flat_planes = [p.reshape(-1, LANES) for p in slotted]
    sspec = pl.BlockSpec(
        (sort_tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    sshapes = tuple(
        jax.ShapeDtypeStruct((total // LANES, LANES), jnp.uint32)
        for _ in planes
    )
    flat_planes = list(
        pl.pallas_call(
            functools.partial(
                _tile_sort_dyn_kernel, num_ops, cmp_keys, sort_tile_rows,
                region_el, True,
            ),
            grid=(total // T_s,),
            in_specs=[sspec] * num_ops,
            out_specs=(sspec,) * num_ops,
            out_shape=sshapes,
            interpret=interpret,
        )(*flat_planes)
    )
    size = 2 * T_s
    while size <= region_el:
        s = size // 2
        while s >= T_s:
            flat_planes = _cross_stage_region(
                flat_planes, cmp_keys, s, size, total, region_el
            )
            s //= 2
        flat_planes = list(
            pl.pallas_call(
                functools.partial(
                    _descend_kernel, num_ops, cmp_keys, sort_tile_rows,
                    size, region_el,
                ),
                grid=(total // T_s,),
                in_specs=[sspec] * num_ops,
                out_specs=(sspec,) * num_ops,
                out_shape=sshapes,
                interpret=interpret,
            )(*flat_planes)
        )
        size *= 2
    flat = [p.reshape(-1) for p in flat_planes]
    return flat, overflow


def collision_flag(planes, num_keys, cmp_keys=2):
    """Count adjacencies where the first cmp_keys words are equal but a
    later key word differs — the only configurations under which the
    cmp_keys-word comparator could have interleaved distinct keys.
    Zero ⇒ the partition sort's grouping is exact."""
    if num_keys <= cmp_keys:
        return jnp.int32(0)
    eq = None
    neq_rest = None
    for j in range(num_keys):
        pj = jnp.roll(planes[j], 1)
        if j < cmp_keys:
            w = planes[j] == pj
            eq = w if eq is None else eq & w
        else:
            w = planes[j] != pj
            neq_rest = w if neq_rest is None else neq_rest | w
    bad = eq & neq_rest
    bad = bad.at[0].set(False)
    return jnp.sum(bad.astype(jnp.int32))


def partition_sort(operands, num_keys, cmp_keys=2, tile_rows=None,
                   n_bins=None, interpret=False):
    """Group-sort flat u32 operand planes by the leading key words.

    operands: list of (n,) uint32 planes, first ``num_keys`` are key
    words (most significant first), the rest payload; n must be a
    multiple of tile_rows*128 and give a power-of-two tile count.
    Returns (planes, overflow) where planes hold sorted bins
    back-to-back (sentinel runs at bin tails) and overflow is a traced
    scalar — nonzero means a slot overflowed and the caller MUST
    fall back to an exact sort.  The comparator uses only the first
    ``cmp_keys`` words; callers with num_keys > cmp_keys must also
    check ``collision_flag`` on the output.
    """
    n = operands[0].shape[0]
    if tile_rows is None:
        tile_rows = DEFAULT_TILE_ROWS
    if n_bins is None:
        # bins sized so one bin region (n_tiles * cap) fits a VMEM block
        n_tiles = max(1, n // (tile_rows * LANES))
        n_bins = max(
            8,
            CAP_FACTOR * n // (DEFAULT_REGION_ROWS * LANES),
        )
    # slot capacity must be a whole number of 8-sublane blocks (TPU
    # BlockSpec granularity)
    while n_bins > 1 and (CAP_FACTOR * tile_rows * LANES // n_bins) % (
        8 * LANES
    ):
        n_bins //= 2
    T = tile_rows * LANES
    assert n % T == 0, (n, T)
    n_tiles = n // T
    assert n_tiles & (n_tiles - 1) == 0, n_tiles
    cmp_keys = min(cmp_keys, num_keys)
    flat, overflow = _partition_sort_planes(
        tuple(operands), num_keys, cmp_keys, tile_rows, n_bins, interpret
    )
    return flat, overflow
