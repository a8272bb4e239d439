"""Fused Pallas kmerize+canonicalize kernel.

The XLA version of kmerize_chunk (ops/kmer_engine.py) spends its time in
layout changes: the (N, Pq, 16, W) stack/reshape interleavings and
take_along_axis gathers each cost a relayout pass over ~50MB.  This
kernel computes everything in VMEM with reads on the LANE axis:

  input : packed 2-bit read rows, transposed to (rows=words, lanes=reads)
  output: W word planes + context plane of shape (16*Pq, N) where output
          row p' = r*Pq + q holds window position p = 16*q + r

Every window word, predecessor/successor base, validity mask and the
reverse-complement canonicalization is a static row-slice + shift/or on
(Pq, TILE_N) slabs — no gathers, no relayouts.  The row order is a fixed
permutation of positions, which is irrelevant downstream (the counting
path sorts).

Reference semantics mirrored: count_good_lengths gating
(BuildReadQGraph.cc:962-987), KMerContext bytes (KMerContext.h:36),
canonical form = min(fwd, rc) (BaseVec.h:325).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bitkmer as bk
from . import context as kctx
from .kmer_engine import good_lengths, pack_rows

U32 = jnp.uint32
FULL = np.uint32(0xFFFFFFFF)
TILE_N = 512


def _rc_slabs(fw, k):
    """Reverse-complement on a python list of W word slabs."""
    W = len(fw)
    rev = [bk.revpair32(~fw[W - 1 - j] & FULL) for j in range(W)]
    s = 2 * (16 * W - k)
    if s == 0:
        return rev
    sl = np.uint32(s)
    sr = np.uint32(32 - s)
    out = [((rev[j] << sl) | (rev[j + 1] >> sr)) & FULL for j in range(W - 1)]
    out.append((rev[W - 1] << sl) & FULL)
    return out


def _lt_slabs(a, b):
    W = len(a)
    lt = a[W - 1] < b[W - 1]
    for i in range(W - 2, -1, -1):
        lt = (a[i] < b[i]) | ((a[i] == b[i]) & lt)
    return lt


def _kmerize_kernel(k, Pq, pt_ref, glen_ref, *out_refs):
    """pt_ref: (PTR, TILE_N) u32 — row 0 zero, row 1+t = packed word t.
    glen_ref: (1, TILE_N) int32.  out_refs: W word planes + ctx plane,
    each (16*Pq, TILE_N) u32."""
    W = bk.nwords(k)
    n = pt_ref.shape[1]
    glen = glen_ref[0, :][None, :].astype(jnp.int32)  # (1, N)
    n_kmers = jnp.where(glen > k, glen - (k - 1), 0)  # (1, N)
    qv = jax.lax.broadcasted_iota(jnp.int32, (Pq, n), 0) * 16  # 16q

    pad = 2 * (16 * W - k)
    last_mask = np.uint32((FULL >> pad) << pad) if pad else FULL

    for r in range(16):
        # forward window words for positions p = 16q + r
        fw = []
        for j in range(W):
            hi = pt_ref[1 + j : 1 + j + Pq, :]
            if r == 0:
                v = hi
            else:
                lo = pt_ref[2 + j : 2 + j + Pq, :]
                v = ((hi << np.uint32(2 * r)) | (lo >> np.uint32(32 - 2 * r))) & FULL
            fw.append(v)
        fw[W - 1] = fw[W - 1] & last_mask

        p = qv + r  # (Pq, n)
        valid = p < n_kmers
        has_pred = valid & (p > 0)
        has_succ = valid & (p + k < glen)

        # predecessor base: field (r-1)&15 of word q - (r==0)
        if r == 0:
            pred_rows = pt_ref[0:Pq, :]  # word q-1 (row q)
            pshift = np.uint32(30 - 2 * 15)
        else:
            pred_rows = pt_ref[1 : 1 + Pq, :]  # word q
            pshift = np.uint32(30 - 2 * (r - 1))
        pred = (pred_rows >> pshift) & np.uint32(3)

        # successor base: p + k = 16(q + dq) + rs
        dq, rs = divmod(r + k, 16)
        succ_rows = pt_ref[1 + dq : 1 + dq + Pq, :]
        succ = (succ_rows >> np.uint32(30 - 2 * rs)) & np.uint32(3)

        ctx = kctx.make_context(
            pred, succ, has_pred.astype(U32), has_succ.astype(U32)
        )

        rc = _rc_slabs(fw, k)
        is_rev = _lt_slabs(rc, fw)
        canon = [jnp.where(is_rev, rc[j], fw[j]) for j in range(W)]
        ctx = jnp.where(is_rev, kctx.rc_context(ctx), ctx)

        ctx = jnp.where(valid, ctx, 0)
        for j in range(W):
            out_refs[j][r * Pq : (r + 1) * Pq, :] = jnp.where(
                valid, canon[j], FULL
            )
        out_refs[W][r * Pq : (r + 1) * Pq, :] = ctx.astype(U32)


def unpack_qual_mask(mask_bits, L: int):
    """(N, ceil(L/8)) uint8 little-endian bit rows -> (N, L) bool."""
    n, B = mask_bits.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (mask_bits[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(n, 8 * B)[:, :L] != 0


@functools.partial(jax.jit, static_argnames=("k", "L"))
def good_lengths_mask(mask_bits, lengths, k: int, L: int):
    """count_good_lengths from a packed good-qual bitmask (the device
    side of the packed-upload path; semantics identical to
    kmer_engine.good_lengths)."""
    good_b = unpack_qual_mask(mask_bits, L)
    n = good_b.shape[0]
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    good = good_b & (pos < lengths[:, None])
    badpos = jnp.where(good, jnp.int32(L), pos)
    next_bad = jax.lax.cummin(badpos, axis=1, reverse=True)
    run = next_bad - pos
    ok = run >= k
    i_max = jnp.max(jnp.where(ok, pos, -1), axis=1)
    return jnp.where(i_max >= 0, i_max + k, 0).astype(jnp.int32)


def pack_rows_host(bases):
    """numpy mirror of kmer_engine.pack_rows: (N, L) u8 -> (N, WR) u32."""
    bases = np.asarray(bases, dtype=np.uint32)
    n, L = bases.shape
    Wr = (L + 15) // 16
    padded = np.zeros((n, Wr * 16), dtype=np.uint32)
    padded[:, :L] = bases
    shifts = (30 - 2 * np.arange(16)).astype(np.uint32)
    return np.bitwise_or.reduce(
        padded.reshape(n, Wr, 16) << shifts[None, None, :], axis=-1
    ).astype(np.uint32)


def good_lengths_host(quals, lengths, k: int, min_qual: int):
    """numpy mirror of kmer_engine.good_lengths (count_good_lengths,
    BuildReadQGraph.cc:962-987)."""
    quals = np.asarray(quals)
    n, L = quals.shape
    pos = np.arange(L, dtype=np.int32)[None, :]
    good = (quals >= np.uint8(min_qual)) & (pos < np.asarray(lengths)[:, None])
    badpos = np.where(good, np.int32(L), pos)
    next_bad = np.minimum.accumulate(badpos[:, ::-1], axis=1)[:, ::-1]
    run = next_bad - pos
    i_max = np.max(np.where(run >= k, pos, -1), axis=1)
    return np.where(i_max >= 0, i_max + k, 0).astype(np.int32)


def pack_and_glen_host(bases, quals, lengths, k: int, min_qual: int):
    """Host-side 2-bit packing + usable-prefix lengths in one C++ pass.

    The packed-upload path ships (packed bases, glen) to the device —
    4x fewer base bytes than byte codes and no qual plane at all; glen
    replaces the device-side good_lengths recomputation.  Falls back to
    the numpy mirrors when no toolchain is available.
    """
    import ctypes

    from .. import native

    bases = np.ascontiguousarray(bases, dtype=np.uint8)
    quals = np.ascontiguousarray(quals, dtype=np.uint8)
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    n, L = bases.shape
    Wr = (L + 15) // 16
    lib = native.load("w2rappack", ["pack_kernel.cc"])
    if lib is None:
        return (
            pack_rows_host(bases),
            good_lengths_host(quals, lengths, k, min_qual),
        )
    packed = np.empty((n, Wr), dtype=np.uint32)
    glen = np.empty(n, dtype=np.int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.w2rap_pack_glen(
        bases.ctypes.data_as(u8p),
        quals.ctypes.data_as(u8p),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n),
        ctypes.c_int64(L),
        ctypes.c_int64(Wr),
        ctypes.c_int32(k),
        ctypes.c_int32(min_qual),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        glen.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return packed, glen


@functools.partial(
    jax.jit, static_argnames=("k", "min_qual", "interpret")
)
def kmerize_chunk_pallas(bases, lengths, quals, k: int, min_qual: int,
                         interpret: bool = False):
    """Drop-in replacement for kmerize_chunk: returns (words (M, W) u32
    canonical [FULL sentinels where invalid], ctx (M,) u32, valid (M,)).

    M = 16*ceil((L-k+1)/16) * N; row order is a fixed permutation of
    (read, position) — callers that only sort/collapse are unaffected.
    """
    glen = good_lengths(quals, lengths, k, min_qual)
    packed = pack_rows(bases)  # (n, WR)
    return kmerize_packed_pallas(
        packed, glen, bases.shape[1], k, interpret=interpret
    )


@functools.partial(
    jax.jit, static_argnames=("L", "k", "interpret")
)
def kmerize_packed_pallas(packed, glen, L: int, k: int,
                          interpret: bool = False):
    """Kmerize from 2-bit packed read rows + precomputed good lengths.

    The packed-upload fast path: the host ships (N, ceil(L/16)) u32
    packed rows (4x smaller than byte codes) and a qual bitmask; the
    predecessor/successor context bases are extracted from the packed
    rows inside the kernel, so the byte codes are never needed on
    device."""
    n = packed.shape[0]
    W = bk.nwords(k)
    P = L - k + 1
    Pq = (P + 15) // 16
    P16 = 16 * Pq
    PTR = Pq + W + 2
    WR = packed.shape[1]
    # transpose to (rows=words, lanes=reads) with a leading zero row
    pt = jnp.zeros((PTR, n), dtype=U32)
    rows = min(WR, PTR - 1)
    pt = pt.at[1 : 1 + rows, :].set(packed[:, :rows].T)

    grid = (n // TILE_N,) if n % TILE_N == 0 else ((n + TILE_N - 1) // TILE_N,)
    npad = grid[0] * TILE_N
    if npad != n:
        pt = jnp.pad(pt, ((0, 0), (0, npad - n)))
        glen = jnp.pad(glen, (0, npad - n))

    out_shapes = tuple(
        jax.ShapeDtypeStruct((P16, npad), jnp.uint32) for _ in range(W + 1)
    )
    kernel = functools.partial(_kmerize_kernel, k, Pq)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((PTR, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((P16, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(W + 1)
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(pt, glen.astype(jnp.int32)[None, :])

    words = jnp.stack([o.reshape(-1) for o in outs[:W]], axis=-1)
    ctx = outs[W].reshape(-1)
    valid = ~bk.words_eq(words, jnp.full((1, W), FULL, dtype=jnp.uint32))
    return words, ctx, valid
