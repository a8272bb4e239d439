"""Multi-chip scaling: kmer-space sharding over a jax.sharding.Mesh.

The reference is single-node OpenMP (SURVEY.md §5.8); the TPU-native
equivalent shards reads data-parallel across chips, counts kmers locally,
then exchanges kmers by hash range over ICI so each chip owns a disjoint
canonical-kmer range — the all-to-all analogue of the reference's
disk-batch k-way merge (BuildReadQGraph.cc:1120-1250).

Design (shard_map over mesh axis "d"):
  1. per-chip kmerize+canonicalize local read shard,
  2. bucket kmers by hash(first word) >> bits == target chip,
  3. ragged all-to-all via fixed-capacity buckets (psum-validated),
  4. per-chip sort+collapse of its owned range,
  5. psum for the global frequency histogram.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import bitkmer as bk
from ..ops import kmer_engine as ke

AXIS = "d"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _bucket_of(words, n_buckets):
    """Cheap mixing hash of the leading kmer word -> bucket id.

    Leading bases are biased (real sequence), so mix with a Murmur-style
    finalizer before taking the top bits.
    """
    h = words[..., 0]
    h = (h ^ (h >> 16)) * np.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * np.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return (h % np.uint32(n_buckets)).astype(jnp.int32)


def count_kmers_sharded(
    bases,
    lengths,
    quals,
    k: int,
    mesh: Mesh,
    min_qual: int = 7,
    min_freq: int = 4,
    chunk_reads: int = 16384,
    cap_factor: float = 2.0,
):
    """Production multi-chip counting: returns (KmerDict, hist) equal to
    ops.kmer_engine.count_kmers on the same reads.

    Per chunk of D*chunk_reads reads: each chip kmerizes its read shard,
    kmers travel to their hash-owner chip via one ICI all-to-all, and
    each chip sort+collapses what it owns.  Bucket capacity overflow is
    DETECTED (psum of per-bucket loads) and the chunk retried at twice
    the capacity — kmers are never silently dropped.  Host-side, the
    per-chip sorted unique runs (disjoint within a chunk) are merged by
    the same balanced merge tree the single-chip path uses; counts
    saturate at 255 and min_freq filters only the final dictionary
    (reference semantics: createDictOMPDiskBased + root filter,
    BuildReadQGraph.cc:1095-1250).
    """
    D = mesh.shape[AXIS]
    n = bases.shape[0]
    L = bases.shape[1]
    W = bk.nwords(k)
    P_pos = L - k + 1
    chunk = chunk_reads * D

    runs = []
    for start in range(0, max(n, 1), chunk):
        stop = min(start + chunk, n)
        if stop <= start:
            break
        cb = np.zeros((chunk, L), dtype=np.uint8)
        cl = np.zeros(chunk, dtype=np.int32)
        cq = np.zeros((chunk, L), dtype=np.uint8)
        cb[: stop - start] = bases[start:stop]
        cl[: stop - start] = lengths[start:stop]
        cq[: stop - start] = quals[start:stop]
        cap = max(128, int(cap_factor * chunk_reads * P_pos / D))
        while True:
            ow, octx, ocnt, nu, over = _sharded_chunk_step(
                jnp.asarray(cb), jnp.asarray(cl), jnp.asarray(cq),
                k, mesh, min_qual, cap,
            )
            if int(np.asarray(over)[0]) == 0:
                break
            cap *= 2  # retry: capacity was exceeded on some chip
        ow = np.asarray(ow)
        octx = np.asarray(octx)
        ocnt = np.asarray(ocnt)
        nu = np.asarray(nu)
        per_rows = ow.shape[0] // D
        for d_ in range(D):
            m = int(nu[d_])
            lo = d_ * per_rows
            runs.append(
                (ow[lo : lo + m], octx[lo : lo + m], ocnt[lo : lo + m])
            )

    if not runs:
        empty = np.zeros((0, W), dtype=np.uint32)
        return (
            ke.KmerDict(empty, np.zeros(0, np.int32), np.zeros(0, np.uint32), k),
            np.zeros(101, dtype=np.int64),
        )
    words, ctx, cnt = ke._host_merge_all(runs)
    hist = np.zeros(101, dtype=np.int64)
    if cnt.size:
        np.add.at(hist, np.minimum(cnt, 100), 1)
    hist[0] = 0
    keep = cnt >= min_freq
    d = ke.KmerDict(
        words[keep], cnt[keep].astype(np.int32), ctx[keep].astype(np.uint32), k
    )
    return d, hist


def _sharded_chunk_step(bases, lengths, quals, k, mesh, min_qual, cap):
    """One all-to-all counting chunk.  Returns per-chip (sorted unique
    words (D*rows, W), ctx, cnt, n_unique (D,), overflow (D,) [replicated
    psum — nonzero iff any bucket anywhere exceeded cap])."""
    D = mesh.shape[AXIS]
    W = bk.nwords(k)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(jax.P(AXIS), jax.P(AXIS), jax.P(AXIS)),
        out_specs=(
            jax.P(AXIS), jax.P(AXIS), jax.P(AXIS), jax.P(AXIS), jax.P(AXIS),
        ),
    )
    def step(b, l, q):
        words, ctx, valid = ke.kmerize_chunk(b, l, q, k, min_qual)
        M = words.shape[0]
        bucket = _bucket_of(words, D)
        bucket = jnp.where(valid, bucket, D)  # invalid -> dropped

        order = jnp.argsort(bucket, stable=True)
        sw = words[order]
        sctx = ctx[order]
        sb = bucket[order]
        counts = jnp.bincount(sb, length=D + 1)[:D]
        overflow = jnp.sum((counts > cap).astype(jnp.int32))
        overflow = jax.lax.psum(overflow, AXIS)
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)[:-1]]
        )

        idx = starts[:, None] + jnp.arange(cap)[None, :]
        within = jnp.arange(cap)[None, :] < counts[:, None]
        idxc = jnp.clip(idx, 0, M - 1)
        send_w = jnp.where(within[..., None], sw[idxc], ke.FULL)
        send_c = jnp.where(within, sctx[idxc], 0)
        send_n = within.astype(jnp.int32)

        recv_w = jax.lax.all_to_all(send_w, AXIS, 0, 0, tiled=False)
        recv_c = jax.lax.all_to_all(send_c, AXIS, 0, 0, tiled=False)
        recv_n = jax.lax.all_to_all(send_n, AXIS, 0, 0, tiled=False)

        rw = recv_w.reshape(D * cap, W)
        rc = recv_c.reshape(D * cap)
        rn = recv_n.reshape(D * cap)
        ow, octx, ocnt, nu = ke.sort_collapse(rw, rc, rn, W)
        return ow, octx, ocnt, nu[None], overflow[None]

    return step(bases, lengths, quals)


def sharded_count_kmers_step(bases, lengths, quals, k: int, mesh: Mesh,
                             min_qual: int = 7, cap_per_bucket: int | None = None):
    """One sharded counting step under shard_map (the multi-chip hot path).

    bases: (D*n, L) sharded on axis 0; returns per-chip sorted unique
    kmers for its hash range (fixed capacity) + the global histogram.
    Used by dryrun_multichip and as the building block for the multi-chip
    pipeline; single-chip production uses ops.kmer_engine directly.
    """
    D = mesh.shape[AXIS]
    n, L = bases.shape
    P_pos = L - k + 1
    W = bk.nwords(k)
    per = n // D
    cap = cap_per_bucket or ((per * P_pos + D - 1) // D * 2)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(jax.P(AXIS), jax.P(AXIS), jax.P(AXIS)),
        out_specs=(jax.P(AXIS), jax.P(AXIS), jax.P()),
    )
    def step(b, l, q):
        words, ctx, valid = ke.kmerize_chunk(b, l, q, k, min_qual)
        M = words.shape[0]
        bucket = _bucket_of(words, D)
        bucket = jnp.where(valid, bucket, D)  # invalid -> dropped

        # stable sort rows by bucket so each destination's slice is
        # contiguous, then pad each bucket to fixed capacity
        order = jnp.argsort(bucket, stable=True)
        sw = words[order]
        sctx = ctx[order]
        sb = bucket[order]
        counts = jnp.bincount(sb, length=D + 1)[:D]
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)[:-1]]
        )

        # gather into (D, cap, W) send buffer
        idx = starts[:, None] + jnp.arange(cap)[None, :]
        within = jnp.arange(cap)[None, :] < counts[:, None]
        idxc = jnp.clip(idx, 0, M - 1)
        send_w = jnp.where(within[..., None], sw[idxc], ke.FULL)
        send_c = jnp.where(within, sctx[idxc], 0)
        send_n = within.astype(jnp.int32)

        # all-to-all over ICI: chip d receives every chip's bucket d
        recv_w = jax.lax.all_to_all(send_w, AXIS, 0, 0, tiled=False)
        recv_c = jax.lax.all_to_all(send_c, AXIS, 0, 0, tiled=False)
        recv_n = jax.lax.all_to_all(send_n, AXIS, 0, 0, tiled=False)

        rw = recv_w.reshape(D * cap, W)
        rc = recv_c.reshape(D * cap)
        rn = recv_n.reshape(D * cap)
        ow, octx, ocnt, nu = ke.sort_collapse(rw, rc, rn, W)

        hist = jnp.zeros(101, dtype=jnp.int32)
        hist = hist.at[jnp.clip(ocnt, 0, 100)].add(
            (ocnt > 0).astype(jnp.int32)
        )
        hist = hist.at[0].set(0)
        hist = jax.lax.psum(hist, AXIS)
        return ow, ocnt, hist

    return step(bases, lengths, quals)
