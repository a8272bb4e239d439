"""Read pathing tests: paths must be legal walks that reproduce the read
sequence on clean data, with correct offsets."""

import numpy as np
import pytest

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.graph import build as gb
from w2rap_contigger_tpu.graph import validate
from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.paths import extend, pather
from w2rap_contigger_tpu.paths.read_paths import invert_paths


def make_pipeline(rng, glen, rlen, k, n_reads=None, err=0.0):
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    starts = rng.integers(0, glen - rlen + 1, size=n_reads or 3 * glen // rlen * 4)
    seqs = []
    for s in starts:
        r = g[s : s + rlen].copy()
        if err > 0:
            mask = rng.random(rlen) < err
            r[mask] = (r[mask] + rng.integers(1, 4, size=mask.sum())) % 4
        if rng.random() < 0.5:
            r = dna.revcomp_codes(r)
        seqs.append(r)
    # guarantee full coverage with sliding windows too
    for s in range(0, glen - rlen + 1, max(1, rlen // 3)):
        seqs.append(g[s : s + rlen])
    reads = ReadSet.from_sequences(seqs)
    d, _ = ke.count_kmers(
        reads.bases, reads.lengths, reads.quals, k, min_freq=1, pad_quantum=1024
    )
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k)
    return g, reads, d, hbv, fx, rx


def walk_seq(hbv, path, offset, length):
    """Reconstruct the base sequence a (path, offset) walk spells."""
    k = hbv.k
    seq = []
    first = True
    for e in path:
        s = hbv.edge_seq(int(e))
        if first:
            seq.extend(s.tolist())
            first = False
        else:
            seq.extend(s[k - 1 :].tolist())
    seq = np.array(seq, dtype=np.uint8)
    if offset >= 0:
        return seq[offset : offset + length]
    return seq[: length + offset]  # read hangs off the left


def test_paths_reproduce_clean_reads(rng):
    k = 15
    g, reads, d, hbv, fx, rx = make_pipeline(rng, 2000, 60, k)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=128)
    validate.validate_paths(hbv, paths)
    n_pathed = int(np.sum(paths.path_len() > 0))
    assert n_pathed == reads.n_reads  # clean reads must all path

    paths = extend.extend_paths(reads, paths, hbv)
    validate.validate_paths(hbv, paths)
    for i in range(0, reads.n_reads, 5):
        p = paths.path(i)
        off = int(paths.start[i])
        rl = int(reads.lengths[i])
        assert off >= 0  # clean full-coverage: no hanging starts
        got = walk_seq(hbv, p, off, rl)
        # the weak-terminal-seed backoff (BuildReadQGraph.cc:920-937) may
        # leave < MIN_GAP unexplained bases that extension won't touch
        assert len(got) >= rl - (extend.MIN_GAP - 1), f"read {i}: too short"
        np.testing.assert_array_equal(got, reads.bases[i][: len(got)])


def test_paths_with_errors_still_valid(rng):
    k = 15
    g, reads, d, hbv, fx, rx = make_pipeline(rng, 3000, 90, k, err=0.01)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=256)
    validate.validate_paths(hbv, paths)
    # most reads still path
    assert np.sum(paths.path_len() > 0) > 0.8 * reads.n_reads


def test_involution_and_index(rng):
    k = 15
    g, reads, d, hbv, fx, rx = make_pipeline(rng, 1500, 60, k)
    validate.test_involution(hbv)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=512)
    off, rid = invert_paths(paths, hbv.n_edges)
    validate.test_index(hbv, paths, off, rid)


def test_short_reads_get_empty_paths(rng):
    k = 15
    g, reads, d, hbv, fx, rx = make_pipeline(rng, 800, 60, k)
    # add reads shorter than k
    seqs = [g[:10], g[5:17], g[:60]]
    short = ReadSet.from_sequences(seqs)
    paths = pather.path_reads(short, d, hbv, fx, rx, chunk_reads=8)
    assert paths.path_len()[0] == 0
    assert int(paths.start[0]) == 0
    assert paths.path_len()[2] > 0


def test_compact_matches_dense_on_fragmented_reads(rng):
    """Reads with many alternating hit/miss runs must produce identical
    paths through the compact top-k path and the dense fallback (a read
    overflowing RUN_SLOTS switches the whole chunk to the dense path)."""
    k = 15
    g, reads, d, hbv, fx, rx = make_pipeline(rng, 2000, 120, k, err=0.08)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=128)
    dense = pather.path_reads(
        reads, d, hbv, fx, rx, chunk_reads=128, force_dense=True
    )
    np.testing.assert_array_equal(paths.offsets, dense.offsets)
    np.testing.assert_array_equal(paths.edges, dense.edges)
    np.testing.assert_array_equal(paths.start, dense.start)


def test_path_reads_k_exceeds_read_length(rng):
    """AddNewStuff re-paths reads against the rebuilt K graph; when K >
    read length every path must be empty (not a crash) — the reference
    pather finds no seed for such reads either."""
    from w2rap_contigger_tpu.graph import build as gb

    k = 31
    seqs = [rng.integers(0, 4, size=200).astype(np.uint8)]
    seg = np.array([0, 200], dtype=np.int64)
    d = ke.count_kmers_flat(np.concatenate(seqs), seg, k, min_freq=1)
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k)
    short = ReadSet.from_sequences(
        [rng.integers(0, 4, size=20).astype(np.uint8) for _ in range(5)],
        [np.full(20, 35, np.uint8)] * 5,
    )
    paths = pather.path_reads(short, d, hbv, fx, rx, chunk_reads=8)
    assert paths.n_reads == 5
    assert paths.edges.size == 0
    assert np.all(np.diff(paths.offsets) == 0)


def test_native_matches_xla_paths(rng, monkeypatch):
    """The C++ pathing leaf must be bit-identical to the XLA lookup +
    shared decode, including on reads with errors (lookup misses)."""
    g, reads, d, hbv, fx, rx = make_pipeline(rng, 3000, 120, 60, err=0.02)
    monkeypatch.setenv("W2RAP_NATIVE_PATH", "0")
    p0 = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=256)
    monkeypatch.setenv("W2RAP_NATIVE_PATH", "1")
    assert pather._native_path_lib() is not None
    p1 = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=256)
    np.testing.assert_array_equal(p0.offsets, p1.offsets)
    np.testing.assert_array_equal(p0.edges, p1.edges)
    np.testing.assert_array_equal(p0.start, p1.start)


def test_native_slot_overflow_rerun(rng, monkeypatch):
    """With a tiny slot capacity every read overflows; the native
    wrapper re-runs with a larger S and still matches."""
    g, reads, d, hbv, fx, rx = make_pipeline(rng, 2000, 100, 60, err=0.05)
    monkeypatch.setenv("W2RAP_NATIVE_PATH", "0")
    p0 = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=256)
    monkeypatch.setenv("W2RAP_NATIVE_PATH", "1")
    monkeypatch.setattr(pather, "RUN_SLOTS", 2)
    p1 = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=256)
    np.testing.assert_array_equal(p0.offsets, p1.offsets)
    np.testing.assert_array_equal(p0.edges, p1.edges)
    np.testing.assert_array_equal(p0.start, p1.start)


def test_path_flat_native_matches_xla(rng, monkeypatch):
    """Native w2rap_path_flat == the XLA chunk path on multi-segment
    flat pools (step-3 translation planes, then full decode)."""
    from w2rap_contigger_tpu.graph import build as gb
    from w2rap_contigger_tpu.ops import kmer_engine as ke
    from w2rap_contigger_tpu.paths import flat_pather

    k = 48
    genome = rng.integers(0, 4, size=2500).astype(np.uint8)
    segs = []
    for _ in range(40):
        s = int(rng.integers(0, len(genome) - 300))
        ln = int(rng.integers(30, 300))  # some below k -> empty paths
        segs.append(genome[s : s + ln])
    seg_off = np.zeros(len(segs) + 1, dtype=np.int64)
    seg_off[1:] = np.cumsum([len(s) for s in segs])
    flat = np.concatenate(segs)
    gflat = np.concatenate([genome, np.zeros(1, np.uint8)])
    gseg = np.array([0, len(genome)], dtype=np.int64)
    d = ke.count_kmers_flat(genome, gseg, k, min_freq=1)
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k)

    p1, st1, sp1 = flat_pather.path_flat_sequences(
        flat, seg_off, d, hbv, fx, rx
    )
    monkeypatch.setenv("W2RAP_NATIVE_PATH", "0")
    p2, st2, sp2 = flat_pather.path_flat_sequences(
        flat, seg_off, d, hbv, fx, rx
    )
    assert len(p1) == len(p2)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(st1, st2)
    np.testing.assert_array_equal(sp1, sp2)
    assert sum(len(a) for a in p1) > 0
