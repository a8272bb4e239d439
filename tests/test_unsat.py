"""Unsat test: pairs spanning a genuine coverage gap must cluster the
flanking edges; satisfied pairs must not."""

import numpy as np

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.graph import build as gb
from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.paths import pather
from w2rap_contigger_tpu.pipeline import step5_gaps


def make_gapped(rng, k=21, rlen=100, insert=400):
    A = rng.integers(0, 4, size=6000).astype(np.uint8)
    gap = rng.integers(0, 4, size=150).astype(np.uint8)
    B = rng.integers(0, 4, size=6000).astype(np.uint8)
    genome = np.concatenate([A, gap, B])
    seqs, quals = [], []
    g0, g1 = 6000, 6150
    for s in range(0, len(genome) - insert, 6):
        frag = genome[s : s + insert]
        r1 = frag[:rlen]
        r2 = dna.revcomp_codes(frag[-rlen:])
        if not (s + rlen <= g0 or s >= g1):
            continue
        s2 = s + insert - rlen
        if not (s2 + rlen <= g0 or s2 >= g1):
            continue
        seqs.extend([r1, r2])
        quals.extend([np.full(rlen, 38, np.uint8)] * 2)
    reads = ReadSet.from_sequences(seqs, quals)
    d, _ = ke.count_kmers(
        reads.bases, reads.lengths, reads.quals, k, min_freq=2,
        pad_quantum=1024,
    )
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=1024)
    return hbv, paths


def test_unsat_finds_gap_cluster(rng):
    hbv, paths = make_gapped(rng)
    clusters, mult = step5_gaps.unsat(hbv, paths)
    assert clusters, "no unsatisfied clusters found across the gap"
    # the flanking contig edges must appear in some cluster
    all_edges = {e for cl in clusters for ab in cl for e in ab}
    lens = hbv.edge_len()
    # the two long contig edges (and rcs)
    long_edges = set(np.flatnonzero(lens > 4000).tolist())
    assert all_edges & long_edges, "gap cluster does not touch contigs"
    LR = step5_gaps.condense_lr(clusters, hbv.inv)
    assert LR


def _satisfiable_literal(v, w, fo, fe, to_right):
    """Literal transcription of the reference BFS (Unsat.cc:148-186):
    duplicate frontier entries kept, MAX_VERTS counted over them."""
    sat = False
    s = [v]
    for _ in range(step5_gaps.MAX_DEPTH):
        s2 = []
        for x in s:
            for e in fe[fo[x] : fo[x + 1]]:
                y = int(to_right[e])
                if y == w:
                    sat = True
                    break
                s2.append(y)
            if sat:
                break
        if sat or len(s2) > step5_gaps.MAX_VERTS:
            break
        s = s2
    return sat


def test_satisfiable_batch_matches_literal(rng):
    # random sparse digraphs, including high-degree hubs that trigger
    # the MAX_VERTS duplicate-counting overflow
    for trial in range(8):
        nv = int(rng.integers(5, 60))
        ne = int(rng.integers(nv, 4 * nv))
        src = rng.integers(0, nv, size=ne)
        dst = rng.integers(0, nv, size=ne)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        fo = np.zeros(nv + 1, dtype=np.int64)
        np.add.at(fo, src + 1, 1)
        fo = np.cumsum(fo)
        fe = np.arange(ne, dtype=np.int64)  # edge id = flat position
        to_right = dst.astype(np.int64)
        P = 40
        vs = rng.integers(0, nv, size=P).astype(np.int64)
        ws = rng.integers(0, nv, size=P).astype(np.int64)
        got = step5_gaps._satisfiable_batch(vs, ws, fo, fe, to_right)
        want = np.array(
            [
                _satisfiable_literal(int(v), int(w), fo, fe, to_right)
                for v, w in zip(vs, ws)
            ]
        )
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_unsat_clean_genome_empty(rng):
    # fully covered genome: no unsatisfied clusters
    k, rlen, insert = 21, 100, 400
    genome = rng.integers(0, 4, size=8000).astype(np.uint8)
    seqs, quals = [], []
    for s in range(0, len(genome) - insert, 6):
        frag = genome[s : s + insert]
        seqs.extend([frag[:rlen], dna.revcomp_codes(frag[-rlen:])])
        quals.extend([np.full(rlen, 38, np.uint8)] * 2)
    reads = ReadSet.from_sequences(seqs, quals)
    d, _ = ke.count_kmers(
        reads.bases, reads.lengths, reads.quals, k, min_freq=2,
        pad_quantum=1024,
    )
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=1024)
    clusters, mult = step5_gaps.unsat(hbv, paths)
    assert clusters == []
