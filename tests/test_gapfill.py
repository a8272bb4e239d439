"""fillGaps / joinOverlaps (graph.gapfill) vs reference semantics
(src/paths/long/BuildReadQGraph.cc:566-806)."""

import numpy as np

from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.graph import build as gb
from w2rap_contigger_tpu.graph import gapfill
from w2rap_contigger_tpu.ops import kmer_engine as ke

K = 32
RNG = np.random.default_rng(11)


def _genome(n=300):
    return RNG.integers(0, 4, size=n).astype(np.uint8)


def _reads(genome, spans):
    """spans: list of (start, stop, copies)."""
    seqs = []
    for s, e, c in spans:
        seqs.extend([genome[s:e]] * c)
    quals = [np.full(len(x), 35, np.uint8) for x in seqs]
    return ReadSet.from_sequences(seqs, quals)


def _dict_and_edges(reads, min_freq=4):
    d, _ = ke.count_kmers(
        reads.bases, reads.lengths, reads.quals, K,
        min_qual=7, min_freq=min_freq, chunk_reads=1024,
    )
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    return d, eb, es


def _edge_seq_set(eb, es):
    return {
        bytes(eb[es[i] : es[i + 1]]) for i in range(len(es) - 1)
    }


def test_fill_gaps_connects_low_coverage_span():
    g = _genome(300)
    # prefix/suffix at depth 6 (>= minFreq), middle only from 3 spanning
    # copies (< minFreq=4 but >= minFreq2=3) -> dropped by counting,
    # recovered by fillGaps
    reads = _reads(g, _spans())
    d, eb, es = _dict_and_edges(reads)
    assert len(es) - 1 == 2  # disconnected prefix + suffix unitigs
    d2, eb2, es2 = gapfill.fill_gaps(reads, d, eb, es, 0, 3)
    assert len(es2) - 1 == 1
    seq = eb2[es2[0] : es2[1]]
    rc = (3 - seq[::-1]).astype(np.uint8)
    assert np.array_equal(seq, g) or np.array_equal(rc, g)
    # counts survive: recovered middle kmers carry their emission count
    assert d2.size > d.size


def _spans():
    return [(0, 150, 6), (170, 300, 6), (100, 250, 3)]


def test_fill_gaps_respects_min_freq2():
    g = _genome(300)
    # spanning coverage only 2 < min_freq2=3: nothing recovered
    reads = _reads(g, [(0, 150, 6), (170, 300, 6), (100, 250, 2)])
    d, eb, es = _dict_and_edges(reads)
    d2, eb2, es2 = gapfill.fill_gaps(reads, d, eb, es, 0, 3)
    assert _edge_seq_set(eb2, es2) == _edge_seq_set(eb, es)
    assert d2.size == d.size


def test_fill_gaps_skips_conforming_gap():
    g = _genome(300)
    # a SNP read paths as edge-gap-edge on the SAME edge with gap length
    # == graph distance -> isConformingCapturedGap -> no insertion
    # (BuildReadQGraph.cc:585-588)
    snp = g.copy()
    snp[150] = (snp[150] + 1) % 4
    seqs = [g] * 6 + [snp] * 3
    quals = [np.full(len(x), 35, np.uint8) for x in seqs]
    reads = ReadSet.from_sequences(seqs, quals)
    d, eb, es = _dict_and_edges(reads)
    assert len(es) - 1 == 1
    d2, eb2, es2 = gapfill.fill_gaps(reads, d, eb, es, 0, 3)
    assert d2.size == d.size
    assert _edge_seq_set(eb2, es2) == _edge_seq_set(eb, es)


def test_fill_gaps_max_gap_size_gate():
    g = _genome(300)
    reads = _reads(g, _spans())
    d, eb, es = _dict_and_edges(reads)
    # the gap is ~51 kmer positions; a 10-position cap must skip it
    d2, eb2, es2 = gapfill.fill_gaps(reads, d, eb, es, 10, 3)
    assert _edge_seq_set(eb2, es2) == _edge_seq_set(eb, es)


def test_join_overlaps_bridges_small_gap():
    g = _genome(300)
    # overlap junction: missing kmer starts 129..139 (11 positions
    # <= K/2 = 16); flanking edges overlap by K - gap - 1 = 20 bases
    reads = _reads(g, [(0, 160, 6), (140, 300, 6), (100, 200, 3)])
    d, eb, es = _dict_and_edges(reads)
    assert len(es) - 1 == 2
    d2, eb2, es2 = gapfill.join_overlaps(reads, d, eb, es, K // 2, 3)
    assert len(es2) - 1 == 1
    seq = eb2[es2[0] : es2[1]]
    rc = (3 - seq[::-1]).astype(np.uint8)
    assert np.array_equal(seq, g) or np.array_equal(rc, g)


def test_join_overlaps_bridges_small_gap_rc_reads():
    # Same junction but the spanning reads arrive reverse-complemented:
    # exercises the BRQ_Joiner::map swap/canonicalization branch that the
    # forward-only test misses (BuildReadQGraph.cc:707-712).
    g = _genome(300)
    span = g[100:200]
    span_rc = (3 - span[::-1]).astype(np.uint8)
    seqs = [g[0:160]] * 6 + [g[140:300]] * 6 + [span_rc] * 3
    quals = [np.full(len(x), 35, np.uint8) for x in seqs]
    reads = ReadSet.from_sequences(seqs, quals)
    d, eb, es = _dict_and_edges(reads)
    assert len(es) - 1 == 2
    d2, eb2, es2 = gapfill.join_overlaps(reads, d, eb, es, K // 2, 3)
    assert len(es2) - 1 == 1
    seq = eb2[es2[0] : es2[1]]
    rc = (3 - seq[::-1]).astype(np.uint8)
    assert np.array_equal(seq, g) or np.array_equal(rc, g)


def test_join_overlaps_bridges_random_orientations():
    # 8 random genomes, spanning reads in fwd or rc orientation at
    # random: both canonicalization branches must produce one edge.
    for seed in range(8):
        rng = np.random.default_rng(100 + seed)
        g = rng.integers(0, 4, size=300).astype(np.uint8)
        span = g[100:200]
        if seed % 2:
            span = (3 - span[::-1]).astype(np.uint8)
        seqs = [g[0:160]] * 6 + [g[140:300]] * 6 + [span] * 3
        quals = [np.full(len(x), 35, np.uint8) for x in seqs]
        reads = ReadSet.from_sequences(seqs, quals)
        d, eb, es = _dict_and_edges(reads)
        if len(es) - 1 != 2:
            continue  # genome happened to share kmers; junction not clean
        d2, eb2, es2 = gapfill.join_overlaps(
            reads, d, eb, es, K // 2, 3
        )
        assert len(es2) - 1 == 1, f"seed {seed} failed to join"


def test_join_overlaps_gap_size_gate():
    g = _genome(300)
    # gap of ~21 positions > K/2=16 -> join not attempted
    reads = _reads(g, [(0, 150, 6), (140, 300, 6), (100, 200, 3)])
    d, eb, es = _dict_and_edges(reads)
    d2, eb2, es2 = gapfill.join_overlaps(reads, d, eb, es, K // 2, 3)
    assert _edge_seq_set(eb2, es2) == _edge_seq_set(eb, es)


def test_step2_fill_join_wiring():
    from w2rap_contigger_tpu.pipeline import step2_small_k

    g = _genome(300)
    reads = _reads(g, _spans())
    hbv, paths, _ = step2_small_k.build_read_q_graph(
        reads, min_qual=7, min_freq=4, k=K, chunk_reads=1024,
        do_fill_gaps=True, do_join_overlaps=True,
    )
    # repaired graph: one edge pair (fwd + involution rc)
    assert hbv.n_edges == 2
