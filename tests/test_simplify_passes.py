"""Unit tests for Simplify passes: PopBubbles, Degloop, AnalyzeBranches,
UnwindThreeEdgePlasmids helpers."""

import numpy as np

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.graph import build as gb, bubbles, degloop, validate
from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.paths import pather


def build_with_reads(seqs, quals, k):
    reads = ReadSet.from_sequences(seqs, quals)
    d, _ = ke.count_kmers(
        reads.bases, reads.lengths, reads.quals, k, min_freq=1,
        min_qual=2, pad_quantum=1024,
    )
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=512)
    return reads, hbv, paths


def test_pop_bubbles_removes_error_branch(rng):
    k = 15
    genome = rng.integers(0, 4, size=1500).astype(np.uint8)
    variant = genome.copy()
    variant[750] = (variant[750] + 1) % 4  # SNP bubble

    seqs, quals = [], []
    rlen = 80
    # 40x true haplotype at high qual
    for s in range(0, 1500 - rlen, 2):
        seqs.append(genome[s : s + rlen])
        quals.append(np.full(rlen, 38, dtype=np.uint8))
    # 2 error-branch reads at LOW quality around the SNP
    for s in (720, 740):
        seqs.append(variant[s : s + rlen])
        quals.append(np.full(rlen, 3, dtype=np.uint8))

    reads, hbv, paths = build_with_reads(seqs, quals, k)
    found = bubbles.find_bubbles(hbv)
    if not found:
        return  # error kmers didn't form a clean bubble; nothing to test
    E0 = hbv.n_edges
    hbv2, paths2 = bubbles.pop_bubbles(hbv, paths, reads)
    validate.test_involution(hbv2)
    assert hbv2.n_edges < E0, "bubble not popped"


def test_degloop_no_crash_and_valid(rng):
    k = 15
    genome = rng.integers(0, 4, size=2000).astype(np.uint8)
    seqs, quals = [], []
    for s in range(0, 2000 - 80, 2):
        r = genome[s : s + 80].copy()
        m = rng.random(80) < 0.01
        r[m] = (r[m] + 1) % 4
        seqs.append(r)
        quals.append(
            np.where(m, 3, 38).astype(np.uint8)
        )  # errors are low-qual
    reads, hbv, paths = build_with_reads(seqs, quals, k)
    hbv2, paths2 = degloop.degloop(hbv, paths, reads)
    validate.test_involution(hbv2)
    validate.validate_paths(hbv2, paths2)


def test_binomial_sum():
    # P(X <= k) sanity
    assert abs(bubbles.binomial_sum(10, 10, 0.25) - 1.0) < 1e-9
    assert bubbles.binomial_sum(10, -1, 0.25) == 0.0
    p = bubbles.binomial_sum(20, 2, 0.25)
    assert 0.0 < p < 0.1
