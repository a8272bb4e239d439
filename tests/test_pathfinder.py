"""PathFinder tests: loop unrolling on a constructed repeat motif and
vote machinery sanity."""

import numpy as np

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.graph import build as gb, validate
from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.paths import pather
from w2rap_contigger_tpu.paths.pathfinder import PathFinder


def loop_genome(rng, k):
    """prev--repeat--loop--repeat--next: A R L R B with unique A,L,B and
    duplicated R (longer than k)."""
    A = rng.integers(0, 4, size=1200).astype(np.uint8)
    R = rng.integers(0, 4, size=3 * k).astype(np.uint8)
    L = rng.integers(0, 4, size=300).astype(np.uint8)
    B = rng.integers(0, 4, size=1200).astype(np.uint8)
    return np.concatenate([A, R, L, R, B])


def build_graph(rng, genome, k, rlen=100, stride=2):
    seqs = []
    for s in range(0, len(genome) - rlen + 1, stride):
        r = genome[s : s + rlen]
        seqs.append(r)
        seqs.append(dna.revcomp_codes(r))
    reads = ReadSet.from_sequences(seqs)
    d, _ = ke.count_kmers(
        reads.bases, reads.lengths, reads.quals, k, min_freq=1, pad_quantum=1024
    )
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=512)
    return hbv, paths


def test_loop_motif_unrolls(rng):
    k = 21
    genome = loop_genome(rng, k)
    hbv, paths = build_graph(rng, genome, k)
    validate.test_involution(hbv)
    pf = PathFinder(hbv, paths)
    E0 = hbv.n_edges
    n_unrolled = pf.unroll_loops(min_side=800)
    # the constructed motif has exactly one unrollable loop pair
    assert n_unrolled >= 1, "loop not detected"
    assert pf.hbv.n_edges > E0  # interior duplicated
    validate.validate_paths(pf.hbv, pf.paths)


def test_votes_prefer_true_path(rng):
    k = 21
    genome = loop_genome(rng, k)
    hbv, paths = build_graph(rng, genome, k)
    pf = PathFinder(hbv, paths)
    # find the repeat edge (appears twice in genome): highest coverage
    covs = [pf.paths_per_kbp(e) for e in range(hbv.n_edges)]
    rep = int(np.argmax(covs))
    if len(pf.prev_edges[rep]) == 2 and len(pf.next_edges[rep]) == 2:
        lp = [e for e in pf.next_edges[rep] if e in pf.prev_edges[rep]]
        if lp:
            loop_e = lp[0]
            prev_e = [e for e in pf.prev_edges[rep] if e != loop_e][0]
            next_e = [e for e in pf.next_edges[rep] if e != loop_e][0]
            pv = pf.path_votes([prev_e, rep, loop_e, rep, next_e])
            assert pv[0] + pv[1] > 0  # true traversal has support


def test_classify_forks(rng):
    k = 21
    genome = loop_genome(rng, k)
    hbv, paths = build_graph(rng, genome, k)
    stats = PathFinder(hbv, paths).classify_forks()
    counts = [v for k_, v in stats.items() if not k_.endswith("_size")]
    assert sum(counts) == hbv.n_edges
    total_size = sum(v for k_, v in stats.items() if k_.endswith("_size"))
    assert total_size == int(np.sum(hbv.edge_len()))
