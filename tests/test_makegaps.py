"""MakeGaps test: two long contigs joined only by read pairs spanning an
uncovered gap should get a 0-length gap edge between their line ends."""

import numpy as np

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.graph import build as gb, lines as lines_mod, validate
from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.paths import pather
from w2rap_contigger_tpu.pipeline import step7_scaffold


def test_make_gaps_links_two_contigs(rng):
    k = 21
    # two 8kb contigs separated by a 150bp uncovered region
    A = rng.integers(0, 4, size=8000).astype(np.uint8)
    gap = rng.integers(0, 4, size=150).astype(np.uint8)
    B = rng.integers(0, 4, size=8000).astype(np.uint8)
    genome = np.concatenate([A, gap, B])
    rlen, insert = 100, 400

    seqs, quals = [], []
    for s in range(0, len(genome) - insert, 7):
        frag = genome[s : s + insert]
        r1 = frag[:rlen]
        r2 = dna.revcomp_codes(frag[-rlen:])
        # no read COVERS the gap region, but pairs span it
        g0, g1 = 8000, 8150
        def covers(gs):  # read interval [gs, gs+rlen)
            return not (gs + rlen <= g0 or gs >= g1)
        if covers(s):
            r1 = None
        if covers(s + insert - rlen):
            r2 = None
        if r1 is None or r2 is None:
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
    lines = lines_mod.find_lines(hbv)

    E0 = hbv.n_edges
    hbv2, paths2, n_gaps = step7_scaffold.make_gaps(
        hbv, paths, lines, min_line=5000, min_link_count=3
    )
    assert n_gaps >= 2, f"expected a gap pair, got {n_gaps}"  # fwd + rc
    # a 0-length edge now exists
    assert int((hbv2.edge_len() == 0).sum()) >= 2
    validate.test_involution(hbv2)
    validate.validate_paths(hbv2, paths2)
    # and the lines machinery turns it into an N-gap in the fasta
    lines2 = lines_mod.find_lines(hbv2)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        lines_mod.dump_line_files(hbv2, lines2, td, "a", paths=paths2)
        with open(os.path.join(td, "a.lines.fasta")) as f:
            txt = f.read()
    assert "N" * 50 in txt, "gap cell not rendered as Ns"
