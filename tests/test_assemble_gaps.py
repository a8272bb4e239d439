"""AssembleGaps2: a coverage dip that breaks the global graph (kmers
below min_freq) must be patched by local reassembly, reconnecting the
two contigs."""

import numpy as np

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.graph import build as gb, validate
from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.paths import extend, pather
from w2rap_contigger_tpu.pipeline import step5_gaps


def test_assemble_gaps_reconnects_dip(rng):
    k = 60
    genome = rng.integers(0, 4, size=6000).astype(np.uint8)
    rlen, insert = 150, 400
    g0, g1 = 3000, 3150  # dip region: coverage 2 instead of ~30

    seqs, quals = [], []
    dip_count = 0
    for s in range(0, 6000 - insert, 5):
        frag = genome[s : s + insert]
        r1 = frag[:rlen]
        r2 = dna.revcomp_codes(frag[-rlen:])
        s2 = s + insert - rlen
        touches_dip = not (s + rlen <= g0 or s >= g1) or not (
            s2 + rlen <= g0 or s2 >= g1
        )
        if touches_dip:
            dip_count += 1
            if dip_count % 12 != 0:
                continue  # drop the whole pair: dip coverage ~2-3x
        seqs.extend([r1, r2])
        quals.extend([np.full(rlen, 38, np.uint8)] * 2)

    reads = ReadSet.from_sequences(seqs, quals)
    # global graph at min_freq=4: dip kmers (cov ~2) get filtered
    d, _ = ke.count_kmers(
        reads.bases, reads.lengths, reads.quals, k, min_freq=4,
        pad_quantum=1024,
    )
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=1024)
    paths = extend.extend_paths(reads, paths, hbv)

    lens = hbv.edge_len()
    n_long_before = int((lens > 2000).sum())
    assert n_long_before >= 4, "dip should break the graph into >=2 contigs"

    new_stuff = step5_gaps.assemble_gaps2(hbv, paths, reads)
    assert new_stuff, "no patches produced for the dip"
    # the blob worker pool (AssembleGaps.cc:316-320 analogue) must be
    # bit-deterministic: pooled == sequential, in order
    new_stuff_mt = step5_gaps.assemble_gaps2(hbv, paths, reads, threads=4)
    assert len(new_stuff_mt) == len(new_stuff)
    for a, b in zip(new_stuff, new_stuff_mt):
        np.testing.assert_array_equal(a, b)
    hbv2, paths2 = step5_gaps.add_new_stuff(
        hbv, paths, reads, new_stuff, chunk_reads=1024
    )
    validate.test_involution(hbv2)
    validate.validate_paths(hbv2, paths2)
    # the two contigs must now be joined: a single edge pair spanning most
    # of the genome
    max_len = int(hbv2.edge_len().max())
    assert max_len > 5000, f"gap not patched (longest edge {max_len})"
