"""FillPairs: pairs on a well-covered region fill to the true fragment;
low-frequency (error) kmers trigger trimming."""

import numpy as np

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.paths import fillpairs


def test_fill_pairs_closes_fragment(rng):
    genome = rng.integers(0, 4, size=3000).astype(np.uint8)
    rlen, insert = 80, 300
    seqs, quals = [], []
    pair_spans = []
    for s in range(0, 3000 - insert, 5):
        frag = genome[s : s + insert]
        seqs.append(frag[:rlen])
        seqs.append(dna.revcomp_codes(frag[-rlen:]))
        quals.extend([np.full(rlen, 38, np.uint8)] * 2)
        pair_spans.append((s, s + insert))
    reads = ReadSet.from_sequences(seqs, quals)
    filled, n_filled = fillpairs.fill_pairs(reads, min_freq=3)
    assert n_filled > len(pair_spans) * 0.8, f"only {n_filled} filled"
    ok = 0
    for pid, (s, e) in enumerate(pair_spans):
        f = filled[2 * pid]
        if len(f) == 0:
            continue
        if np.array_equal(f, genome[s:e]):
            ok += 1
    assert ok == n_filled, "filled sequences must equal the true fragments"


def test_trim_reads_cuts_at_error(rng):
    genome = rng.integers(0, 4, size=2000).astype(np.uint8)
    rlen = 150
    seqs = [genome[s : s + rlen] for s in range(0, 2000 - rlen, 3)]
    # one read with an error at position 100 (unique kmers -> low freq)
    bad = genome[300 : 300 + rlen].copy()
    bad[100] = (bad[100] + 1) % 4
    seqs.append(bad)
    reads = ReadSet.from_sequences(seqs)
    trim = fillpairs.trim_reads(reads, min_freq=3)
    # clean reads untouched (except genome-boundary reads whose extreme
    # kmers have < min_freq coverage); the error read is trimmed right
    # before the error base
    assert int(trim[-1]) == 100
    assert np.all(trim[2:-3] == rlen)
