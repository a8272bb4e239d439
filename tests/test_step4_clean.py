"""Step-4 Clean200x: vectorized global collection vs the per-vertex
reference-shaped oracle, plus end-to-end validity on a branchy graph.

The global `_collect_tables` (one flat-table join + 4 CSR sorts)
replaces the per-vertex Python loops (`_collect_fwd`/`_collect_rc`,
Clean200.cc:267-345) — the multiset of (read, start) pairs per branch
vertex must be identical.
"""

import numpy as np
import pytest

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.graph import build as gb, validate
from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.paths import pather
from w2rap_contigger_tpu.paths.read_paths import invert_paths
from w2rap_contigger_tpu.pipeline import step4_clean as s4


@pytest.fixture(scope="module")
def branchy():
    """Genome with a repeated block -> DBG with real branch vertices."""
    rng = np.random.default_rng(11)
    rep = rng.integers(0, 4, size=120).astype(np.uint8)
    parts = []
    for _ in range(4):
        parts.append(rng.integers(0, 4, size=400).astype(np.uint8))
        parts.append(rep)
    parts.append(rng.integers(0, 4, size=400).astype(np.uint8))
    genome = np.concatenate(parts)
    k = 48
    rlen = 100
    seqs, quals = [], []
    for _ in range(1200):
        s = int(rng.integers(0, len(genome) - rlen))
        r = genome[s : s + rlen].copy()
        m = rng.random(rlen) < 0.002
        r[m] = (r[m] + rng.integers(1, 4, size=int(m.sum()))) % 4
        if rng.random() < 0.5:
            r = dna.revcomp_codes(r)
        seqs.append(r)
        quals.append(np.full(rlen, 35, dtype=np.uint8))
    reads = ReadSet.from_sequences(seqs, quals)
    d, _ = ke.count_kmers(
        reads.bases, reads.lengths, reads.quals, k, min_freq=2,
        min_qual=7, pad_quantum=1024,
    )
    gb.recompute_adjacencies(d)
    eb, es = gb.build_unitigs(d)
    hbv, fx, rx = gb.build_hbv_from_edges(eb, es, k)
    paths = pather.path_reads(reads, d, hbv, fx, rx, chunk_reads=512)
    return reads, hbv, paths


def test_collect_tables_matches_oracle(branchy):
    reads, hbv, paths = branchy
    indeg = hbv.in_degree()
    outdeg = hbv.out_degree()
    is_branch = (indeg > 0) & (outdeg > 1)
    branch = np.flatnonzero(is_branch)
    assert len(branch) > 0, "fixture must produce branch vertices"

    fo, fe, to, te = hbv.vertex_csr()
    kmers = hbv.edge_kmers()
    inv = hbv.inv
    pi_off, pi_read = invert_paths(paths, hbv.n_edges)

    (ao, ar, av), (bo, br, bv), (co, cr, cv), (do_, dr, dv) = (
        s4._collect_tables(hbv, paths, is_branch)
    )
    for v in branch:
        v = int(v)
        pi = s4._collect_fwd(
            hbv, paths, pi_off, pi_read, te, to, fe, fo, v, kmers
        )
        rpi = s4._collect_rc(
            hbv, paths, pi_off, pi_read, te, to, fe, fo, v, kmers, inv
        )
        got_f = sorted(
            list(zip(ar[ao[v] : ao[v + 1]], av[ao[v] : ao[v + 1]]))
            + list(zip(br[bo[v] : bo[v + 1]], bv[bo[v] : bo[v + 1]]))
        )
        got_r = sorted(
            list(zip(cr[co[v] : co[v + 1]], cv[co[v] : co[v + 1]]))
            + list(zip(dr[do_[v] : do_[v + 1]], dv[do_[v] : do_[v + 1]]))
        )
        assert got_f == sorted(pi), f"fwd mismatch at v={v}"
        assert got_r == sorted(rpi), f"rc mismatch at v={v}"


def test_clean200x_valid(branchy):
    reads, hbv, paths = branchy
    hbv2, paths2 = s4.clean200x(hbv, paths, reads, min_size=0)
    validate.test_involution(hbv2)
    validate.validate_paths(hbv2, paths2)
    assert hbv2.n_edges <= hbv.n_edges
