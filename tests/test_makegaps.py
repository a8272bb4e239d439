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


def _near_events_naive(paths, inv, tom, tol, llens, max_ignore):
    """Literal per-pair reference construction of the nears multiset."""
    events = []
    for pid in range(paths.n_reads // 2):
        p1 = [int(x) for x in paths.path(2 * pid)]
        p2 = [int(x) for x in paths.path(2 * pid + 1)]
        if not p1 or not p2:
            continue
        for pass_ in (1, 2):
            x = list(p1)
            y = [int(inv[e]) for e in p2[::-1]]
            if pass_ == 2:
                x, y = y, x
                x = [int(inv[e]) for e in x[::-1]]
                y = [int(inv[e]) for e in y[::-1]]
            x = [int(tom[e]) for e in x]
            y = [int(tom[e]) for e in y]
            x = [e for j, e in enumerate(x) if j == 0 or e != x[j - 1]]
            y = [e for j, e in enumerate(y) if j == 0 or e != y[j - 1]]
            x = [e for e in x if tol[e] >= 0 and llens[tol[e]] > max_ignore]
            y = [e for e in y if tol[e] >= 0 and llens[tol[e]] > max_ignore]
            ys = set(y)
            for e1 in x:
                if e1 in ys:
                    continue
                for e2 in y:
                    if e1 != e2:
                        events.append((e1, e2))
    return sorted(events)


def test_near_events_matches_naive(rng):
    from w2rap_contigger_tpu.paths.read_paths import ReadPathVec

    E = 40
    for trial in range(20):
        # random involution: pair up edges
        perm = rng.permutation(E)
        inv = np.zeros(E, dtype=np.int64)
        for i in range(0, E, 2):
            inv[perm[i]] = perm[i + 1]
            inv[perm[i + 1]] = perm[i]
        # random tom grouping (values are edge ids; half stay identity)
        tom = np.arange(E, dtype=np.int64)
        grp = rng.random(E) < 0.5
        tom[grp] = rng.integers(0, E, size=int(grp.sum()))
        nl = 6
        tol = rng.integers(-1, nl, size=E).astype(np.int64)
        llens = rng.integers(0, 30000, size=nl).astype(np.int64)
        n_pairs = 30
        paths_l = []
        for _ in range(2 * n_pairs):
            ln = int(rng.integers(0, 5))
            paths_l.append(rng.integers(0, E, size=ln).astype(np.int64))
        starts = np.zeros(2 * n_pairs, dtype=np.int32)
        paths = ReadPathVec.from_lists(paths_l, starts)
        got1, got2 = step7_scaffold._near_events(
            paths, inv, tom, tol, llens
        )
        got = sorted(zip(got1.tolist(), got2.tolist()))
        want = _near_events_naive(
            paths, inv, tom, tol, llens,
            step7_scaffold.MAX_LINE_TO_IGNORE,
        )
        assert got == want, f"trial {trial}: {got[:5]} vs {want[:5]}"


def test_path_truncation_matches_naive(rng):
    """The vectorized crossing-path truncation in make_gaps must match a
    literal per-read loop."""
    from w2rap_contigger_tpu.paths.read_paths import ReadPathVec

    E = 30
    for trial in range(20):
        kmers = rng.integers(1, 300, size=E).astype(np.int64)
        n_acc = int(rng.integers(1, 5))
        accepted = [
            (int(rng.integers(0, E)), int(rng.integers(0, E)))
            for _ in range(n_acc)
        ]
        n_reads = 40
        paths_l = [
            rng.integers(0, E, size=int(rng.integers(0, 6))).astype(np.int64)
            for _ in range(n_reads)
        ]
        starts0 = rng.integers(-50, 500, size=n_reads).astype(np.int32)
        paths = ReadPathVec.from_lists(paths_l, starts0)

        # naive
        split_after = {a for a, _ in accepted}
        split_before = {b for _, b in accepted}
        lists = []
        nstarts = starts0.astype(np.int64).copy()
        for rid in range(n_reads):
            p = [int(x) for x in paths.path(rid)]
            if p:
                for j, e in enumerate(p):
                    if e in split_after and j + 1 < len(p):
                        p = p[: j + 1]
                        break
                last = None
                for j, e in enumerate(p):
                    if e in split_before:
                        last = j
                if last is not None and last > 0:
                    nstarts[rid] -= int(np.sum(kmers[p[:last]]))
                    p = p[last:]
            lists.append(p)
        want = ReadPathVec.from_lists(lists, nstarts.astype(np.int32))

        # vectorized (mirror of the make_gaps block)
        mask_after = np.zeros(E, dtype=bool)
        mask_after[np.fromiter((a for a, _ in accepted), dtype=np.int64)] = True
        mask_before = np.zeros(E, dtype=bool)
        mask_before[np.fromiter((b for _, b in accepted), dtype=np.int64)] = True
        off = paths.offsets
        pe = paths.edges
        plen = np.diff(off)
        read_of = np.repeat(np.arange(n_reads, dtype=np.int64), plen)
        pos = np.arange(pe.size, dtype=np.int64) - off[read_of]
        cand = mask_after[pe] & (pos + 1 < plen[read_of])
        first_after = np.full(n_reads, np.int64(1) << 62, dtype=np.int64)
        np.minimum.at(first_after, read_of[cand], pos[cand])
        new_end = np.minimum(plen, first_after + 1)
        candb = mask_before[pe] & (pos < new_end[read_of])
        last_before = np.zeros(n_reads, dtype=np.int64)
        np.maximum.at(last_before, read_of[candb], pos[candb])
        km = kmers[pe].astype(np.int64)
        cum = np.cumsum(km)
        excl = np.concatenate([np.zeros(1, dtype=np.int64), cum[:-1]])
        hi = max(pe.size - 1, 0)
        shift = (
            excl[np.minimum(off[:-1] + last_before, hi)]
            - excl[np.minimum(off[:-1], hi)]
        )
        gstarts = starts0.astype(np.int64) - shift
        new_len = np.where(plen > 0, new_end - last_before, 0)
        noff = np.zeros(n_reads + 1, dtype=np.int64)
        noff[1:] = np.cumsum(new_len)
        tot = int(noff[-1])
        src = np.repeat(off[:-1] + last_before, new_len) + (
            np.arange(tot, dtype=np.int64) - np.repeat(noff[:-1], new_len)
        )
        got = ReadPathVec(noff, pe[src].astype(np.int32),
                          gstarts.astype(np.int32))

        np.testing.assert_array_equal(got.offsets, want.offsets)
        np.testing.assert_array_equal(got.edges, want.edges)
        np.testing.assert_array_equal(got.start, want.start)
