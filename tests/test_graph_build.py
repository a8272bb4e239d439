"""Graph construction parity: build_unitigs vs a literal python
re-implementation of the reference EdgeBuilder walk
(BuildReadQGraph.cc:99-337), plus HBV structural checks."""

import numpy as np
import pytest

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.graph import build as gb
from w2rap_contigger_tpu.ops import bitkmer as bk
from w2rap_contigger_tpu.ops import kmer_engine as ke


# ---------------------------------------------------------------------------
# literal reference walk
# ---------------------------------------------------------------------------


def ref_edges_from_dict(table, k):
    """table: canonical-kmer-bytes -> ctx (adjacency-pruned).  Returns the
    set of canonical edge sequences the reference EdgeBuilder emits."""

    def rc(s):
        return (3 - np.frombuffer(s, np.uint8))[::-1].tobytes()

    def canon(s):
        r = rc(s)
        return r if r < s else s

    def is_pal(s):
        return s == rc(s)

    def ctx_of(s):
        """context of kmer s in its orientation (pred_bits, succ_bits)."""
        c = canon(s)
        v = table[c]
        if c != s:
            # rc the context
            p, q = (v >> 4) & 0xF, v & 0xF

            def rcb(b):
                return (
                    ((b & 1) << 3)
                    | ((b & 2) << 1)
                    | ((b & 4) >> 1)
                    | ((b & 8) >> 3)
                )

            return rcb(q), rcb(p)
        return (v >> 4) & 0xF, v & 0xF

    def popc(b):
        return bin(b).count("1")

    def single(b):
        return {1: 0, 2: 1, 4: 2, 8: 3}[b]

    def succ_kmer(s, c):
        return s[1:] + bytes([c])

    def pred_kmer(s, c):
        return bytes([c]) + s[:-1]

    def up_possible(s):
        p, q = ctx_of(s)
        if popc(p) != 1:
            return False
        pk = pred_kmer(s, single(p))
        # hairpin guard (matches graph.build: the real reference would
        # FatalErr on such chains, BuildReadQGraph.cc:296-303)
        if pk == rc(s):
            return False
        if is_pal(pk) or canon(pk) not in table:
            return False
        pp, pq = ctx_of(pk)
        return popc(pq) == 1

    def down_possible(s):
        p, q = ctx_of(s)
        if popc(q) != 1:
            return False
        sk = succ_kmer(s, single(q))
        if sk == rc(s):
            return False
        if is_pal(sk) or canon(sk) not in table:
            return False
        sp, sq = ctx_of(sk)
        return popc(sp) == 1

    edges = set()
    claimed = set()

    def extend(start):
        seq = bytearray(start)
        cur = bytes(start)
        used = [canon(cur)]
        while True:
            p, q = ctx_of(cur)
            if popc(q) != 1:
                break
            nxt = succ_kmer(cur, single(q))
            if nxt == rc(cur):
                break  # hairpin guard, see graph.build._build_links_dev
            if is_pal(nxt) or canon(nxt) not in table:
                break
            np_, nq = ctx_of(nxt)
            if popc(np_) != 1:
                break
            seq.append(single(q))
            cur = nxt
            used.append(canon(cur))
        s = bytes(seq)
        r = rc(s)
        if r < s:
            return None  # REV — the mirror walk emits it
        edges.add(s)
        for u in used:
            claimed.add(u)
        return s

    for key in sorted(table):
        if key in claimed:
            continue
        s = key
        if is_pal(s):
            edges.add(s)
            claimed.add(s)
        elif up_possible(s):
            if down_possible(s):
                continue  # interior
            extend(rc(s))
        elif down_possible(s):
            extend(s)
        else:
            edges.add(canon(s))
            claimed.add(s)

    # circles: remaining kmers
    remaining = [key for key in sorted(table) if key not in claimed]
    for key in remaining:
        if key in claimed:
            continue
        chain = [key]
        claimed.add(key)
        cur = key
        while True:
            p, q = ctx_of(cur)
            assert popc(q) == 1
            nxt = succ_kmer(cur, single(q))
            if canon(nxt) == key:
                break
            chain.append(nxt)
            claimed.add(canon(nxt))
            cur = nxt
        # min-kmer rotation + orientation
        mp = int(np.argmin([c for c in chain]))
        chain = chain[mp:] + chain[:mp]
        seq = chain[0] + bytes(ctx_of(c)[1].bit_length() - 1 for c in chain[:-1])
        seq = bytearray(chain[0])
        for c in chain[1:]:
            seq.append(c[-1])
        s = bytes(seq)
        r = rc(s)
        if r < s:
            chain2 = [rc(c) for c in reversed(chain)]
            mp = int(np.argmin(chain2))
            chain2 = chain2[mp:] + chain2[:mp]
            seq = bytearray(chain2[0])
            for c in chain2[1:]:
                seq.append(c[-1])
            s = bytes(seq)
        edges.add(s)
    return edges


def dict_from_reads(reads, k):
    """Simple canonical count+context dict (no qual gating, min_freq=1)."""
    table = {}
    for codes in reads:
        for p in range(len(codes) - k + 1):
            kmer = codes[p : p + k]
            ctx = 0
            if p > 0:
                ctx |= (1 << int(codes[p - 1])) << 4
            if p + k < len(codes):
                ctx |= 1 << int(codes[p + k])
            canon, was_rc = dna.canonical_codes(kmer)
            if was_rc:
                pb, sb = (ctx >> 4) & 0xF, ctx & 0xF

                def rcb(b):
                    return (
                        ((b & 1) << 3)
                        | ((b & 2) << 1)
                        | ((b & 4) >> 1)
                        | ((b & 8) >> 3)
                    )

                ctx = (rcb(sb) << 4) | rcb(pb)
            key = canon.tobytes()
            table[key] = table.get(key, 0) | ctx
    return table


def prune_table(table, k):
    """recomputeAdjacencies on the python dict."""

    def rc(s):
        return (3 - np.frombuffer(s, np.uint8))[::-1].tobytes()

    def canon(s):
        r = rc(s)
        return r if r < s else s

    out = {}
    for key, ctx in table.items():
        p, q = (ctx >> 4) & 0xF, ctx & 0xF
        np_, nq = 0, 0
        for c in range(4):
            if q & (1 << c) and canon(key[1:] + bytes([c])) in table:
                nq |= 1 << c
            if p & (1 << c) and canon(bytes([c]) + key[:-1]) in table:
                np_ |= 1 << c
        out[key] = (np_ << 4) | nq
    return out


def count_with_engine(reads, k):
    L = max(len(r) for r in reads)
    n = len(reads)
    bases = np.zeros((n, L), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    quals = np.full((n, L), 35, dtype=np.uint8)
    for i, r in enumerate(reads):
        bases[i, : len(r)] = r
        lengths[i] = len(r)
    d, _ = ke.count_kmers(
        bases, lengths, quals, k, min_qual=7, min_freq=1, pad_quantum=1024
    )
    return d


def genome_reads(rng, glen, rlen, k, circular=False):
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    if circular:
        g2 = np.concatenate([g, g[: rlen - 1]])
    else:
        g2 = g
    reads = []
    for s in range(0, len(g2) - rlen + 1):
        r = g2[s : s + rlen]
        if rng.random() < 0.5:
            r = dna.revcomp_codes(r)
        reads.append(r)
    return g, reads


@pytest.mark.parametrize("k,glen", [(9, 400), (15, 1200), (31, 3000)])
def test_unitigs_match_reference_walk(rng, k, glen):
    g, reads = genome_reads(rng, glen, 3 * k, k)
    d = count_with_engine(reads, k)
    gb.recompute_adjacencies(d)

    # python-side reference walk on the same pruned dict
    table = {}
    for i in range(d.size):
        table[bk.unpack_words(d.words[i], k).tobytes()] = int(d.ctx[i])
    expect = ref_edges_from_dict(table, k)

    edge_bases, edge_start = gb.build_unitigs(d)
    got = set()
    for i in range(len(edge_start) - 1):
        got.add(edge_bases[edge_start[i] : edge_start[i + 1]].tobytes())
    assert got == expect, (
        f"{len(got)} edges vs {len(expect)} expected; "
        f"only_got={len(got - expect)} only_exp={len(expect - got)}"
    )


def test_unitigs_circular_genome(rng):
    k = 15
    g, reads = genome_reads(rng, 500, 3 * k, k, circular=True)
    d = count_with_engine(reads, k)
    gb.recompute_adjacencies(d)
    edge_bases, edge_start = gb.build_unitigs(d)
    # a clean circular genome with unique kmers -> one circular edge
    # covering all kmers (glen kmers, length glen + k - 1)
    n_edges = len(edge_start) - 1
    total_kmers = int(np.sum(np.diff(edge_start) - k + 1))
    assert total_kmers == d.size


def test_kdef_assignment_consistent(rng):
    k = 15
    g, reads = genome_reads(rng, 1500, 3 * k, k)
    d = count_with_engine(reads, k)
    gb.recompute_adjacencies(d)
    edge_bases, edge_start = gb.build_unitigs(d)
    # every kmer's recorded (edge, offset, rc) must reproduce its sequence
    for i in range(0, d.size, 7):
        e, off, rc = int(d.edge_id[i]), int(d.edge_offset[i]), bool(d.edge_rc[i])
        seq = edge_bases[edge_start[e] : edge_start[e + 1]]
        kmer_in_edge = seq[off : off + k]
        canon = bk.unpack_words(d.words[i], k)
        if rc:
            np.testing.assert_array_equal(
                kmer_in_edge, dna.revcomp_codes(canon)
            )
        else:
            np.testing.assert_array_equal(kmer_in_edge, canon)


def test_hbv_structure(rng):
    k = 15
    g, reads = genome_reads(rng, 2000, 3 * k, k)
    d = count_with_engine(reads, k)
    gb.recompute_adjacencies(d)
    edge_bases, edge_start = gb.build_unitigs(d)
    hbv, fwd_xlat, rev_xlat = gb.build_hbv_from_edges(edge_bases, edge_start, k)
    E0 = len(edge_start) - 1
    assert hbv.n_edges >= E0
    hbv.check_involution()
    # xlats map to edges with the right sequences
    for i in range(E0):
        seq = edge_bases[edge_start[i] : edge_start[i + 1]]
        np.testing.assert_array_equal(hbv.edge_seq(int(fwd_xlat[i])), seq)
        np.testing.assert_array_equal(
            hbv.edge_seq(int(rev_xlat[i])), dna.revcomp_codes(seq)
        )
    # K-1 overlap property: consecutive edges at a vertex agree
    from_off, from_e, to_off, to_e = hbv.vertex_csr()
    for v in range(hbv.n_vertices):
        ins = to_e[to_off[v] : to_off[v + 1]]
        outs = from_e[from_off[v] : from_off[v + 1]]
        for ei in ins[:2]:
            for eo in outs[:2]:
                np.testing.assert_array_equal(
                    hbv.edge_seq(int(ei))[-(k - 1) :],
                    hbv.edge_seq(int(eo))[: k - 1],
                )


def test_native_graph_kernel_matches_xla(rng, monkeypatch):
    """The C++ adjacency/link kernel must reproduce the device path's
    pruned contexts and unitig edge set bit-exactly."""
    from w2rap_contigger_tpu.core import dna
    from w2rap_contigger_tpu.core.reads import ReadSet
    from w2rap_contigger_tpu.ops import kmer_engine as ke

    k = 60
    genome = rng.integers(0, 4, size=6000).astype(np.uint8)
    seqs = []
    for s in range(0, len(genome) - 150, 9):
        r = genome[s : s + 150]
        seqs.append(dna.revcomp_codes(r) if rng.random() < 0.5 else r)
    reads = ReadSet.from_sequences(seqs)

    results = []
    for env in ("0", "1"):
        monkeypatch.setenv("W2RAP_NATIVE_GRAPH", env)
        d, _ = ke.count_kmers(
            reads.bases, reads.lengths, reads.quals, k, min_freq=1,
            pad_quantum=1024,
        )
        gb.recompute_adjacencies(d)
        ctx = d.ctx.astype(np.uint32).copy()
        eb, es = gb.build_unitigs(d)
        results.append((ctx, eb, es, d.edge_id.copy(),
                        d.edge_offset.copy(), d.edge_rc.copy()))
    a, b = results
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert gb._native_graph_lib(force=True) is not None


def test_list_rank_native_matches_host(rng):
    """C++ chain-walk list ranking == numpy pointer doubling on random
    chain/cycle structures (linear-chain head/rank + on_cycle mask)."""
    from w2rap_contigger_tpu.graph import build as gb

    lib = gb._native_graph_lib(force=True)
    if lib is None:
        import pytest

        pytest.skip("no native toolchain")
    M = 300
    # random single-successor links with orientation symmetry:
    # nxt[n] chosen so prev is single-valued on most nodes
    perm = rng.permutation(2 * M).astype(np.int32)
    nxt = np.full(2 * M, -1, dtype=np.int32)
    # chain the permutation in segments, leaving some -1 breaks and a few
    # closed loops
    i = 0
    while i < 2 * M - 1:
        seg = int(rng.integers(2, 12))
        j = min(i + seg, 2 * M - 1)
        for t in range(i, j):
            nxt[perm[t]] = perm[t + 1]
        if rng.random() < 0.3:
            nxt[perm[j]] = perm[i]  # close a loop
        i = j + 1
    n_iters = max(1, int(np.ceil(np.log2(2 * M + 1))) + 1)
    h1, r1, c1 = gb._list_rank_host(nxt, n_iters)
    h2, r2, c2 = gb._list_rank_native(lib, nxt)
    np.testing.assert_array_equal(c1, c2)
    lin = ~c1
    np.testing.assert_array_equal(h1[lin], h2[lin])
    np.testing.assert_array_equal(r1[lin], r2[lin])
