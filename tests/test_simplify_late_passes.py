"""Tests for the late Simplify passes: Tamp, PullAparter, ExtendPath2
(EXT_FINAL) and ImprovePaths."""

import numpy as np

from w2rap_contigger_tpu.core.dna import revcomp_codes
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.graph import validate
from w2rap_contigger_tpu.graph.hbv import HyperBasevector
from w2rap_contigger_tpu.graph.tamp import tamp
from w2rap_contigger_tpu.paths.extend import ext_final
from w2rap_contigger_tpu.paths.improve import improve_paths
from w2rap_contigger_tpu.paths.pullaparter import PullAparter
from w2rap_contigger_tpu.paths.read_paths import ReadPathVec


def mk_hbv(k, n_vertices, edges):
    """Build an HBV from forward (left, right, seq) edges; the mirror
    copy (vertices v -> n_vertices+v, rc sequences) is added
    automatically and inv pairs edge i with i+len(edges)."""
    seqs = [np.asarray(s, dtype=np.uint8) for (_, _, s) in edges]
    lefts = [l for (l, _, _) in edges]
    rights = [r for (_, r, _) in edges]
    all_seqs = seqs + [revcomp_codes(s) for s in seqs]
    all_l = lefts + [n_vertices + r for r in rights]
    all_r = rights + [n_vertices + l for l in lefts]
    nf = len(edges)
    inv = np.concatenate([np.arange(nf) + nf, np.arange(nf)]).astype(np.int32)
    flat, start = HyperBasevector.from_edge_list(k, all_seqs)
    return HyperBasevector(
        k, flat, start,
        np.asarray(all_l, dtype=np.int32),
        np.asarray(all_r, dtype=np.int32),
        inv, 2 * n_vertices,
    )


def test_tamp_folds_matching_branch(rng):
    k = 60
    x1 = rng.integers(0, 4, size=400).astype(np.uint8)
    x2 = x1[:150].copy()
    x2[100] = (x2[100] + 1) % 4  # 1 mismatch; trailing match run = 49
    # v=0, x=1, w=2; e0: v->w (long), e1: v->x (short dead end)
    hbv = mk_hbv(k, 3, [(0, 2, x1), (0, 1, x2)])
    e1, e2 = 0, 1
    paths = ReadPathVec.from_lists(
        [[e1], [e1], [hbv.inv[e1]]], [10, 200, 5]
    )
    hbv2, paths2 = tamp(hbv, paths, 0)
    validate.test_involution(hbv2)
    validate.validate_paths(hbv2, paths2)
    # e1 split into e1a (v->x, 160b) + e1b (x->w, 299b); e2 extended to
    # 160b; plus mirrors: 6 edges
    assert hbv2.n_edges == 6
    lens = sorted(hbv2.edge_len().tolist())
    assert lens == [160, 160, 160, 160, 299, 299]
    # path rewrites: offset 10 -> [e1a]; offset 200 -> [e1b] at 99
    ls = paths2.path_len()
    assert ls[0] == 1 and ls[1] == 1
    assert paths2.start[1] == 200 - (160 - k + 1)
    # the two rewritten fw paths land on different split edges
    assert paths2.path(0)[0] != paths2.path(1)[0]


def test_tamp_shifted_branch(rng):
    k = 60
    x1 = rng.integers(0, 4, size=400).astype(np.uint8)
    # e2 matches x1 shifted by +2: x2[l] == x1[l+2] on the last 40
    x2 = x1[2:152].copy()
    hbv = mk_hbv(k, 3, [(0, 2, x1), (0, 1, x2)])
    paths = ReadPathVec.from_lists([[0]], [0])
    hbv2, paths2 = tamp(hbv, paths, 10)
    validate.test_involution(hbv2)
    assert hbv2.n_edges == 6  # locus found and edited


def test_tamp_no_locus(rng):
    k = 60
    x1 = rng.integers(0, 4, size=400).astype(np.uint8)
    x2 = np.concatenate(
        [x1[:59], rng.integers(0, 4, size=91).astype(np.uint8)]
    )
    if np.array_equal(x2[-40:], x1[110:150]):
        x2[-20] = (x2[-20] + 1) % 4
    hbv = mk_hbv(k, 3, [(0, 2, x1), (0, 1, x2)])
    paths = ReadPathVec.from_lists([[0]], [0])
    hbv2, _ = tamp(hbv, paths, 0)
    assert hbv2.n_edges == 4


def _repeat_graph(rng, k=15):
    c = rng.integers(0, 4, size=40).astype(np.uint8)
    mk = lambda n: rng.integers(0, 4, size=n).astype(np.uint8)
    l0 = np.concatenate([mk(30), c[: k - 1]])
    l1 = np.concatenate([mk(30), c[: k - 1]])
    r0 = np.concatenate([c[-(k - 1) :], mk(30)])
    r1 = np.concatenate([c[-(k - 1) :], mk(30)])
    # vertices: a0=0 a1=1 v1=2 v2=3 b0=4 b1=5
    edges = [
        (0, 2, l0),  # 0
        (1, 2, l1),  # 1
        (2, 3, c),   # 2 center
        (3, 4, r0),  # 3
        (3, 5, r1),  # 4
    ]
    return mk_hbv(k, 6, edges)


def test_pullaparter_separates_canonical_repeat(rng):
    hbv = _repeat_graph(rng)
    inv = hbv.inv
    L0, L1, C, R0, R1 = 0, 1, 2, 3, 4
    plists, starts = [], []
    # 4 pairs supporting l0-c-r0, 3 pairs supporting l1-c-r1
    for _ in range(4):
        plists += [[L0, C, R0], [int(inv[R0]), int(inv[C]), int(inv[L0])]]
        starts += [0, 0]
    for _ in range(3):
        plists += [[L1, C, R1], [int(inv[R1]), int(inv[C]), int(inv[L1])]]
        starts += [0, 0]
    paths = ReadPathVec.from_lists(plists, starts)
    pa = PullAparter(hbv, paths)
    assert pa.is_canonical_repeat_edge(C)
    n = pa.separate_all()
    assert n == 1
    hbv2, paths2 = pa.hbv, pa.paths
    validate.test_involution(hbv2)
    validate.validate_paths(hbv2, paths2)
    # each phased traversal merges into one edge (+mirrors)
    assert hbv2.n_edges == 4
    assert pa.removed_read_paths == 0
    # all 14 read paths survive on single merged edges
    assert np.all(paths2.path_len() == 1)
    # the two phases land on involution-distinct edges
    e_a = int(paths2.path(0)[0])
    e_b = int(paths2.path(8)[0])
    assert e_a != e_b and int(hbv2.inv[e_a]) != e_b


def test_pullaparter_rejects_weak_support(rng):
    hbv = _repeat_graph(rng)
    inv = hbv.inv
    L0, L1, C, R0, R1 = 0, 1, 2, 3, 4
    # only 2 pairs on one phase, 1 on the other (sum1 = 3 < min_reads=5)
    plists, starts = [], []
    for _ in range(2):
        plists += [[L0, C, R0], [int(inv[R0]), int(inv[C]), int(inv[L0])]]
        starts += [0, 0]
    plists += [[L1, C, R1], [int(inv[R1]), int(inv[C]), int(inv[L1])]]
    starts += [0, 0]
    paths = ReadPathVec.from_lists(plists, starts)
    pa = PullAparter(hbv, paths)
    assert pa.separate_all() == 0
    assert pa.hbv.n_edges >= 10  # untouched (squeeze may merge nothing)


def test_ext_final_extends_into_matching_branch(rng):
    k = 15
    e1s = rng.integers(0, 4, size=120).astype(np.uint8)
    tail = e1s[-(k - 1) :]
    mk = lambda n: rng.integers(0, 4, size=n).astype(np.uint8)
    e2a = np.concatenate([tail, mk(60)])
    e2b = np.concatenate([tail, mk(60)])
    # ensure the branches differ right after the overlap
    e2b[k - 1] = (e2a[k - 1] + 1) % 4
    hbv = mk_hbv(k, 4, [(0, 1, e1s), (1, 2, e2a), (1, 3, e2b)])
    # read covers e1 fully and 30 bases of e2a's extension
    read = np.concatenate([e1s, e2a[k - 1 : k - 1 + 30]])
    reads = ReadSet.from_sequences([read], [np.full(len(read), 35, np.uint8)])
    paths = ReadPathVec.from_lists([[0]], [0])
    paths2, n_ext = ext_final(hbv, paths, reads, min_gain=20, mode=1)
    assert n_ext == 1
    assert paths2.path(0).tolist() == [0, 1]


def test_improve_paths_places_unplaced_read(rng):
    k = 15
    es = rng.integers(0, 4, size=300).astype(np.uint8)
    hbv = mk_hbv(k, 2, [(0, 1, es)])
    read = es[50:150]
    reads = ReadSet.from_sequences([read], [np.full(100, 30, np.uint8)])
    paths = ReadPathVec.from_lists([[]], [0])
    paths2, nch = improve_paths(hbv, paths, reads)
    assert nch == 1
    assert paths2.path(0).tolist() == [0]
    assert paths2.start[0] == 50


def test_improve_paths_keeps_correct_placement(rng):
    k = 15
    es = rng.integers(0, 4, size=300).astype(np.uint8)
    hbv = mk_hbv(k, 2, [(0, 1, es)])
    read = es[50:150]
    reads = ReadSet.from_sequences([read], [np.full(100, 30, np.uint8)])
    paths = ReadPathVec.from_lists([[0]], [50])
    paths2, nch = improve_paths(hbv, paths, reads)
    assert nch == 0
    assert paths2.path(0).tolist() == [0]
    assert paths2.start[0] == 50


def test_partners_to_ends_places_unplaced_mate(rng):
    from w2rap_contigger_tpu.paths.partners import partners_to_ends

    k = 15
    es = rng.integers(0, 4, size=400).astype(np.uint8)
    hbv = mk_hbv(k, 2, [(0, 1, es)])  # single edge -> sink within 500
    # read 0 placed at the right end of edge 0; read 1 (its mate) unplaced
    # but matches edge 0 at offset 200
    r0 = es[300:380]
    r1 = es[200:280]
    reads = ReadSet.from_sequences(
        [r0, r1], [np.full(80, 35, np.uint8)] * 2
    )
    paths = ReadPathVec.from_lists([[0], []], [300, 0])
    paths2, n_placed = partners_to_ends(hbv, paths, reads)
    assert n_placed == 1
    assert paths2.path(1).tolist() == [0]
    assert paths2.start[1] == 200


def test_partners_to_ends_rejects_ambiguous(rng):
    from w2rap_contigger_tpu.paths.partners import partners_to_ends

    k = 15
    seg = rng.integers(0, 4, size=200).astype(np.uint8)
    # two disjoint edges with the same sequence -> ambiguous placement
    hbv = mk_hbv(k, 4, [(0, 1, seg), (2, 3, seg.copy())])
    r0 = seg[100:180]
    r1 = seg[20:100]
    reads = ReadSet.from_sequences(
        [r0, r1], [np.full(80, 35, np.uint8)] * 2
    )
    paths = ReadPathVec.from_lists([[0], []], [100, 0])
    paths2, n_placed = partners_to_ends(hbv, paths, reads)
    assert n_placed == 0
    assert paths2.path_len()[1] == 0
