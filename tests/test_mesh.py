"""Multi-chip sharded kmer counting on the virtual 8-device CPU mesh."""

import numpy as np

from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.parallel import mesh as pmesh


def test_sharded_count_matches_single_device(rng):
    import jax

    assert len(jax.devices()) >= 8
    mesh = pmesh.make_mesh(8)
    k = 31
    n, L = 64, 80
    bases = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    lengths = np.full(n, L, dtype=np.int32)
    quals = np.full((n, L), 35, dtype=np.uint8)

    d_sh, hist = pmesh.count_kmers_sharded(
        bases, lengths, quals, k, mesh, min_freq=1, chunk_reads=8
    )
    d, hist_ref = ke.count_kmers(
        bases, lengths, quals, k, min_freq=1, pad_quantum=1024
    )
    assert d_sh.size == d.size
    np.testing.assert_array_equal(np.asarray(hist)[1:101], hist_ref[1:101])


def test_sharded_pathing_and_flat_count(rng):
    """Sharded read pathing + sharded flat K2 counting are bit-identical
    to single-chip (the production multi-chip steps 2->3)."""
    import jax

    from w2rap_contigger_tpu.core.reads import ReadSet
    from w2rap_contigger_tpu.pipeline import step2_small_k, step3_repath

    assert len(jax.devices()) >= 8
    mesh = pmesh.make_mesh(8)
    genome = rng.integers(0, 4, size=2000).astype(np.uint8)
    n, L = 256, 150
    starts = rng.integers(0, len(genome) - L, size=n)
    seqs = [genome[s : s + L] for s in starts]
    quals = [np.full(L, 35, np.uint8) for _ in seqs]
    reads = ReadSet.from_sequences(seqs, quals)

    hbv_sh, paths_sh, _ = step2_small_k.build_read_q_graph(
        reads, chunk_reads=64, mesh=mesh, min_freq=2
    )
    hbv_1, paths_1, _ = step2_small_k.build_read_q_graph(
        reads, chunk_reads=512, min_freq=2
    )
    np.testing.assert_array_equal(hbv_sh.edge_bases, hbv_1.edge_bases)
    np.testing.assert_array_equal(paths_sh.offsets, paths_1.offsets)
    np.testing.assert_array_equal(paths_sh.edges, paths_1.edges)
    np.testing.assert_array_equal(paths_sh.start, paths_1.start)

    # K2=128 keeps the multiword (W=8) path while halving CPU-mesh
    # compile time; the graft-entry dryrun covers K2=200
    hbv2_sh, paths2_sh, _ = step3_repath.repath(
        hbv_sh, paths_sh, 128, mesh=mesh
    )
    hbv2_1, paths2_1, _ = step3_repath.repath(hbv_1, paths_1, 128)
    np.testing.assert_array_equal(hbv2_sh.edge_bases, hbv2_1.edge_bases)
    np.testing.assert_array_equal(hbv2_sh.inv, hbv2_1.inv)
    np.testing.assert_array_equal(paths2_sh.edges, paths2_1.edges)


def test_graft_entry_single_and_multi():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args).compile()
    res = out(*args)
    assert int(res[2]) > 0
    ge.dryrun_multichip(8)


def test_count_kmers_sharded_production(rng):
    """Production sharded counter: bit-identical dict (words, counts,
    contexts, hist) vs the single-chip path, at k=60 production width,
    multiple chunks, and duplicated reads for counts > 1."""
    import jax

    assert len(jax.devices()) >= 8
    mesh = pmesh.make_mesh(8)
    k = 60
    n, L = 96, 120
    bases = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    lengths = rng.integers(70, L + 1, size=n).astype(np.int32)
    quals = rng.integers(0, 41, size=(n, L)).astype(np.uint8)
    bases = np.concatenate([bases, bases[:40]], axis=0)
    lengths = np.concatenate([lengths, lengths[:40]])
    quals = np.concatenate([quals, quals[:40]], axis=0)

    d_sh, hist_sh = pmesh.count_kmers_sharded(
        bases, lengths, quals, k, mesh, min_freq=2, chunk_reads=8
    )
    d_ref, hist_ref = ke.count_kmers(
        bases, lengths, quals, k, min_freq=2, chunk_reads=32
    )
    np.testing.assert_array_equal(d_sh.words, d_ref.words)
    np.testing.assert_array_equal(d_sh.counts, d_ref.counts)
    np.testing.assert_array_equal(d_sh.ctx, d_ref.ctx)
    np.testing.assert_array_equal(hist_sh, hist_ref)


def test_count_kmers_sharded_overflow_retry(rng):
    """Skewed input (one repeated kmer everywhere) must overflow a tiny
    bucket capacity and retry, not drop kmers."""
    import jax

    assert len(jax.devices()) >= 8
    mesh = pmesh.make_mesh(8)
    k = 31
    n, L = 32, 64
    one = rng.integers(0, 4, size=L).astype(np.uint8)
    bases = np.tile(one, (n, 1))  # all kmers identical across reads
    lengths = np.full(n, L, dtype=np.int32)
    quals = np.full((n, L), 35, dtype=np.uint8)
    d_sh, _ = pmesh.count_kmers_sharded(
        bases, lengths, quals, k, mesh, min_freq=1, chunk_reads=4,
        cap_factor=0.05,
    )
    d_ref, _ = ke.count_kmers(bases, lengths, quals, k, min_freq=1)
    np.testing.assert_array_equal(d_sh.words, d_ref.words)
    np.testing.assert_array_equal(d_sh.counts, d_ref.counts)


def test_sharded_step2_graph_identical(rng):
    """Sharded dict -> unitigs -> HBV is bit-identical to single-chip."""
    import jax

    from w2rap_contigger_tpu.graph import build as gb

    assert len(jax.devices()) >= 8
    mesh = pmesh.make_mesh(8)
    k = 31
    genome = rng.integers(0, 4, size=3000).astype(np.uint8)
    n, L = 150, 100
    starts = rng.integers(0, len(genome) - L, size=n)
    bases = genome[starts[:, None] + np.arange(L)[None, :]].astype(np.uint8)
    lengths = np.full(n, L, dtype=np.int32)
    quals = np.full((n, L), 35, dtype=np.uint8)

    def build(d):
        gb.recompute_adjacencies(d)
        eb, es = gb.build_unitigs(d)
        return gb.build_hbv_from_edges(eb, es, k)

    d_sh, _ = pmesh.count_kmers_sharded(
        bases, lengths, quals, k, mesh, min_freq=2, chunk_reads=32
    )
    d_ref, _ = ke.count_kmers(bases, lengths, quals, k, min_freq=2)
    hbv_sh, _, _ = build(d_sh)
    hbv_ref, _, _ = build(d_ref)
    np.testing.assert_array_equal(hbv_sh.edge_bases, hbv_ref.edge_bases)
    np.testing.assert_array_equal(hbv_sh.edge_start, hbv_ref.edge_start)
    np.testing.assert_array_equal(hbv_sh.to_left, hbv_ref.to_left)
    np.testing.assert_array_equal(hbv_sh.to_right, hbv_ref.to_right)
    np.testing.assert_array_equal(hbv_sh.inv, hbv_ref.inv)


def test_list_rank_sharded_matches_dev(rng):
    """Row-sharded pointer doubling == single-chip pointer doubling on
    random chain/cycle link structures."""
    import jax
    import jax.numpy as jnp

    from w2rap_contigger_tpu.graph import build as gb

    assert len(jax.devices()) >= 8
    mesh = pmesh.make_mesh(8)
    M = 64  # 2M = 128 nodes, divisible by 2*D
    # random successor links with the orientation symmetry the builder
    # produces: nxt[rc(a)] unconstrained here — equality of the two
    # implementations only needs a shared arbitrary nxt array
    nxt = rng.integers(-1, 2 * M, size=2 * M).astype(np.int32)
    n_iters = 9
    h1, r1, c1 = gb._list_rank_dev(jnp.asarray(nxt), n_iters)
    h2, r2, c2 = pmesh.list_rank_sharded(mesh, jnp.asarray(nxt), n_iters)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
