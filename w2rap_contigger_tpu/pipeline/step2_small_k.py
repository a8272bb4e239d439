"""Step 2 — build the small-k (k=60) de Bruijn graph + read paths.

Reference: buildReadQGraph (src/paths/long/BuildReadQGraph.cc:1253),
called from the driver at src/modules/w2rap-contigger.cc:335-350 with
minQual=7, minFreq=4, K=60.
"""

from __future__ import annotations

import numpy as np

from .. import SMALL_K
from ..graph import build as gb
from ..ops import kmer_engine as ke
from ..paths import extend, pather


def build_read_q_graph(
    reads,
    min_qual: int = 7,
    min_freq: int = 4,
    k: int = SMALL_K,
    workdir: str | None = None,
    chunk_reads: int = 65536,
    disk_batches: int = 0,
    tmp_dir: str | None = None,
    max_mem_gb: int = 10000,
    do_fill_gaps: bool = False,
    do_join_overlaps: bool = False,
    min_freq2_fract: float = 0.75,
    max_gap_size: int = 0,
    mesh=None,
):
    """Returns (hbv, paths, dict) — graph, read paths, kmer dictionary.

    disk_batches > 1 splits the canonical kmer space into hash ranges
    counted in separate passes with per-range spill (the reference's -d
    createDictOMPDiskBased, BuildReadQGraph.cc:1120-1250); max_mem_gb is
    the SetMaxMemory analogue (System.cc:1027): when the estimated
    counting working set exceeds it, batching kicks in automatically.

    do_fill_gaps / do_join_overlaps run the optional graph repair passes
    (FILL_JOIN, off by default like the reference's hardcoded False at
    w2rap-contigger.cc:336-338) with min_freq2 = max(2,
    int(min_freq2_fract * min_freq + .5)) (BuildReadQGraph.cc:1286).

    mesh: optional jax.sharding.Mesh — when given (driver auto-detects
    multiple devices, --shard flag), counting runs multi-chip via an
    all-to-all by kmer-hash range (parallel.mesh.count_kmers_sharded)
    and read pathing runs data-parallel over chips; results are
    bit-identical to single-chip.
    """
    from ..utils.sysinfo import timelog

    if mesh is not None:
        from ..parallel import mesh as pmesh

        with timelog("step2.count"):
            d, hist = pmesh.count_kmers_sharded(
                reads.bases,
                reads.lengths,
                reads.quals,
                k,
                mesh,
                min_qual=min_qual,
                min_freq=min_freq,
                chunk_reads=chunk_reads,
            )
    else:
        with timelog("step2.count"):
            d, hist = ke.count_kmers_batched(
                reads.bases,
                reads.lengths,
                reads.quals,
                k,
                min_qual=min_qual,
                min_freq=min_freq,
                chunk_reads=chunk_reads,
                disk_batches=disk_batches,
                tmp_dir=tmp_dir,
                max_mem_gb=max_mem_gb,
            )
    if workdir:
        with open(f"{workdir}/small_K.freqs", "w") as f:
            for i in range(1, 101):
                f.write(f"{i}, {hist[i]}\n")

    with timelog("step2.adjacencies"):
        gb.recompute_adjacencies(d, mesh=mesh)
    with timelog("step2.unitigs"):
        edge_bases, edge_start = gb.build_unitigs(d, mesh=mesh)
    if do_fill_gaps or do_join_overlaps:
        from ..graph import gapfill

        min_freq2 = max(2, int(min_freq2_fract * min_freq + 0.5))
        if do_fill_gaps:
            d, edge_bases, edge_start = gapfill.fill_gaps(
                reads, d, edge_bases, edge_start,
                max_gap_size, min_freq2, chunk_reads,
            )
        if do_join_overlaps:
            d, edge_bases, edge_start = gapfill.join_overlaps(
                reads, d, edge_bases, edge_start,
                k // 2, min_freq2, chunk_reads,
            )
    with timelog("step2.hbv"):
        hbv, fwd_xlat, rev_xlat = gb.build_hbv_from_edges(
            edge_bases, edge_start, k
        )

    with timelog("step2.pathing"):
        paths = pather.path_reads(
            reads, d, hbv, fwd_xlat, rev_xlat, chunk_reads=chunk_reads,
            mesh=mesh,
        )
    with timelog("step2.extend"):
        paths = extend.extend_paths(reads, paths, hbv)
    return hbv, paths, d
