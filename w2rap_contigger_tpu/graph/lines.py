"""Lines — bubble-chain decomposition and final contig emission.

Reference: FindLines/GetLineLengths/SortLines/DumpLineFiles
(src/paths/long/large/Lines.cc:23,381,664,680); data model documented at
Lines.h:16-46 (a line is vec<vec<vec<int>>>: alternating straight
segments and cell path-sets).

Round-1 implementation: after simplification, lines are computed as
maximal straight chains (each cell degenerates to a single path); the
full cell machinery (FindCells + EdgePaths per cell + gap cells) lands
with the PathFinder work.  Contigs are emitted one per line pair in
canonical orientation, like DumpLineFiles' most-likely-path output.
"""

from __future__ import annotations

import numpy as np

from ..core.dna import codes_to_seq, n50


def find_lines_simple(hbv):
    """Maximal straight chains of edges (each edge in exactly one line).

    Returns list of np.int32 edge arrays.  A chain continues through
    vertices with out-degree 1 and in-degree 1.
    """
    E = hbv.n_edges
    indeg = hbv.in_degree()
    outdeg = hbv.out_degree()
    fo, fe, to, te = hbv.vertex_csr()
    nxt = np.full(E, -1, dtype=np.int64)
    for e in range(E):
        v = hbv.to_right[e]
        if outdeg[v] == 1 and indeg[v] == 1:
            nxt[e] = fe[fo[v]]
    prv = np.full(E, -1, dtype=np.int64)
    t = nxt[nxt >= 0]
    prv[t] = np.flatnonzero(nxt >= 0)
    lines = []
    seen = np.zeros(E, dtype=bool)
    for e in range(E):
        if seen[e] or prv[e] >= 0:
            continue
        chain = [e]
        seen[e] = True
        c = e
        while nxt[c] >= 0 and not seen[nxt[c]]:
            c = int(nxt[c])
            chain.append(c)
            seen[c] = True
        lines.append(np.array(chain, dtype=np.int32))
    # cycles
    for e in range(E):
        if seen[e]:
            continue
        chain = [e]
        seen[e] = True
        c = e
        while nxt[c] >= 0 and not seen[nxt[c]]:
            c = int(nxt[c])
            chain.append(c)
            seen[c] = True
        lines.append(np.array(chain, dtype=np.int32))
    return lines


def line_seq(hbv, line):
    k = hbv.k
    seq = hbv.edge_seq(int(line[0])).copy()
    for e in line[1:]:
        seq = np.concatenate([seq, hbv.edge_seq(int(e))[k - 1 :]])
    return seq


def line_lengths(hbv, lines):
    """GetLineLengths (Lines.cc:381): kmer length sums."""
    kmers = hbv.edge_kmers()
    return np.array([int(np.sum(kmers[l])) for l in lines], dtype=np.int64)


def dump_line_files(hbv, lines, out_dir: str, prefix: str = "a"):
    """DumpLineFiles (Lines.cc:680): write a.lines.fasta — one record per
    line pair, canonical (lower-id mirror) orientation only."""
    inv = hbv.inv
    # mirror of a line = inv edges reversed; keep the copy whose first
    # edge id is <= the mirror's first edge id
    written = 0
    with open(f"{out_dir}/{prefix}.lines.fasta", "w") as f:
        seen = set()
        for li, line in enumerate(lines):
            mirror_first = int(inv[line[-1]])
            first = int(line[0])
            key = tuple(sorted((first, mirror_first)))
            if key in seen:
                continue
            seen.add(key)
            seq = line_seq(hbv, line)
            f.write(f">line_{written} edges={len(line)} len={len(seq)}\n")
            s = codes_to_seq(seq)
            for i in range(0, len(s), 80):
                f.write(s[i : i + 80] + "\n")
            written += 1
    return written


def write_stats(hbv, lines, out_dir: str):
    """FinalFiles stats (src/paths/long/large/FinalFiles.cc:75-105):
    contig line N50 (>=1kb) and total bases in >=1kb/10kb/100kb lines."""
    lens = []
    inv = hbv.inv
    seen = set()
    for line in lines:
        key = tuple(sorted((int(line[0]), int(inv[line[-1]]))))
        if key in seen:
            continue
        seen.add(key)
        lens.append(int(np.sum(hbv.edge_len()[line] - (hbv.k - 1))) + hbv.k - 1)
    lens = np.array(lens, dtype=np.int64)
    stats = {
        "contig_line_N50": n50(lens, min_len=1000),
        "total_bases_1kb_plus": int(lens[lens >= 1000].sum()),
        "total_bases_10kb_plus": int(lens[lens >= 10000].sum()),
        "total_bases_100kb_plus": int(lens[lens >= 100000].sum()),
        "n_lines": int(len(lens)),
    }
    with open(f"{out_dir}/stats", "w") as f:
        for kk, vv in stats.items():
            f.write(f"{kk}: {vv}\n")
    return stats
