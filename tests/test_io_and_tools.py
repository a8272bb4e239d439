"""IO (fastq parsing), host merge, and hbv2gfa stats tests."""

import gzip

import numpy as np

from w2rap_contigger_tpu.core import dna, io_fastq
from w2rap_contigger_tpu.ops import kmer_engine as ke


def test_fastq_roundtrip(tmp_path, rng):
    n = 50
    seqs = []
    quals = []
    with open(tmp_path / "r.fastq", "w") as f:
        for i in range(n):
            s = dna.codes_to_seq(rng.integers(0, 4, size=80).astype(np.uint8))
            q = "".join(chr(33 + int(x)) for x in rng.integers(2, 41, size=80))
            seqs.append(s)
            quals.append(q)
            f.write(f"@r{i}\n{s}\n+\n{q}\n")
    rs = io_fastq.extract_reads(str(tmp_path / "r.fastq"))
    assert rs.n_reads == n
    for i in range(n):
        assert dna.codes_to_seq(rs.bases[i][: rs.lengths[i]]) == seqs[i]
        np.testing.assert_array_equal(
            rs.quals[i][: rs.lengths[i]],
            np.frombuffer(quals[i].encode(), np.uint8) - 33,
        )


def test_fastq_gz_and_pairing(tmp_path, rng):
    for r in (1, 2):
        with gzip.open(tmp_path / f"r{r}.fastq.gz", "wt") as f:
            for i in range(10):
                s = dna.codes_to_seq(
                    rng.integers(0, 4, size=60).astype(np.uint8)
                )
                f.write(f"@p{i}/{r}\n{s}\n+\n{'I' * 60}\n")
    rs = io_fastq.extract_reads(
        f"{tmp_path}/r1.fastq.gz,{tmp_path}/r2.fastq.gz"
    )
    assert rs.n_reads == 20  # interleaved pairs


def test_host_merge_sorted(rng):
    k = 31
    W = 2
    # build two sorted unique runs with overlap
    allw = np.unique(
        rng.integers(0, 2**32, size=(300, W), dtype=np.uint64).astype(
            np.uint32
        ),
        axis=0,
    )
    v = ke._vview(allw)
    order = np.argsort(v)
    allw = allw[order]
    a_idx = np.sort(rng.choice(len(allw), 150, replace=False))
    b_idx = np.sort(rng.choice(len(allw), 170, replace=False))
    mk = lambda idx: (
        allw[idx],
        rng.integers(0, 256, size=len(idx)).astype(np.uint32),
        rng.integers(1, 100, size=len(idx)).astype(np.int32),
    )
    A, B = mk(a_idx), mk(b_idx)
    wO, cO, nO = ke.host_merge_sorted(A, B)
    # brute force
    table = {}
    for (w, c, n) in (A, B):
        for i in range(len(c)):
            key = w[i].tobytes()
            cc, nn = table.get(key, (0, 0))
            table[key] = (cc | int(c[i]), min(255, nn + int(n[i])))
    assert len(wO) == len(table)
    vO = ke._vview(wO)
    assert len(np.unique(vO)) == len(vO)  # unique
    assert np.array_equal(np.sort(vO), vO)  # sorted
    for i in range(len(wO)):
        cc, nn = table[wO[i].tobytes()]
        assert int(cO[i]) == cc and int(nO[i]) == nn


def test_nxx_stats(rng):
    from w2rap_contigger_tpu.hbv2gfa import nxx_stats
    from tests.test_pather import make_pipeline

    g, reads, d, hbv, fx, rx = make_pipeline(rng, 3000, 90, 15)
    stats = nxx_stats(hbv, genome_size=3000)
    assert stats["canonical_size"] > 0
    assert stats["N50"] is not None and stats["N50"] > 0


def _tiny_graph_for_gfa():
    """Small HBV from a random genome's k-mers (k=15)."""
    import numpy as np
    from w2rap_contigger_tpu.graph import build as gb
    from tests.test_graph_build import genome_reads, count_with_engine

    rng = np.random.default_rng(11)
    k = 15
    g, reads = genome_reads(rng, 3000, 3 * k, k)
    d = count_with_engine(reads, k)
    gb.recompute_adjacencies(d)
    edge_bases, edge_start = gb.build_unitigs(d)
    hbv, _, _ = gb.build_hbv_from_edges(edge_bases, edge_start, k)
    return hbv, None


def test_gfa_lines_dump(tmp_path):
    """Per-line coloured GFA (_lines.gfa) + coloured raw dump
    (GFADump.cc:160-235)."""
    from w2rap_contigger_tpu.graph import gfa as gfa_mod

    hbv, _ = _tiny_graph_for_gfa()
    pref = str(tmp_path / "t")
    gfa_mod.gfa_dump(hbv, pref, find_lines=True)
    lines_txt = open(pref + "_lines.gfa").read()
    raw_txt = open(pref + "_raw.gfa").read()
    assert lines_txt.startswith("H\tVN:Z:1.0")
    assert "CL:z:" in lines_txt and "CL:z:" in raw_txt
    # every S in the lines dump is a canonical edge id
    import re
    for m in re.finditer(r"^S\tedge(\d+)\t", lines_txt, re.M):
        e = int(m.group(1))
        assert min(e, int(hbv.inv[e])) == e
