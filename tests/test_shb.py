"""SupportedHyperBasevector low-coverage filter (graph/shb.py).

Reference semantics: DeleteLowCoverage's default-heuristics branch
(SupportedHyperBasevector6.cc:1385, low_cov=2.0, min_mult=5) deletes a
bubble arm supported by <=2 traced sequences when a competing arm has
>=5x the coverage.
"""

import numpy as np

from w2rap_contigger_tpu.graph import shb
from w2rap_contigger_tpu.paths import flat_pather
from w2rap_contigger_tpu.pipeline import step5_gaps


def _trace(built, seqs):
    d2, lhb, fx, rx = built
    seg = np.zeros(len(seqs) + 1, dtype=np.int64)
    seg[1:] = np.cumsum([len(s) for s in seqs])
    flat = np.concatenate(seqs)
    paths, _, _ = flat_pather.path_flat_sequences(flat, seg, d2, lhb, fx, rx)
    return paths


def test_low_coverage_bubble_arm_deleted(rng):
    k2 = 48
    true = rng.integers(0, 4, size=400).astype(np.uint8)
    err = true.copy()
    err[200] = (err[200] + 1) % 4  # shared SNP in 2 of 22 reads
    seqs = [true.copy() for _ in range(20)] + [err.copy() for _ in range(2)]

    built = step5_gaps._local_graph(seqs, k2, min_freq=2)
    assert built is not None
    d2, lhb, fx, rx = built

    traced = _trace(built, seqs)
    true_path = set(int(e) for e in traced[0])
    err_path = set(int(e) for e in traced[-1])
    err_arm = err_path - true_path
    assert err_arm, "SNP at 2x should form a bubble arm at min_freq=2"

    lowcov = step5_gaps._low_coverage_set(built, seqs, k2)
    assert err_arm <= lowcov, "2x arm vs 20x alternative must be deleted"
    assert not (true_path & lowcov), "20x backbone must survive"


def test_uniform_coverage_keeps_everything(rng):
    k2 = 48
    true = rng.integers(0, 4, size=400).astype(np.uint8)
    seqs = [true.copy() for _ in range(3)]
    built = step5_gaps._local_graph(seqs, k2, min_freq=2)
    assert built is not None
    lowcov = step5_gaps._low_coverage_set(built, seqs, k2)
    assert not lowcov


def test_edge_coverage_symmetric(rng):
    # coverage must count a traced path on both the edge and its rc
    # mirror (FixWeights symmetry, SupportedHyperBasevector5.cc:996)
    k2 = 48
    true = rng.integers(0, 4, size=300).astype(np.uint8)
    seqs = [true.copy(), true.copy()]
    built = step5_gaps._local_graph(seqs, k2, min_freq=2)
    d2, lhb, fx, rx = built
    traced = _trace(built, seqs)
    inv = shb.involution_from_xlats(lhb.n_edges, fx, rx)
    cov = shb.edge_coverage(lhb.n_edges, inv, traced)
    for e in traced[0]:
        assert cov[int(e)] == cov[int(inv[int(e)])] == 2.0
