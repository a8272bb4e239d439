"""ultra/ threaded-block consensus tests (ops/ultra.py; model per
src/paths/long/ultra/)."""

import numpy as np

from w2rap_contigger_tpu.ops import ultra


def test_score_model_basic():
    m = ultra.ConsensusScoreModel(0.01, 0.01, 0.01)
    a = np.array([0, 1, 2, 3], dtype=np.int8)
    assert m.score(a, a) == 0
    b = a.copy()
    b[2] = 0
    assert m.score(a, b) == m.cost_sub
    assert m.score(a, a[:-1]) in (m.cost_del, m.cost_ins)


def test_make_blocks_and_gap_threads():
    rng = np.random.default_rng(0)
    truth = rng.integers(0, 4, 120).astype(np.int8)
    founder = truth.copy()
    founder[60] = (founder[60] + 1) % 4  # founder error splits the solid run
    friends, offsets = [], []
    for i in range(8):
        off = rng.integers(-5, 6)
        s, e = max(0, -off), min(120, 120 - off)
        friends.append(truth[max(0, off):min(120, off + 120)].copy())
        offsets.append(max(0, off))
    # friends are windows of truth placed at their true offsets
    friends = [truth[o:o + 100].copy() for o in (0, 5, 10, 15, 2, 7, 12, 20)]
    offsets = [0, 5, 10, 15, 2, 7, 12, 20]
    tb = ultra.make_blocks(founder, friends, offsets, k=11)
    assert tb.n_blocks == 2  # error column breaks solidity
    assert tb.n_gaps == 1
    gts = tb.gap_threads(0)
    assert len(gts) >= 3
    cons = tb.gap_consensus(0)
    # consensus across the gap restores the true base
    joined = tb.assemble(k=11)
    # corrected sequence must contain the truth around the error
    s = "".join(map(str, joined))
    t = "".join(map(str, truth[40:80]))
    assert t in s


def test_prefab_corrects_error():
    rng = np.random.default_rng(1)
    truth = rng.integers(0, 4, 100).astype(np.int8)
    founder = truth.copy()
    founder[50] = (founder[50] + 2) % 4
    friends = [truth[o:o + 80].copy() for o in (0, 4, 8, 12, 16, 20)]
    offsets = [0, 4, 8, 12, 16, 20]
    out = ultra.prefab_correct(founder, friends, offsets, k=9)
    s = "".join(map(str, out))
    assert "".join(map(str, truth[30:70])) in s


def test_prefab_falls_back_without_blocks():
    founder = np.array([0, 1, 2, 3] * 5, dtype=np.int8)
    out = ultra.prefab_correct(founder, [], [], k=9)
    np.testing.assert_array_equal(out, founder)
